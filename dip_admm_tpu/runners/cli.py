"""Command-line interface.

The reference has no CLI/flag system — every knob is a hard-coded constant
(SURVEY §5, ``/root/reference/block_7_main_ver3.py:332-344``). This exposes
the canonical experiment (and the reference defaults) as flags:

    python -m dip_admm_tpu.runners.cli --N 64 --nodes 5 --strategy knn --k 2
    python -m dip_admm_tpu.runners.cli --all-strategies
    python -m dip_admm_tpu.runners.cli --mesh 4   # shard nodes over 4 devices
"""

from __future__ import annotations

import argparse
import json
from datetime import datetime


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--N", type=int, default=64)
    p.add_argument("--nodes", type=int, default=5)
    p.add_argument("--angles", type=int, default=None)
    p.add_argument("--fan-beam", action="store_true")
    p.add_argument("--strategy", choices=["knn", "mst", "chain", "complete"],
                   default="knn")
    p.add_argument("--k", type=int, default=2)
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--q-mode", choices=["arithmetic", "harmonic"],
                   default="arithmetic")
    p.add_argument("--lam-tv", type=float, default=0.02)
    p.add_argument("--rho", type=float, default=2.0)
    p.add_argument("--max-iters", type=int, default=200)
    p.add_argument("--eps-pri", type=float, default=1e-3)
    p.add_argument("--eps-dual", type=float, default=1e-3)
    p.add_argument("--max-inner", type=int, default=200)
    p.add_argument("--z-fusion", choices=["midpoint", "weighted"],
                   default="midpoint")
    p.add_argument("--relax-alpha", type=float, default=1.0,
                   help="ADMM over-relaxation factor (1.0 = reference)")
    p.add_argument("--noise", type=float, default=0.005)
    p.add_argument("--phantom", choices=["const", "rand", "shepp"],
                   default="const")
    p.add_argument("--dtype", default="float32")
    p.add_argument("--out", default=None, help="output root directory")
    p.add_argument("--all-strategies", action="store_true")
    p.add_argument("--mesh", type=int, default=None,
                   help="shard nodes over this many devices")
    p.add_argument("--matrix-free", action="store_true",
                   help="force the matrix-free projector (mode=fft)")
    p.add_argument("--mode",
                   choices=["auto", "dense", "joseph", "fft", "fft_pallas", "fft_mxu",
                            "fft_grouped"],
                   default="auto",
                   help="measurement-operator implementation (auto: dense "
                        "for N<=128, fft above)")
    p.add_argument("--use-pallas", action="store_true",
                   help="fused Pallas edge-consensus kernel (TPU)")
    p.add_argument("--fft-table-dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="storage dtype of the fft-projector phase tables")
    p.add_argument("--snapshot-every", type=int, default=None,
                   help="write per-node reconstruction snapshots every K "
                        "outer iterations (ref block_6 ver2:269-281)")
    p.add_argument("--per-node-phantoms", action="store_true",
                   help="each node measures its own randomized phantom "
                        "(build-mode loader parity, ref "
                        "block_2_load_odl_data.py:134-137)")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler device trace into this dir")
    return p


def config_from_args(args) -> "ProblemConfig":
    from dip_admm_tpu.config import (
        AdmmConfig,
        GeometryConfig,
        GraphConfig,
        NodeSolverConfig,
        ProblemConfig,
    )

    return ProblemConfig(
        geometry=GeometryConfig(
            N=args.N, num_nodes=args.nodes, angles_total=args.angles,
            fan_beam=args.fan_beam,
        ),
        graph=GraphConfig(
            strategy=args.strategy, k=args.k, seed=args.seed, q_mode=args.q_mode
        ),
        admm=AdmmConfig(
            lam_tv=args.lam_tv, rho=args.rho, max_iters=args.max_iters,
            eps_pri=args.eps_pri, eps_dual=args.eps_dual,
            z_fusion=args.z_fusion,
            relax_alpha=getattr(args, "relax_alpha", 1.0),
            use_pallas=getattr(args, "use_pallas", False),
            node=NodeSolverConfig(max_inner=args.max_inner),
        ),
        noise_level=args.noise,
        phantom=args.phantom,
        dtype=args.dtype,
        fft_table_dtype=getattr(args, "fft_table_dtype", "float32"),
    )


def mode_from_args(args) -> "str | None":
    """Projector mode override (None = build_problem's auto choice)."""
    if getattr(args, "mode", "auto") != "auto":
        return args.mode
    if getattr(args, "matrix_free", False):
        return "fft"
    return None


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)
    out_root = args.out or (
        f"Recon_Out_ADMM_{datetime.now().strftime('%Y%m%d_%H%M%S')}"
    )

    mesh = None
    if args.mesh:
        from dip_admm_tpu.parallel import mesh as meshlib

        mesh = meshlib.make_mesh(args.mesh)

    from dip_admm_tpu.runners import experiment

    mode = mode_from_args(args)

    def go():
        pnp = getattr(args, "per_node_phantoms", False)
        snap = getattr(args, "snapshot_every", None)
        if args.all_strategies:
            return experiment.run_all_strategies(
                cfg, out_root, mesh=mesh, mode=mode, per_node_phantoms=pnp
            )
        _, _, summary = experiment.run_one_strategy(
            cfg, out_root, mesh=mesh, mode=mode, per_node_phantoms=pnp,
            snapshot_every=snap,
        )
        return {args.strategy: summary}

    if args.profile_dir:
        from dip_admm_tpu.utils.profiling import trace

        with trace(args.profile_dir):
            results = go()
    else:
        results = go()
    print(json.dumps(results, indent=2, default=str))


if __name__ == "__main__":
    main()
