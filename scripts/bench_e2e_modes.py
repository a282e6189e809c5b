"""In-process end-to-end A/B of projector modes + consensus kernel.

The relay-attached chip shows large CROSS-process variance, so mode
decisions must come from one process with interleaved runs. Full ADMM at
the headline operating point (256^2/8 nodes, <=200 inner, 20 outer) for
each (mode, use_pallas) combo, interleaved best-of-R.

Usage: python scripts/bench_e2e_modes.py [--N 256] [--P 8] [--outer 20]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=256)
    ap.add_argument("--P", type=int, default=8)
    ap.add_argument("--outer", type=int, default=20)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--modes", default="fft_grouped,fft_pallas")
    ap.add_argument("--pallas-consensus", default="1,0",
                    help="comma list of 0/1 use_pallas settings to test")
    args = ap.parse_args()

    import numpy as np

    from dip_admm_tpu.config import (
        AdmmConfig, GeometryConfig, GraphConfig, NodeSolverConfig,
        ProblemConfig,
    )
    from dip_admm_tpu.core import admm
    from dip_admm_tpu.data import loader

    base = ProblemConfig(
        geometry=GeometryConfig(N=args.N, num_nodes=args.P),
        graph=GraphConfig(strategy="knn", k=2, seed=123),
        admm=AdmmConfig(
            lam_tv=0.02, rho=2.0, max_iters=args.outer,
            eps_pri=0.0, eps_dual=0.0,
            node=NodeSolverConfig(max_inner=200, check_every=25),
        ),
        noise_level=0.005, phantom="shepp", fft_table_dtype="bfloat16",
    )

    combos = []
    for mode in args.modes.split(","):
        for up in args.pallas_consensus.split(","):
            combos.append((mode, bool(int(up))))

    probs = {}
    for mode, _ in combos:
        if mode not in probs:
            t0 = time.perf_counter()
            if mode == "fft_grouped_nofold":
                # grouped tables with the folded WC eval tail disabled
                # (irfft matmul + hat einsum tail instead).
                from dip_admm_tpu.ops import radon_fft

                p = loader.build_problem(base, mode="fft_grouped")
                tabs = radon_fft.precompute_grouped(
                    base.geometry, p.angles, p.angle_valid,
                    table_dtype=base.fft_table_dtype, fold_eval=False,
                )
                probs[mode] = dataclasses.replace(
                    p, mode="fft_grouped", fft_tables=tabs
                )
            else:
                probs[mode] = loader.build_problem(base, mode=mode)
            probs[mode].b.block_until_ready()
            print(f"# build {mode}: {time.perf_counter()-t0:.1f}s", flush=True)

    cfgs = {
        (mode, up): dataclasses.replace(base.admm, use_pallas=up)
        for mode, up in combos
    }
    # Warm/compile every combo first.
    for (mode, up), cfg in cfgs.items():
        t0 = time.perf_counter()
        admm.run_admm(
            probs[mode], dataclasses.replace(cfg, max_iters=2)
        ).x.block_until_ready()
        print(f"# compile {mode} use_pallas={up}: "
              f"{time.perf_counter()-t0:.1f}s", flush=True)

    best = {k: float("inf") for k in cfgs}
    quality = {}
    for _ in range(args.repeats):
        for key, cfg in cfgs.items():
            mode, up = key
            t0 = time.perf_counter()
            res = admm.run_admm(probs[mode], cfg)
            float(np.asarray(res.history["primal"])[args.outer - 1])
            best[key] = min(best[key], time.perf_counter() - t0)
            h = res.history
            quality[key] = {
                "final_primal": round(
                    float(np.asarray(h["primal"])[args.outer - 1]), 2
                ),
                "final_img_mse": round(
                    float(np.asarray(h["img_mse_total"])[args.outer - 1]), 4
                ),
                "mean_inner": round(
                    float(np.nanmean(np.asarray(h["inner_iters"]))), 1
                ),
            }

    rows = [
        {"mode": mode, "use_pallas": up,
         "outer_it_per_s": round(args.outer / best[(mode, up)], 3),
         "s_per_outer": round(best[(mode, up)] / args.outer, 4),
         **quality[(mode, up)]}
        for mode, up in cfgs
    ]
    rows.sort(key=lambda r: -r["outer_it_per_s"])
    print(json.dumps({
        "what": f"end-to-end ADMM {args.N}^2/{args.P} nodes, "
                f"{args.outer} outer x <=200 inner, best of {args.repeats}",
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
