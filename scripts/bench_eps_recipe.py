"""eps_rel recipe study (VERDICT r2 #6): does the data-scale-relative
acceptance trim inner iterations at unchanged reconstruction quality?

For each problem size, runs the flagship solve at eps_rel in {0, 0.02,
0.05, 0.1} (0 = reference-parity absolute-only schedule) with the standard
200-inner budget, and reports wall time, mean inner iterations actually
run, final PSNR, and PSNR per second. One build per size (shared problem).

Usage: PYTHONPATH=. python scripts/bench_eps_recipe.py [N] [P] [OUTER]
"""

from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dip_admm_tpu.config import (
    AdmmConfig,
    GeometryConfig,
    GraphConfig,
    NodeSolverConfig,
    ProblemConfig,
)
from dip_admm_tpu.core import admm
from dip_admm_tpu.data import loader
from dip_admm_tpu.utils.imaging import psnr


def run_size(N, P, outer, eps_rels=(0.0, 0.02, 0.05, 0.1), reps=3):
    cfg = ProblemConfig(
        geometry=GeometryConfig(N=N, num_nodes=P),
        graph=GraphConfig(strategy="knn", k=2, seed=123),
        admm=AdmmConfig(
            lam_tv=0.02, rho=2.0, max_iters=outer, eps_pri=0.0, eps_dual=0.0,
            node=NodeSolverConfig(max_inner=200, check_every=25),
        ),
        noise_level=0.005, phantom="shepp",
        fft_table_dtype="bfloat16",
    )
    problem = loader.build_problem(cfg)
    x_true = np.asarray(problem.x_true)
    dr = float(x_true.max())
    print(f"\n== {N}x{N}, {P} nodes, {outer} outer, 200-inner budget ==",
          flush=True)
    print(f"{'eps_rel':>8} {'wall_s':>8} {'it/s':>6} {'mean_inner':>10} "
          f"{'PSNR':>7} {'PSNR/s':>8}")
    for er in eps_rels:
        acfg = dataclasses.replace(
            cfg.admm, node=dataclasses.replace(cfg.admm.node, eps_rel=er)
        )
        # Block on the warm-up so its queued device work cannot leak into
        # the first timed rep (the dispatch is asynchronous).
        jax.block_until_ready(
            admm.run_admm(problem, dataclasses.replace(acfg, max_iters=2))
        )
        best = float("inf")
        res = None
        for _ in range(reps):
            t0 = time.perf_counter()
            res = admm.run_admm(problem, acfg)
            float(res.history["primal"][outer - 1])
            best = min(best, time.perf_counter() - t0)
        x = np.asarray(res.x)
        mean_psnr = float(np.mean([
            psnr(xi, x_true, data_range=dr) for xi in x
        ]))
        inner = float(np.nanmean(np.asarray(res.history["inner_iters"])))
        print(f"{er:8.3f} {best:8.2f} {outer / best:6.2f} {inner:10.1f} "
              f"{mean_psnr:7.2f} {mean_psnr / best:8.2f}", flush=True)


def run_equal_wall(N, P, pairs, reps=2, seg=20):
    """Equal-wall-clock frontier: each (eps_rel, outer) pair spends roughly
    the same wall time (outer counts chosen from a measured it/s
    calibration); the winner is whoever reaches the best PSNR in it.

    Runs in ``seg``-outer SEGMENTS through the resume contract (one
    compilation, multiple dispatches): the axon relay reproducibly kills
    single device programs past ~30-40 s wall (measured: a 26 s
    while_loop dispatch survives, a ~44 s one dies with "TPU worker
    process crashed", twice), so long solves must be segmented — exactly
    what the CLI's --checkpoint-every path does."""
    max_outer = max(o for _, o in pairs)
    cfg = ProblemConfig(
        geometry=GeometryConfig(N=N, num_nodes=P),
        graph=GraphConfig(strategy="knn", k=2, seed=123),
        admm=AdmmConfig(
            lam_tv=0.02, rho=2.0, max_iters=max_outer, eps_pri=0.0,
            eps_dual=0.0,
            node=NodeSolverConfig(max_inner=200, check_every=25),
        ),
        noise_level=0.005, phantom="shepp",
        fft_table_dtype="bfloat16",
    )
    problem = loader.build_problem(cfg)
    x_true = np.asarray(problem.x_true)
    dr = float(x_true.max())
    print(f"\n== equal-wall {N}x{N}, {P} nodes, 200-inner budget ==",
          flush=True)
    print(f"{'eps_rel':>8} {'outer':>6} {'wall_s':>8} {'mean_inner':>10} "
          f"{'PSNR':>7}")
    for er, outer in pairs:
        acfg = dataclasses.replace(
            cfg.admm, max_iters=outer,
            node=dataclasses.replace(cfg.admm.node, eps_rel=er),
        )
        # Block on the warm-up so its queued device work cannot leak into
        # the first timed rep (the dispatch is asynchronous).
        jax.block_until_ready(
            admm.run_admm(problem, dataclasses.replace(acfg, max_iters=2))
        )
        best = float("inf")
        res = None
        for _ in range(reps):
            t0 = time.perf_counter()
            res = admm.run_admm(problem, acfg, until=min(seg, outer))
            for k0 in range(seg, outer, seg):
                res = admm.run_admm(
                    problem, acfg, state=res.state, hist=res.history,
                    until=min(k0 + seg, outer),
                )
            float(res.history["primal"][outer - 1])
            best = min(best, time.perf_counter() - t0)
        x = np.asarray(res.x)
        mean_psnr = float(np.mean([
            psnr(xi, x_true, data_range=dr) for xi in x
        ]))
        inner = float(np.nanmean(np.asarray(res.history["inner_iters"])))
        print(f"{er:8.3f} {outer:6d} {best:8.2f} {inner:10.1f} "
              f"{mean_psnr:7.2f}", flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "equal":
        N = int(sys.argv[2])
        P = int(sys.argv[3])
        pairs = [
            (float(e), int(o))
            for e, o in (s.split(":") for s in sys.argv[4].split(","))
        ]
        jnp.ones(2).block_until_ready()
        run_equal_wall(N, P, pairs)
        return
    if len(sys.argv) > 1:
        N = int(sys.argv[1])
        P = int(sys.argv[2]) if len(sys.argv) > 2 else 8
        outer = int(sys.argv[3]) if len(sys.argv) > 3 else 30
        eps = (
            tuple(float(s) for s in sys.argv[4].split(","))
            if len(sys.argv) > 4 else (0.0, 0.02, 0.05, 0.1)
        )
        run_size(N, P, outer, eps_rels=eps)
        return
    jnp.ones(2).block_until_ready()  # absorb the first-dispatch relay stall
    run_size(64, 5, 60)
    run_size(256, 8, 30)


if __name__ == "__main__":
    main()
