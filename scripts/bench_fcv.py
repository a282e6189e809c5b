"""A/B the circulant-metric inner solver (fcv) against cv on the headline
contract: 256^2 / 8 nodes / knn k=2 / shepp / <=200 inner / check_every 25
(bench.py's reference-equivalent budget). Prints wall, mean inner
iterations, residuals, PSNR for each algorithm (best-of-3 wall)."""

from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dip_admm_tpu.config import (
    AdmmConfig, GeometryConfig, GraphConfig, NodeSolverConfig, ProblemConfig,
)
from dip_admm_tpu.core import admm
from dip_admm_tpu.data import loader
from dip_admm_tpu.utils.imaging import psnr


def main(N=256, P=8, outers=20, reps=3):
    cfg = ProblemConfig(
        geometry=GeometryConfig(N=N, num_nodes=P),
        graph=GraphConfig(strategy="knn", k=2, seed=123),
        admm=AdmmConfig(
            lam_tv=0.02, rho=2.0, max_iters=outers, eps_pri=0.0, eps_dual=0.0,
            node=NodeSolverConfig(max_inner=200, check_every=25),
        ),
        noise_level=0.005, phantom="shepp", fft_table_dtype="bfloat16",
    )
    float((jnp.ones((8, 8)) @ jnp.ones((8, 8))).sum())  # tunnel bring-up
    problem = loader.build_problem(cfg)
    x_true = np.asarray(problem.x_true)
    dr = float(x_true.max())
    print(f"== {N}x{N}/{P} nodes, {outers} outers, 200-inner contract ==",
          flush=True)
    for alg in ("cv", "fcv"):
        acfg = dataclasses.replace(
            cfg.admm, node=dataclasses.replace(cfg.admm.node, algorithm=alg)
        )
        jax.block_until_ready(
            admm.run_admm(problem, dataclasses.replace(acfg, max_iters=2)))
        best = float("inf")
        res = None
        for _ in range(reps):
            t0 = time.perf_counter()
            res = admm.run_admm(problem, acfg)
            float(res.history["primal"][outers - 1])
            best = min(best, time.perf_counter() - t0)
        h = res.history
        inner = np.asarray(h["inner_iters"])
        x = np.asarray(res.x)
        ps = np.mean([psnr(xi, x_true, data_range=dr) for xi in x])
        print(f"{alg:4s} wall={best:7.2f}s it/s={outers/best:6.2f} "
              f"mean_inner={np.nanmean(inner):6.1f} "
              f"primal={float(h['primal'][outers-1]):9.3f} "
              f"dual={float(h['dual'][outers-1]):9.3f} "
              f"g={float(np.nanmean(np.asarray(h['g_norm'])[outers-1])):8.3f} "
              f"psnr={ps:6.2f}", flush=True)
        print("  inner/outer:",
              inner.mean(axis=1).astype(int), flush=True)


if __name__ == "__main__":
    kw = {}
    for a in sys.argv[1:]:
        k, v = a.split("=")
        kw[k] = int(v)
    main(**kw)
