"""Operating-point matrix behind the round-4 recommended default
(RESULTS.md): inner algorithm x budget x relaxation x eps_rel at the
headline geometry. Each point reports best-of-reps wall, mean inner
iterations, final residuals and PSNR at a fixed outer count.

Usage: PYTHONPATH=. python scripts/bench_fcv_points.py [point ...]
(no args = all points; one process per batch keeps relay stalls out of
the timings — see CLAUDE.md).
"""

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

POINTS = {
    "cv200-parity":      dict(alg="cv", mi=200, ra=1.0, er=0.0),
    "pcv50-relax-recr3": dict(alg="pcv", mi=50, ra=1.8, er=0.0),
    "fcv50-relax":       dict(alg="fcv", mi=50, ra=1.8, er=0.0),
    "fcv50":             dict(alg="fcv", mi=50, ra=1.0, er=0.0),
    "fcv25-relax-recr4": dict(alg="fcv", mi=25, ra=1.8, er=0.0),
    "fcv200-epsrel":     dict(alg="fcv", mi=200, ra=1.8, er=0.005),
    # Round-5 probes below the 25-inner floor: the Lanczos-certified step
    # (margin 0.95 vs the power method's 0.7, ~1.36x larger) should buy
    # equal PSNR at a smaller budget (VERDICT r4 #2).
    "fcv20-relax":       dict(alg="fcv", mi=20, ra=1.8, er=0.0),
    "fcv15-relax":       dict(alg="fcv", mi=15, ra=1.8, er=0.0),
    "fcv12-relax":       dict(alg="fcv", mi=12, ra=1.8, er=0.0),
    "fcv10-relax":       dict(alg="fcv", mi=10, ra=1.8, er=0.0),
}


def main(names, N=256, P=8, outers=20, reps=2):
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
    for name in names or POINTS:
        pt = POINTS[name]
        acfg = dataclasses.replace(
            cfg.admm, relax_alpha=pt["ra"],
            node=dataclasses.replace(
                cfg.admm.node, algorithm=pt["alg"], max_inner=pt["mi"],
                eps_rel=pt["er"], check_every=min(25, pt["mi"]),
            ),
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
        x = np.asarray(res.x)
        ps = np.mean([psnr(xi, x_true, data_range=dr) for xi in x])
        print(f"{name:20s} wall={best:6.2f}s it/s={outers/best:6.2f} "
              f"inner={np.nanmean(np.asarray(h['inner_iters'])):6.1f} "
              f"primal={float(h['primal'][outers-1]):8.2f} psnr={ps:6.2f}",
              flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
