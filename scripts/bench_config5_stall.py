"""Config-5 stall-mode rho study: can the quality-signal policy discover
the high-rho lever FROM BELOW? (NEXT r5 #6 / VERDICT r4 #3 done-criterion)

Round 5 measured that classical residual balancing cannot: in the
32-node 512^2 fan regime the dual residual dominates, so adapt-from-2
runs end at rho <= 2 and ~12.1 dB while static rho=20 reaches 14.09 dB
(RESULTS.md round-5 rho study). ``adapt_rho_mode="stall"`` instead
raises rho whenever the primal residual plateaus over a window — the
observable signature of stalled consensus diffusion. This script runs
the stall policy from rho=2 at the same operating point (recommended
recipe, 200 outers, auto-segmented) and reports whether it reaches the
static rho=20 quality without hand-tuning.

Usage: PYTHONPATH=. python scripts/bench_config5_stall.py [outers]
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


def main():
    outers = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    cfg = ProblemConfig(
        geometry=GeometryConfig(N=512, num_nodes=32, fan_beam=True),
        graph=GraphConfig(strategy="knn", k=2, seed=123),
        admm=AdmmConfig(
            lam_tv=0.02, rho=2.0, max_iters=outers, eps_pri=0.0, eps_dual=0.0,
            relax_alpha=1.8,
            node=NodeSolverConfig(max_inner=15, check_every=15,
                                  algorithm="fcv"),
        ),
        noise_level=0.005, phantom="shepp", fft_table_dtype="bfloat16",
    )
    float((jnp.ones((8, 8)) @ jnp.ones((8, 8))).sum())  # tunnel bring-up
    t0 = time.perf_counter()
    problem = loader.build_problem(cfg)
    jax.block_until_ready(problem.b)
    print(f"build {time.perf_counter()-t0:.1f}s", flush=True)
    x_true = np.asarray(problem.x_true)
    dr = float(x_true.max())

    runs = {
        "stall from 2 (w=10)": dict(
            rho=2.0, adapt_rho=True, adapt_rho_mode="stall",
        ),
        "stall from 2 (w=20)": dict(
            rho=2.0, adapt_rho=True, adapt_rho_mode="stall",
            rho_stall_window=20,
        ),
        # Early-and-bounded variants: the first sweep showed the policy
        # finds high rho but too LATE (rho reaches 16 only by outer 100
        # with w=10) and overshoots to the clamp; quality at 200 outers
        # stayed ~12.2 dB vs static-20's 14.09. High rho pays at the
        # START of the consensus diffusion — probe a faster cadence with
        # a bounded multiplier ceiling.
        "stall w=5 clamp=10": dict(
            rho=2.0, adapt_rho=True, adapt_rho_mode="stall",
            rho_stall_window=5, rho_clamp=10.0,
        ),
        "stall w=5 clamp=16": dict(
            rho=2.0, adapt_rho=True, adapt_rho_mode="stall",
            rho_stall_window=5, rho_clamp=16.0,
        ),
    }
    only = sys.argv[2] if len(sys.argv) > 2 else ""
    for name, kw in runs.items():
        if only and only not in name:
            continue
        acfg = dataclasses.replace(cfg.admm, **kw)
        t0 = time.perf_counter()
        res = admm.run_admm_auto(problem, acfg)
        wall = time.perf_counter() - t0
        h = res.history
        x = np.asarray(res.x)
        ps = np.mean([psnr(xi, x_true, data_range=dr) for xi in x])
        rho_h = np.asarray(h["rho"])[:outers]
        print(
            f"{name:22s} wall={wall:6.1f}s psnr={ps:6.2f} "
            f"pri={float(np.asarray(h['primal'])[outers-1]):10.1f} "
            f"dual={float(np.asarray(h['dual'])[outers-1]):10.1f} "
            f"rho[0,mid,end]=({rho_h[0]:.3g},{rho_h[outers//2]:.3g},"
            f"{rho_h[outers-1]:.3g})",
            flush=True,
        )


if __name__ == "__main__":
    main()
