"""Inner budget 12 vs 15 across regimes (NEXT r5 #3 gate).

Round 5 measured budget 12 equal-or-better than 15 at the parallel-beam
bench point (256^2/8, 20 and 100 outers) with +13% throughput, but left
the recommended preset at 15 pending coverage of the fan-beam and
many-node regimes.  This script produces that coverage in ONE TPU
process (the relay serializes clients — batch, don't re-launch):

  1. fan beam   256^2 / 8 nodes, 20 outers      (config-4-like geometry)
  2. many-node  256^2 / 16 nodes, 20 outers     (config-5-like topology)
  3. deep       64^2  / 5 nodes, 200 outers     (convergence-depth check)

Each at max_inner in {12, 15}, fcv + relax 1.8 + check at the cap (the
recommended recipe otherwise, ``runners/cli.py --recommended``).  The
gate: budget 12 passes if PSNR(12) >= PSNR(15) - 0.05 dB in every
regime.  Anchor: the inner solves replace the reference's SCS calls
(/root/reference/block_6_admm_loop_ver2.py:123).

Run on the TPU:  python scripts/bench_budget12_regimes.py
"""

from __future__ import annotations

import dataclasses
import json
import time

import numpy as np


def build(N, P, max_inner, max_iters, fan=False):
    from dip_admm_tpu.config import (
        AdmmConfig, GeometryConfig, GraphConfig, NodeSolverConfig,
        ProblemConfig,
    )

    return ProblemConfig(
        geometry=GeometryConfig(N=N, num_nodes=P, fan_beam=fan),
        graph=GraphConfig(strategy="knn", k=2, seed=123),
        admm=AdmmConfig(
            lam_tv=0.02, rho=2.0, max_iters=max_iters,
            eps_pri=1e-3, eps_dual=1e-3, relax_alpha=1.8,
            node=NodeSolverConfig(
                max_inner=max_inner, check_every=max_inner,
                plateau_tol=0.01, algorithm="fcv",
            ),
        ),
        noise_level=0.005,
        phantom="shepp",
        fft_table_dtype="bfloat16",
    )


def psnr_mean(res, problem):
    x = np.asarray(res.x)
    xt = np.asarray(problem.x_true)
    mse = ((x - xt[None]) ** 2).mean(axis=1)
    rng = float(xt.max() - xt.min()) or 1.0
    return float(np.mean(10 * np.log10(rng**2 / np.maximum(mse, 1e-30))))


def point(problem, cfg_admm):
    from dip_admm_tpu.core import admm

    warm = dataclasses.replace(cfg_admm, max_iters=2)
    admm.run_admm(problem, warm).x.block_until_ready()
    best = None
    for _ in range(2):  # best-of within one process (relay stalls)
        t0 = time.perf_counter()
        res = admm.run_admm(problem, cfg_admm)
        res.x.block_until_ready()
        dt = time.perf_counter() - t0
        if best is None or dt < best[0]:
            best = (dt, res)
    dt, res = best
    it = int(res.n_iters)
    h = {k: np.asarray(v) for k, v in res.history.items()}
    return {
        "max_inner": cfg_admm.node.max_inner,
        "outer_iters": it,
        "outer_it_per_s": round(it / dt, 2),
        "psnr_db": round(psnr_mean(res, problem), 3),
        "final_primal": round(float(h["primal"][it - 1]), 3),
        "final_dual": round(float(h["dual"][it - 1]), 3),
    }


def main():
    from dip_admm_tpu.data import loader

    regimes = [
        ("fan 256^2/8, 20 outers", 256, 8, 20, True),
        ("many-node 256^2/16, 20 outers", 256, 16, 20, False),
        ("deep 64^2/5, 200 outers", 64, 5, 200, False),
    ]
    verdicts = []
    for name, N, P, outers, fan in regimes:
        rows = []
        for mi in (15, 12):
            cfg = build(N, P, mi, outers, fan=fan)
            problem = loader.build_problem(cfg)
            rows.append(point(problem, cfg.admm))
        d = rows[1]["psnr_db"] - rows[0]["psnr_db"]
        verdicts.append({"regime": name, "rows": rows,
                         "psnr12_minus_psnr15_db": round(d, 3),
                         "pass": bool(d >= -0.05)})
        print(json.dumps(verdicts[-1]), flush=True)
    print(json.dumps({"gate_pass_all": all(v["pass"] for v in verdicts)}))


if __name__ == "__main__":
    main()
