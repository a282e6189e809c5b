"""Quality-vs-inner-budget study (VERDICT r1 'what's weak' #3).

The headline bench burned 197.5/200 inner iterations per outer step: the
normalized-subgradient acceptance residual (reference formula,
``/root/reference/block_6_admm_loop_ver2.py:134-149``) has an irreducible
floor, so the eps_k schedule never accepts and the budget is the throughput
lever. This script produces the data to pick the budget:

  1. g-decay diagnostic: one outer iteration's inner g_norm trajectory at
     fine check granularity (does plateau detection have anything to bite?).
  2. budget sweep: PSNR + residuals + solve wall-clock vs max_inner in
     {25, 50, 100, 200} at 64^2/5 (flagship) and 256^2/8 (bench config).

Run on the TPU:  python scripts/bench_inner_budget.py [--quick]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import numpy as np


def build(N, P, max_inner, max_iters, check_every=10, plateau_tol=0.01,
          algorithm="cv", relax=1.0):
    from dip_admm_tpu.config import (
        AdmmConfig, GeometryConfig, GraphConfig, NodeSolverConfig,
        ProblemConfig,
    )

    return ProblemConfig(
        geometry=GeometryConfig(N=N, num_nodes=P),
        graph=GraphConfig(strategy="knn", k=2, seed=123),
        admm=AdmmConfig(
            lam_tv=0.02, rho=2.0, max_iters=max_iters,
            eps_pri=1e-3, eps_dual=1e-3, relax_alpha=relax,
            node=NodeSolverConfig(
                max_inner=max_inner, check_every=check_every,
                plateau_tol=plateau_tol, algorithm=algorithm,
            ),
        ),
        noise_level=0.005,
        phantom="shepp",
        fft_table_dtype="bfloat16",
    )


def psnr_mean(res, problem):
    import jax.numpy as jnp

    x = np.asarray(res.x)
    xt = np.asarray(problem.x_true)
    n = xt.size
    mse = ((x - xt[None]) ** 2).mean(axis=1)
    rng = float(xt.max() - xt.min()) or 1.0
    return float(np.mean(10 * np.log10(rng**2 / np.maximum(mse, 1e-30))))


def g_decay(problem, n_checks=40, check_every=5):
    """g_norm after every ``check_every`` inner iterations of the FIRST
    outer iteration's node solve (plateau detection's view of the world)."""
    import jax
    import jax.numpy as jnp

    from dip_admm_tpu.core import admm as core_admm
    from dip_admm_tpu.core import node_solver

    cfg = problem.cfg.admm
    data = core_admm._block_data(problem, cfg, problem.b.dtype)
    state, _ = core_admm.init_state(problem, cfg)
    traj = []
    nstate = state.node
    P, n = data.Q.shape[0], data.Q.shape[2]
    D_vec = jnp.sum(data.Q, axis=1)
    b_cons = jnp.zeros_like(D_vec)
    c_quad = jnp.zeros((P,), problem.b.dtype)
    ncfg = dataclasses.replace(
        cfg.node, max_inner=check_every, check_every=check_every,
        plateau_tol=0.0,
    )
    for _ in range(n_checks):
        res = node_solver.solve_nodes(
            data.fwd, data.adj, data.b, D_vec, b_cons, c_quad,
            cfg.lam_tv, cfg.rho, data.L, nstate,
            jnp.asarray(0.0, problem.b.dtype), ncfg, data.N,
        )
        nstate = res.state
        traj.append(np.asarray(res.g_norm))
    return np.stack(traj)  # [n_checks, P]


def sweep_point(problem, cfg_admm, timed=True):
    import jax

    from dip_admm_tpu.core import admm

    warm = dataclasses.replace(cfg_admm, max_iters=2)
    admm.run_admm(problem, warm).x.block_until_ready()
    t0 = time.perf_counter()
    res = admm.run_admm(problem, cfg_admm)
    float(np.asarray(res.history["primal"])[cfg_admm.max_iters - 1])
    dt = time.perf_counter() - t0
    it = int(res.n_iters)
    h = {k: np.asarray(v) for k, v in res.history.items()}
    return {
        "max_inner": cfg_admm.node.max_inner,
        "outer_iters": it,
        "solve_s": round(dt, 3),
        "outer_it_per_s": round(it / dt, 3),
        "mean_inner": round(float(np.nanmean(h["inner_iters"][:it])), 1),
        "psnr_db": round(psnr_mean(res, problem), 2),
        "final_primal": round(float(h["primal"][it - 1]), 3),
        "final_dual": round(float(h["dual"][it - 1]), 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="64^2 only, fewer outer iterations")
    ap.add_argument("--relax", type=float, default=1.0)
    ap.add_argument("--algorithm", default="cv")
    ap.add_argument("--plateau-tol", type=float, default=0.01)
    ap.add_argument("--check-every", type=int, default=10)
    ap.add_argument("--skip-decay", action="store_true")
    args = ap.parse_args()

    from dip_admm_tpu.data import loader

    # --- 1. g-decay diagnostic at the bench operating point ---
    if not args.skip_decay:
        N, P = (64, 5) if args.quick else (256, 8)
        cfg = build(N, P, 200, 20)
        problem = loader.build_problem(cfg)
        traj = g_decay(problem, n_checks=40, check_every=5)
        rel = (traj[:-1] - traj[1:]) / np.abs(traj[:-1])
        print(json.dumps({
            "what": f"g_norm decay, first outer solve, {N}^2/{P}",
            "iters": [int(5 * (i + 1)) for i in range(traj.shape[0])],
            "g_mean": [round(float(v), 4) for v in traj.mean(axis=1)],
            "rel_impr_per_check_max_over_nodes": [
                round(float(v), 5) for v in rel.max(axis=1)
            ],
        }))

    # --- 2. budget sweep ---
    grids = [(64, 5, 200)] if args.quick else [(64, 5, 200), (256, 8, 20)]
    for N, P, outer in grids:
        rows = []
        for mi in (25, 50, 100, 200):
            cfg = build(N, P, mi, outer, check_every=args.check_every,
                        plateau_tol=args.plateau_tol,
                        algorithm=args.algorithm, relax=args.relax)
            problem = loader.build_problem(cfg)
            rows.append(sweep_point(problem, cfg.admm))
        print(json.dumps({
            "what": f"budget sweep {N}^2/{P} nodes, {outer} outer, "
                    f"alg={args.algorithm} relax={args.relax} "
                    f"plateau={args.plateau_tol}@{args.check_every}",
            "rows": rows,
        }))


if __name__ == "__main__":
    main()
