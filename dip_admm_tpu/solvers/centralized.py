"""Centralized aggregate baselines.

Capability parity with the reference's centralized solves:
- ridge least squares on the stacked operator
  (``/root/reference/block_2_test.py:83-88``)
- TV-regularized aggregate reconstruction — the "global PDHG" problem of the
  legacy solver (``ADMM_Tomo_Only.py:142-148``) and the rho=0 degenerate mode
  of the node subproblem used as a solver oracle
  (``test_block5_with_aggregate.py:22-26``).

Both run on the aggregate measurement set (all nodes' angles stacked),
using the same batched primal-dual machinery as the decentralized path with
P=1 and no consensus coupling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from dip_admm_tpu.config import NodeSolverConfig
from dip_admm_tpu.core import node_solver
from dip_admm_tpu.data.loader import Problem
from dip_admm_tpu.ops import linalg


def _aggregate_ops(problem: Problem):
    """Stack all nodes' measurements into one operator via the batched
    forward/adjoint (x broadcast to every node, residuals concatenated)."""
    P = problem.num_nodes

    def fwd(x):  # [1, n] -> [1, P*m]
        xs = jnp.broadcast_to(x, (P, x.shape[-1]))
        return problem.forward(xs).reshape(1, -1)

    def adj(r):  # [1, P*m] -> [1, n]
        rs = r.reshape(P, -1)
        return jnp.sum(problem.adjoint(rs), axis=0, keepdims=True)

    b = problem.b.reshape(1, -1)
    return fwd, adj, b


def ridge_reconstruction(problem: Problem, lam: float = 1e-3) -> jnp.ndarray:
    """x = (A^T A + lam I)^{-1} A^T b on the aggregate operator
    (ref ``block_2_test.py:83-88``); matrix-free modes use CG on the normal
    equations instead of the explicit Gram."""
    return _ridge_jit(problem, lam)


@functools.partial(jax.jit, static_argnums=1)
def _ridge_jit(problem: Problem, lam: float) -> jnp.ndarray:
    if not problem.dense:
        fwd, adj, b = _aggregate_ops(problem)
        atb = adj(b)[0]

        def mv(x):
            return adj(fwd(x[None]))[0] + lam * x

        x, _, _ = linalg.cg(mv, atb, max_iters=500, tol=1e-8)
        return x
    A = problem.A.reshape(-1, problem.n)
    return linalg.ridge_solve(A, problem.b.reshape(-1), lam)


def tv_reconstruction(
    problem: Problem,
    lam_tv: float = 0.02,
    cfg: NodeSolverConfig | None = None,
    eps: float = 1e-3,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """min_x 0.5||A x - b||^2 + lam_tv TV(x) on the aggregate operator.

    Returns (x [n], final stationarity norm). This is the centralized quality
    ceiling against which decentralized reconstructions are compared.
    """
    cfg = cfg or NodeSolverConfig(max_inner=2000, check_every=50)
    return _tv_recon_jit(problem, lam_tv, cfg, eps)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _tv_recon_jit(problem: Problem, lam_tv: float, cfg, eps: float):
    fwd, adj, b = _aggregate_ops(problem)
    n, N = problem.n, problem.N
    L = jnp.sum(problem.opnorm)[None]  # ||sum A_i^T A_i|| <= sum ||A_i^T A_i||
    zeros = jnp.zeros((1, n), problem.b.dtype)
    fprecond = None
    if cfg.algorithm == "fcv":
        fprecond = node_solver.build_fourier_precond(
            fwd, adj, zeros, 0.0, cfg, N
        )
    res = node_solver.solve_nodes(
        fwd, adj, b, zeros, zeros, jnp.zeros((1,)),
        lam_tv, 0.0, L,
        node_solver.init_state(1, N, b.shape[1], problem.b.dtype),
        jnp.asarray(eps), cfg, N, fprecond=fprecond,
    )
    return res.state.x[0], res.g_norm[0]
