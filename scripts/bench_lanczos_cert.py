"""Certify the fcv Lanczos step against a brute-force spectral radius on
real CT node operators (VERDICT r4 #2 done-criterion: the certified
estimate within ~5% of brute force at 64^2 / 256^2).

Brute force = 600 power iterations on G = M^-1 S with Rayleigh quotient in
the M inner product (the round-4 12-iteration estimate crept ~13% on this
operator; 600 iterations converge it far past the 5% comparison band).

Usage: PYTHONPATH=. python scripts/bench_lanczos_cert.py [N ...]
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp

from dip_admm_tpu.config import GeometryConfig, NodeSolverConfig, ProblemConfig
from dip_admm_tpu.data import loader
from dip_admm_tpu.ops import tv


@functools.partial(jax.jit, static_argnames=("mode", "geo", "N", "rho"))
def brute(mode, geo, N, rho, angles, valid, A, tables, m_hat, sigma, D_vec,
          v):
    # All device arrays enter as arguments (closing over the multi-GB
    # tables bakes them into the compile request -> HTTP 413 on the relay).
    fwd, adj = loader.make_node_ops(mode, geo, angles, valid, A, tables)
    P = v.shape[0]

    def S(x):
        ktu = tv.grad_adjoint(*tv.grad(x.reshape(P, N, N))).reshape(P, -1)
        return 0.5 * (adj(fwd(x)) + rho * D_vec * x) + sigma[:, None] * ktu

    def Minv(r):
        R = jnp.fft.rfft2(r.reshape(P, N, N))
        return jnp.fft.irfft2(R / m_hat, s=(N, N)).reshape(P, -1)

    def Mv(x):
        R = jnp.fft.rfft2(x.reshape(P, N, N))
        return jnp.fft.irfft2(m_hat * R, s=(N, N)).reshape(P, -1)

    def step(_, v):
        w = Minv(S(v))
        return w / jnp.maximum(
            jnp.linalg.norm(w, axis=1, keepdims=True), 1e-30
        )

    v = jax.lax.fori_loop(0, 600, step, v)
    num = jnp.sum(v * S(v), axis=1)
    den = jnp.maximum(jnp.sum(v * Mv(v), axis=1), 1e-30)
    return num / den


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [64, 256]
    from dip_admm_tpu.core import node_solver

    for N in sizes:
        cfg = ProblemConfig(geometry=GeometryConfig(N=N, num_nodes=4))
        problem = loader.build_problem(cfg)
        P, n = problem.num_nodes, N * N
        D_vec = jnp.sum(problem.Q, axis=1)
        rho = cfg.admm.rho
        fwd, adj = loader.make_node_ops(
            problem.mode, cfg.geometry, problem.angles, problem.angle_valid,
            problem.A, problem.fft_tables,
        )
        fp = node_solver.build_fourier_precond(
            fwd, adj, D_vec, rho, NodeSolverConfig(algorithm="fcv"), N
        )
        v0 = jnp.broadcast_to(
            jax.random.normal(jax.random.PRNGKey(1), (n,), jnp.float32),
            (P, n),
        )
        A_arg = problem.A if problem.A is not None else jnp.zeros((P, 1))
        tables = (
            problem.fft_tables if problem.fft_tables is not None
            else jnp.zeros((P, 1))
        )
        lam_brute = jax.device_get(brute(
            problem.mode, cfg.geometry, N, rho, problem.angles,
            problem.angle_valid, A_arg, tables, fp.m_hat, fp.sigma, D_vec,
            v0,
        ))
        lam_est = 0.95 / jax.device_get(fp.step)
        ratio = lam_est / lam_brute
        print(f"N={N}: lam_lanczos/lam_brute per node = "
              + " ".join(f"{r:.4f}" for r in ratio), flush=True)
        assert (ratio >= 0.95).all() and (ratio <= 1.005).all(), ratio


if __name__ == "__main__":
    main()
