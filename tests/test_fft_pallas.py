"""``fft_pallas`` projector mode: the Pallas filter-sum kernel path must be
numerically equivalent to the vmapped XLA ``fft`` path (interpreter mode on
CPU; the same kernels compile on TPU), including through the adjoint built by
``jax.linear_transpose`` over the registered custom_transpose."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dip_admm_tpu.config import (
    AdmmConfig,
    GeometryConfig,
    GraphConfig,
    NodeSolverConfig,
    ProblemConfig,
)
from dip_admm_tpu.core import admm
from dip_admm_tpu.data import loader
from dip_admm_tpu.ops.pallas import filter_sum as fs


def _cfg(N=16, P=3):
    return ProblemConfig(
        geometry=GeometryConfig(N=N, num_nodes=P, angles_total=24),
        graph=GraphConfig(strategy="knn", k=1, seed=123),
        admm=AdmmConfig(
            max_iters=4, eps_pri=1e-8, eps_dual=1e-8,
            node=NodeSolverConfig(max_inner=50, check_every=25),
        ),
    )


def test_filter_sum_matches_einsum():
    k = jax.random.split(jax.random.PRNGKey(0), 4)
    P, T, N, F = 2, 12, 32, 130
    rre = jax.random.normal(k[0], (P, N, F))
    rim = jax.random.normal(k[1], (P, N, F))
    Hre = jax.random.normal(k[2], (P, T, N, F))
    Him = jax.random.normal(k[3], (P, T, N, F))
    got = fs.filter_sum(rre, rim, Hre, Him)
    want = fs.filter_sum_reference(rre, rim, Hre, Him)
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-5, atol=1e-4
        )


def test_filter_sum_transpose_is_exact_adjoint():
    k = jax.random.split(jax.random.PRNGKey(1), 4)
    P, T, N, F = 2, 8, 16, 65
    rre = jax.random.normal(k[0], (P, N, F))
    rim = jax.random.normal(k[1], (P, N, F))
    Hre = jax.random.normal(k[2], (P, T, N, F))
    Him = jax.random.normal(k[3], (P, T, N, F))
    f = lambda rr, ri: fs.filter_sum(rr, ri, Hre, Him)
    got = f(rre, rim)
    gre_b = jax.random.normal(k[0], (P, T, F))
    gim_b = jax.random.normal(k[1], (P, T, F))
    rre_b, rim_b = jax.linear_transpose(f, rre, rim)((gre_b, gim_b))
    lhs = jnp.sum(got[0] * gre_b) + jnp.sum(got[1] * gim_b)
    rhs = jnp.sum(rre * rre_b) + jnp.sum(rim * rim_b)
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-4)


def test_filter_sum_sel_matches_reference_and_transposes():
    k = jax.random.split(jax.random.PRNGKey(4), 5)
    P, T, N, F = 2, 8, 16, 65
    rre2 = jax.random.normal(k[0], (P, 2, N, F))
    rim2 = jax.random.normal(k[1], (P, 2, N, F))
    Hre = jax.random.normal(k[2], (P, T, N, F))
    Him = jax.random.normal(k[3], (P, T, N, F))
    sel = (jax.random.uniform(k[4], (P, T, 1)) > 0.5).astype(jnp.float32)
    got = fs.filter_sum_sel(rre2, rim2, Hre, Him, sel)
    want = fs.filter_sum_sel_reference(rre2, rim2, Hre, Him, sel)
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-5, atol=1e-4
        )
    f = lambda rr, ri: fs.filter_sum_sel(rr, ri, Hre, Him, sel)
    gre_b = jax.random.normal(k[0], (P, T, F))
    gim_b = jax.random.normal(k[1], (P, T, F))
    rre_b, rim_b = jax.linear_transpose(f, rre2, rim2)((gre_b, gim_b))
    lhs = jnp.sum(got[0] * gre_b) + jnp.sum(got[1] * gim_b)
    rhs = jnp.sum(rre2 * rre_b) + jnp.sum(rim2 * rim_b)
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-4)


def test_hat_eval_matches_reference_and_transposes():
    from dip_admm_tpu.ops.pallas import hat_eval as he

    k = jax.random.split(jax.random.PRNGKey(5), 3)
    P, T, Np, D = 2, 8, 64, 16
    g = jax.random.normal(k[0], (P, T, Np))
    pc = jax.random.uniform(k[1], (P, T, D)) * (Np - 2)
    s = jax.random.uniform(k[2], (P, T, 1)) + 0.5
    got = he.hat_eval(g, pc, s)
    want = he.hat_eval_reference(g, pc, s)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )
    f = lambda gg: he.hat_eval(gg, pc, s)
    ob = jax.random.normal(k[0], (P, T, D))
    (gb,) = jax.linear_transpose(f, g)(ob)
    lhs = jnp.sum(got * ob)
    rhs = jnp.sum(g * gb)
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-4)


def test_mode_matches_fft_forward_adjoint():
    cfg = _cfg()
    p_fft = loader.build_problem(cfg, mode="fft")
    p_pal = loader.build_problem(cfg, mode="fft_pallas")
    x = jax.random.normal(jax.random.PRNGKey(2), (3, cfg.geometry.n))
    np.testing.assert_allclose(
        np.asarray(p_pal.forward(x)), np.asarray(p_fft.forward(x)),
        rtol=1e-4, atol=1e-5,
    )
    r = jax.random.normal(jax.random.PRNGKey(3), p_fft.b.shape)
    np.testing.assert_allclose(
        np.asarray(p_pal.adjoint(r)), np.asarray(p_fft.adjoint(r)),
        rtol=1e-4, atol=1e-5,
    )
    # Problem construction (sinograms, weights) agrees too.
    np.testing.assert_allclose(
        np.asarray(p_pal.b), np.asarray(p_fft.b), rtol=1e-4, atol=1e-5
    )


def test_mode_admm_trajectory_matches_fft():
    cfg = _cfg()
    r_fft = admm.run_admm(loader.build_problem(cfg, mode="fft"))
    r_pal = admm.run_admm(loader.build_problem(cfg, mode="fft_pallas"))
    np.testing.assert_allclose(
        np.asarray(r_pal.x), np.asarray(r_fft.x), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(r_pal.history["primal"]),
        np.asarray(r_fft.history["primal"]), rtol=1e-3, atol=1e-5,
    )


def test_scenario_batching_rejected_with_clear_error():
    import jax.numpy as jnp

    cfg = _cfg()
    problem = loader.build_problem(cfg, mode="fft_pallas")
    bb = jnp.stack([problem.b, problem.b])
    with pytest.raises(ValueError, match="fft_pallas"):
        admm.run_admm_batched(problem, bb)


def test_use_pallas_consensus_supports_batching():
    # The consensus kernel (pallas_call) vmaps; scenario batching with
    # use_pallas on the dense projector must work.
    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg, admm=dataclasses.replace(cfg.admm, use_pallas=True)
    )
    problem = loader.build_problem(cfg, mode="dense")
    bb = jnp.stack([problem.b, problem.b * 1.1])
    res = admm.run_admm_batched(problem, bb)
    assert res.x.shape == (2, 3, cfg.geometry.n)
    assert np.isfinite(np.asarray(res.x)).all()


def test_fan_beam_rejected():
    geo = GeometryConfig(N=16, num_nodes=2, fan_beam=True, angles_total=24)
    cfg = dataclasses.replace(_cfg(), geometry=geo)
    with pytest.raises(NotImplementedError):
        loader.build_problem(cfg, mode="fft_pallas")
