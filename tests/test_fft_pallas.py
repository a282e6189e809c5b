"""``fft_pallas`` projector mode: the Pallas filter-sum kernel path must be
numerically equivalent to the vmapped XLA ``fft`` path (interpreter mode on
CPU; the same kernels compile on TPU), including through the hand-written
adjoint chain (verified as the exact transpose) and under vmap (scenario
batching)."""

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
    # The explicit transpose entry point is the exact adjoint — and matches
    # linear_transpose of the jnp reference.
    gre_b = jax.random.normal(k[0], (P, T, F))
    gim_b = jax.random.normal(k[1], (P, T, F))
    rre_b, rim_b = fs.filter_sum_sel_t(gre_b, gim_b, Hre, Him, sel)
    lhs = jnp.sum(got[0] * gre_b) + jnp.sum(got[1] * gim_b)
    rhs = jnp.sum(rre2 * rre_b) + jnp.sum(rim2 * rim_b)
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-4)
    fr = lambda rr, ri: fs.filter_sum_sel_reference(rr, ri, Hre, Him, sel)
    rre_w, rim_w = jax.linear_transpose(fr, rre2, rim2)((gre_b, gim_b))
    np.testing.assert_allclose(
        np.asarray(rre_b), np.asarray(rre_w), rtol=1e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(rim_b), np.asarray(rim_w), rtol=1e-5, atol=1e-4
    )


def test_filter_sum_sel_vmaps():
    k = jax.random.split(jax.random.PRNGKey(6), 5)
    B, P, T, N, F = 3, 2, 8, 16, 65
    rre2 = jax.random.normal(k[0], (B, P, 2, N, F))
    rim2 = jax.random.normal(k[1], (B, P, 2, N, F))
    Hre = jax.random.normal(k[2], (P, T, N, F))
    Him = jax.random.normal(k[3], (P, T, N, F))
    sel = (jax.random.uniform(k[4], (P, T, 1)) > 0.5).astype(jnp.float32)
    got = jax.vmap(
        lambda rr, ri: fs.filter_sum_sel(rr, ri, Hre, Him, sel)
    )(rre2, rim2)
    for b in range(B):
        want = fs.filter_sum_sel_reference(rre2[b], rim2[b], Hre, Him, sel)
        for g, w in zip((got[0][b], got[1][b]), want):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=1e-5, atol=1e-4
            )


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
    ob = jax.random.normal(k[0], (P, T, D))
    gb = he.hat_eval_t(ob, pc, s, jnp.zeros((Np,)))
    lhs = jnp.sum(got * ob)
    rhs = jnp.sum(g * gb)
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-4)
    # vmap folds the batch into the node axis.
    gB = jax.random.normal(k[2], (3, P, T, Np))
    outB = jax.vmap(lambda gg: he.hat_eval(gg, pc, s))(gB)
    for b in range(3):
        np.testing.assert_allclose(
            np.asarray(outB[b]), np.asarray(he.hat_eval_reference(gB[b], pc, s)),
            rtol=1e-5, atol=1e-5,
        )


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


def test_scenario_batching_fft_pallas_matches_per_run():
    """run_admm_batched traverses the Pallas projector kernels via the
    custom_vmap rules; each batch lane must match its standalone run."""
    cfg = _cfg()
    problem = loader.build_problem(cfg, mode="fft_pallas")
    bb = jnp.stack([problem.b, problem.b * 1.15])
    res = admm.run_admm_batched(problem, bb)
    for i in range(2):
        single = admm.run_admm(
            dataclasses.replace(problem, b=bb[i]), cfg.admm
        )
        np.testing.assert_allclose(
            np.asarray(res.x[i]), np.asarray(single.x), rtol=2e-4, atol=2e-4
        )


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
