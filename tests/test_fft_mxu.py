"""``fft_mxu`` projector mode: the MXU-matmul filter-sum kernel path must be
numerically equivalent to the ``fft``/``fft_pallas`` paths (interpreter mode
on CPU; the same kernels compile on TPU), including the branch-grouping slot
permutation and the adjoint through ``jax.linear_transpose``."""

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
from dip_admm_tpu.ops.pallas import filter_mxu as fm


def _cfg(N=16, P=3):
    return ProblemConfig(
        geometry=GeometryConfig(N=N, num_nodes=P, angles_total=24),
        graph=GraphConfig(strategy="knn", k=1, seed=123),
        admm=AdmmConfig(
            max_iters=4, eps_pri=1e-8, eps_dual=1e-8,
            node=NodeSolverConfig(max_inner=50, check_every=25),
        ),
    )


def test_plan_branch_groups_invariants():
    rng = np.random.default_rng(0)
    use_c = rng.random((4, 37)) > 0.4
    valid = rng.random((4, 37)) > 0.2
    plan = fm.plan_branch_groups(use_c, valid)
    P, T = use_c.shape
    tt, Tp = plan["tt"], plan["Tp"]
    assert Tp % tt == 0 and Tp >= T
    for i in range(P):
        pos = plan["posfull"][i]
        # bijection and inverse
        assert sorted(pos.tolist()) == list(range(Tp))
        assert (np.argsort(pos) == plan["invposfull"][i]).all()
        src = plan["src_slot"][i]
        # src_slot inverts posfull on real angles
        for t in range(T):
            assert src[pos[t]] == t or not (valid[i, t])
        # every block is single-branch among its valid members
        for tb in range(Tp // tt):
            sl = src[tb * tt:(tb + 1) * tt]
            planes = {
                int(use_c[i, s]) for s in sl if s >= 0 and valid[i, s]
            }
            assert len(planes) <= 1
            if planes:
                want = plan["onehot"][i, tb, 1]
                assert planes == {int(want)}
        # invalid angles land on slack (zeroed) slots
        for t in range(T):
            if not valid[i, t]:
                assert src[pos[t]] == -1 or src[pos[t]] == t


def test_filter_sum_mxu_matches_reference_and_transposes():
    k = jax.random.split(jax.random.PRNGKey(7), 4)
    P, TB, tt, NB, tn, FB = 2, 3, 8, 2, 16, 2
    Tp, N, Fpad = TB * tt, NB * tn, FB * 128
    rre = jax.random.normal(k[0], (P, TB, N, Fpad))
    rim = jax.random.normal(k[1], (P, TB, N, Fpad))
    Hre = jax.random.normal(k[2], (P, FB, NB, Tp, tn * 128))
    Him = jax.random.normal(k[3], (P, FB, NB, Tp, tn * 128))
    blk = jnp.zeros((P, TB, 2))
    got = fm.filter_sum_mxu(rre, rim, Hre, Him)
    want = fm.filter_sum_mxu_reference(rre, rim, Hre, Him)
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-4, atol=1e-3
        )
    fr = lambda rr, ri: fm.filter_sum_mxu_reference(rr, ri, Hre, Him)
    gre_b = jax.random.normal(k[0], (P, Tp, Fpad))
    gim_b = jax.random.normal(k[1], (P, Tp, Fpad))
    rre_b, rim_b = fm.filter_sum_mxu_t(gre_b, gim_b, Hre, Him, blk)
    rre_w, rim_w = jax.linear_transpose(fr, rre, rim)((gre_b, gim_b))
    np.testing.assert_allclose(
        np.asarray(rre_b), np.asarray(rre_w), rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(rim_b), np.asarray(rim_w), rtol=1e-4, atol=1e-3
    )


def test_permute_rows_inverse_gather_is_adjoint():
    k = jax.random.PRNGKey(3)
    P, Tp, F = 2, 12, 8
    g = jax.random.normal(k, (P, Tp, F))
    pos = jnp.stack(
        [jnp.asarray(np.random.default_rng(i).permutation(Tp))
         for i in range(P)]
    ).astype(jnp.int32)
    inv = jnp.argsort(pos, axis=1).astype(jnp.int32)
    y = fm.permute_rows(g, pos)
    yb = jax.random.normal(k, y.shape)
    gb = fm.permute_rows(yb, inv)
    np.testing.assert_allclose(
        float(jnp.sum(y * yb)), float(jnp.sum(g * gb)), rtol=1e-5
    )


def test_mode_matches_fft_forward_adjoint():
    cfg = _cfg()
    p_fft = loader.build_problem(cfg, mode="fft")
    p_mxu = loader.build_problem(cfg, mode="fft_mxu")
    x = jax.random.normal(jax.random.PRNGKey(2), (3, cfg.geometry.n))
    np.testing.assert_allclose(
        np.asarray(p_mxu.forward(x)), np.asarray(p_fft.forward(x)),
        rtol=1e-4, atol=1e-5,
    )
    r = jax.random.normal(jax.random.PRNGKey(3), p_fft.b.shape)
    np.testing.assert_allclose(
        np.asarray(p_mxu.adjoint(r)), np.asarray(p_fft.adjoint(r)),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(p_mxu.b), np.asarray(p_fft.b), rtol=1e-4, atol=1e-5
    )


def test_mode_admm_trajectory_matches_fft():
    cfg = _cfg()
    r_fft = admm.run_admm(loader.build_problem(cfg, mode="fft"))
    r_mxu = admm.run_admm(loader.build_problem(cfg, mode="fft_mxu"))
    np.testing.assert_allclose(
        np.asarray(r_mxu.x), np.asarray(r_fft.x), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(r_mxu.history["primal"]),
        np.asarray(r_fft.history["primal"]), rtol=1e-3, atol=1e-5,
    )


def test_scenario_batching_matches_per_run():
    cfg = _cfg()
    problem = loader.build_problem(cfg, mode="fft_mxu")
    bb = jnp.stack([problem.b, problem.b * 1.15])
    res = admm.run_admm_batched(problem, bb)
    for i in range(2):
        single = admm.run_admm(
            dataclasses.replace(problem, b=bb[i]), cfg.admm
        )
        np.testing.assert_allclose(
            np.asarray(res.x[i]), np.asarray(single.x), rtol=2e-4, atol=2e-4
        )


def test_fan_beam_rejected():
    geo = GeometryConfig(N=16, num_nodes=2, fan_beam=True, angles_total=24)
    cfg = dataclasses.replace(_cfg(), geometry=geo)
    with pytest.raises(NotImplementedError):
        loader.build_problem(cfg, mode="fft_mxu")
