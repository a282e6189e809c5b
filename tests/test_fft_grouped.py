"""``fft_grouped`` projector mode: the branch-grouped select-free VPU
filter-sum path must be numerically equivalent to the ``fft``/``fft_pallas``
paths (interpreter mode on CPU; the same kernels compile on TPU), including
the slot permutation and the adjoint through ``jax.linear_transpose``."""

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


def test_filter_sum_grouped_matches_reference_and_transposes():
    k = jax.random.split(jax.random.PRNGKey(11), 4)
    P, TB, tt, N, F = 2, 3, 8, 32, 40
    Tp = TB * tt
    rre_s = jax.random.normal(k[0], (P, TB, N, F))
    rim_s = jax.random.normal(k[1], (P, TB, N, F))
    Hre = jax.random.normal(k[2], (P, Tp, N, F))
    Him = jax.random.normal(k[3], (P, Tp, N, F))
    onehot = jnp.zeros((P, TB, 2))
    got = fs.filter_sum_grouped(rre_s, rim_s, Hre, Him, onehot)
    want = fs.filter_sum_grouped_reference(rre_s, rim_s, Hre, Him)
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-4, atol=1e-3
        )
    f = lambda rr, ri: fs.filter_sum_grouped(rr, ri, Hre, Him, onehot)
    fr = lambda rr, ri: fs.filter_sum_grouped_reference(rr, ri, Hre, Him)
    gre_b = jax.random.normal(k[0], (P, Tp, F))
    gim_b = jax.random.normal(k[1], (P, Tp, F))
    rre_b, rim_b = jax.linear_transpose(f, rre_s, rim_s)((gre_b, gim_b))
    rre_w, rim_w = jax.linear_transpose(fr, rre_s, rim_s)((gre_b, gim_b))
    np.testing.assert_allclose(
        np.asarray(rre_b), np.asarray(rre_w), rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(rim_b), np.asarray(rim_w), rtol=1e-4, atol=1e-3
    )


def test_mode_matches_fft_forward_adjoint():
    cfg = _cfg()
    p_fft = loader.build_problem(cfg, mode="fft")
    p_grp = loader.build_problem(cfg, mode="fft_grouped")
    x = jax.random.normal(jax.random.PRNGKey(2), (3, cfg.geometry.n))
    np.testing.assert_allclose(
        np.asarray(p_grp.forward(x)), np.asarray(p_fft.forward(x)),
        rtol=1e-4, atol=1e-5,
    )
    r = jax.random.normal(jax.random.PRNGKey(3), p_fft.b.shape)
    np.testing.assert_allclose(
        np.asarray(p_grp.adjoint(r)), np.asarray(p_fft.adjoint(r)),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(p_grp.b), np.asarray(p_fft.b), rtol=1e-4, atol=1e-5
    )


def test_mode_admm_trajectory_matches_fft():
    cfg = _cfg()
    r_fft = admm.run_admm(loader.build_problem(cfg, mode="fft"))
    r_grp = admm.run_admm(loader.build_problem(cfg, mode="fft_grouped"))
    np.testing.assert_allclose(
        np.asarray(r_grp.x), np.asarray(r_fft.x), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(r_grp.history["primal"]),
        np.asarray(r_fft.history["primal"]), rtol=1e-3, atol=1e-5,
    )


def test_scenario_batching_rejected_with_clear_error():
    cfg = _cfg()
    problem = loader.build_problem(cfg, mode="fft_grouped")
    bb = jnp.stack([problem.b, problem.b])
    with pytest.raises(ValueError, match="fft_grouped"):
        admm.run_admm_batched(problem, bb)
