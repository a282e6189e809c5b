"""``fft_shear`` projector mode: the MXU-cast factored filter-sum must be
numerically identical to the dense-phase-table paths (the factorization
H = E * sum_d Phi_d Wt_d is exact, not an approximation), with an exact
hand-written transpose and vmap batch folding."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from dip_admm_tpu.config import (
    AdmmConfig,
    GeometryConfig,
    GraphConfig,
    NodeSolverConfig,
    ProblemConfig,
)
from dip_admm_tpu.core import admm
from dip_admm_tpu.data import loader
from dip_admm_tpu.ops import radon, radon_fft


def _cfg(N=16, P=3):
    return ProblemConfig(
        geometry=GeometryConfig(N=N, num_nodes=P, angles_total=24),
        graph=GraphConfig(strategy="knn", k=1, seed=123),
        admm=AdmmConfig(
            max_iters=4, eps_pri=1e-8, eps_dual=1e-8,
            node=NodeSolverConfig(max_inner=50, check_every=25),
        ),
    )


def _tables_and_geo(N=16, P=3, angles_total=24):
    geo = GeometryConfig(N=N, num_nodes=P, angles_total=angles_total)
    angles_np, valid_np, _ = radon.node_angles(geo)
    angles = jnp.asarray(angles_np, jnp.float32)
    valid = jnp.asarray(valid_np)
    return geo, angles, valid


def test_shear_matches_fft_projection():
    geo, angles, valid = _tables_and_geo()
    P = geo.num_nodes
    t_sh = radon_fft.precompute_shear(geo, angles, valid)
    t_ref = jax.vmap(
        lambda a, v: radon_fft.precompute_phases(geo, a, v)
    )(angles, valid)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (P, geo.N, geo.N))
    got = radon_fft.project_nodes_shear(geo, imgs, t_sh)
    ref = jnp.stack([
        radon_fft.project(
            geo, imgs[i], angles[i], valid[i],
            {k: v[i] for k, v in t_ref.items()},
        )
        for i in range(P)
    ])
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_shear_adjoint_is_exact_transpose():
    geo, angles, valid = _tables_and_geo()
    P = geo.num_nodes
    t = radon_fft.precompute_shear(geo, angles, valid)
    x = jax.random.normal(jax.random.PRNGKey(7), (P, geo.N, geo.N))
    y = jax.random.normal(
        jax.random.PRNGKey(8), (P, angles.shape[1], geo.n_det)
    )
    Ax = radon_fft.project_nodes_shear(geo, x, t)
    Aty = radon_fft.backproject_nodes_shear(geo, y, t)
    np.testing.assert_allclose(
        float(jnp.sum(Ax * y)), float(jnp.sum(x * Aty)), rtol=1e-4
    )


def test_shear_kernel_matches_reference():
    from dip_admm_tpu.ops.pallas import shear_sum as ss

    geo, angles, valid = _tables_and_geo()
    t = radon_fft.precompute_shear(geo, angles, valid)
    P, NB, Tp, D2, nb = t["Wt"].shape
    TB = t["onehot"].shape[1]
    F = t["SEre"].shape[-1]
    k = jax.random.split(jax.random.PRNGKey(3), 2)
    rre_s = jax.random.normal(k[0], (P, TB, NB * nb, F))
    rim_s = jax.random.normal(k[1], (P, TB, NB * nb, F))
    args = (rre_s, rim_s, t["Wt"], t["SEre"], t["SEim"],
            t["shared"]["Phire"], t["shared"]["Phiim"])
    got = ss.shear_sum(*args)
    ref = ss.shear_sum_reference(*args)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=2e-4, atol=2e-4
        )
    # hand transpose == jax.linear_transpose of the reference
    gb = jax.random.normal(k[0], (P, Tp, F))
    gi = jax.random.normal(k[1], (P, Tp, F))
    got_t = ss.shear_sum_t(gb, gi, t["Wt"], t["SEre"], t["SEim"],
                           t["shared"]["Phire"], t["shared"]["Phiim"], t["onehot"])
    f = lambda a, b: ss.shear_sum_reference(
        a, b, t["Wt"], t["SEre"], t["SEim"], t["shared"]["Phire"], t["shared"]["Phiim"]
    )
    ref_t = jax.linear_transpose(f, rre_s, rim_s)((gb, gi))
    for g, r in zip(got_t, ref_t):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=2e-4, atol=2e-4
        )


def test_shear_mode_admm_trajectory_matches_fft():
    cfg = _cfg()
    r_fft = admm.run_admm(loader.build_problem(cfg, mode="fft"))
    r_sh = admm.run_admm(loader.build_problem(cfg, mode="fft_shear"))
    np.testing.assert_allclose(
        np.asarray(r_sh.x), np.asarray(r_fft.x), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(r_sh.history["primal"]),
        np.asarray(r_fft.history["primal"]), rtol=1e-3, atol=1e-5,
    )


def test_shear_scenario_batching_matches_per_run():
    cfg = _cfg()
    problem = loader.build_problem(cfg, mode="fft_shear")
    bb = jnp.stack([problem.b, problem.b * 1.15])
    res = admm.run_admm_batched(problem, bb)
    for i in range(2):
        single = admm.run_admm(
            dataclasses.replace(problem, b=bb[i]), cfg.admm
        )
        np.testing.assert_allclose(
            np.asarray(res.x[i]), np.asarray(single.x), rtol=2e-4, atol=2e-4
        )
