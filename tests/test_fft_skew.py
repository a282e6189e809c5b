"""``fft_skew`` projector mode: the SPATIAL skew row stage must implement
exactly the same operator as ``fft_shear`` (the substitution v = u - d +
(D2-1) into the factored filter-sum is exact), with an exact hand-written
transpose and vmap batch folding."""

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


def test_skew_matches_shear_projection():
    geo, angles, valid = _tables_and_geo()
    P = geo.num_nodes
    t = radon_fft.precompute_shear(geo, angles, valid)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (P, geo.N, geo.N))
    got = radon_fft.project_nodes_skew(geo, imgs, t)
    ref = radon_fft.project_nodes_shear(geo, imgs, t)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_skew_matches_fft_projection():
    geo, angles, valid = _tables_and_geo(N=24)
    P = geo.num_nodes
    t = radon_fft.precompute_shear(geo, angles, valid)
    t_ref = jax.vmap(
        lambda a, v: radon_fft.precompute_phases(geo, a, v)
    )(angles, valid)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (P, geo.N, geo.N))
    got = radon_fft.project_nodes_skew(geo, imgs, t)
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


def test_skew_adjoint_is_exact_transpose():
    geo, angles, valid = _tables_and_geo()
    P = geo.num_nodes
    t = radon_fft.precompute_shear(geo, angles, valid)
    x = jax.random.normal(jax.random.PRNGKey(7), (P, geo.N, geo.N))
    y = jax.random.normal(
        jax.random.PRNGKey(8), (P, angles.shape[1], geo.n_det)
    )
    Ax = radon_fft.project_nodes_skew(geo, x, t)
    Aty = radon_fft.backproject_nodes_skew(geo, y, t)
    np.testing.assert_allclose(
        float(jnp.sum(Ax * y)), float(jnp.sum(x * Aty)), rtol=1e-4
    )


def test_skew_backprojection_matches_shear():
    geo, angles, valid = _tables_and_geo()
    P = geo.num_nodes
    t = radon_fft.precompute_shear(geo, angles, valid)
    y = jax.random.normal(
        jax.random.PRNGKey(9), (P, angles.shape[1], geo.n_det)
    )
    got = radon_fft.backproject_nodes_skew(geo, y, t)
    ref = radon_fft.backproject_nodes_shear(geo, y, t)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_skew_mode_admm_trajectory_matches_shear():
    cfg = _cfg()
    r_sh = admm.run_admm(loader.build_problem(cfg, mode="fft_shear"))
    r_sk = admm.run_admm(loader.build_problem(cfg, mode="fft_skew"))
    np.testing.assert_allclose(
        np.asarray(r_sk.x), np.asarray(r_sh.x), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(r_sk.history["primal"]),
        np.asarray(r_sh.history["primal"]), rtol=1e-3, atol=1e-5,
    )


def test_skew_scenario_batching_matches_per_run():
    cfg = _cfg()
    problem = loader.build_problem(cfg, mode="fft_skew")
    bb = jnp.stack([problem.b, problem.b * 1.15])
    res = admm.run_admm_batched(problem, bb)
    for i in range(2):
        single = admm.run_admm(
            dataclasses.replace(problem, b=bb[i]), cfg.admm
        )
        np.testing.assert_allclose(
            np.asarray(res.x[i]), np.asarray(single.x), rtol=2e-4, atol=2e-4
        )


def test_loader_keeps_one_tap_layout_per_mode():
    """Each projector mode carries exactly ONE tap-table layout (r5 review:
    both aliases would double the dominant table HBM): fft_skew keeps the
    d-major WtT, fft_shear the t-major Wt; the fan shared.par subtree is
    skew-only."""
    import dataclasses

    from dip_admm_tpu.config import (
        AdmmConfig, GeometryConfig, GraphConfig, NodeSolverConfig,
        ProblemConfig,
    )
    from dip_admm_tpu.data import loader

    cfg = ProblemConfig(
        geometry=GeometryConfig(N=16, num_nodes=3, angles_total=18),
        graph=GraphConfig(strategy="knn", k=1, seed=123),
        admm=AdmmConfig(max_iters=1,
                        node=NodeSolverConfig(max_inner=2, check_every=2)),
        phantom="const",
    )
    skew = loader.build_problem(cfg, mode="fft_skew").fft_tables
    assert "WtT" in skew and "Wt" not in skew
    shear = loader.build_problem(cfg, mode="fft_shear").fft_tables
    assert "Wt" in shear and "WtT" not in shear
    fan_cfg = dataclasses.replace(
        cfg, geometry=dataclasses.replace(
            cfg.geometry, fan_beam=True, angles_total=24,
            det_width_factor=2.0,
        ),
    )
    fan = loader.build_problem(fan_cfg, mode="fft_skew").fft_tables
    par = fan["shared"]["par"]
    assert "WtT" in par and "Wt" not in par
