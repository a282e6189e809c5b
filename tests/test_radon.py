import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dip_admm_tpu.config import GeometryConfig
from dip_admm_tpu.ops import radon


CFG = GeometryConfig(N=32, num_nodes=3, angles_total=48)


def test_node_angles_split():
    angles, valid, counts = radon.node_angles(CFG)
    assert counts.tolist() == [16, 16, 16]
    cfg2 = GeometryConfig(N=32, num_nodes=5, angles_total=48)
    _, _, c2 = radon.node_angles(cfg2)
    # Remainder goes to the first nodes (ref block_2_load_odl_data.py:36-38).
    assert c2.tolist() == [10, 10, 10, 9, 9]
    assert valid[:, :16].all()


def test_projection_of_disk_analytic():
    # A centered disk: projection at every angle is the chord-length profile
    # 2*sqrt(r^2 - d^2) * density, independent of angle.
    N = 64
    cfg = GeometryConfig(N=N, num_nodes=1, angles_total=8)
    r = 0.5
    h = 2.0 / N
    c = -1 + (np.arange(N) + 0.5) * h
    X, Y = np.meshgrid(c, c, indexing="ij")
    img = jnp.asarray((X**2 + Y**2 <= r**2).astype(np.float32))
    angles = jnp.asarray(radon.aggregate_angles(cfg))
    sino = radon.project(cfg, img, angles)
    dets = radon.detector_centers(cfg.n_det, 2.0)
    expected = 2.0 * np.sqrt(np.maximum(r**2 - dets**2, 0.0))
    for t in range(len(angles)):
        np.testing.assert_allclose(
            np.asarray(sino[t]), expected, atol=3 * h
        )


def test_projection_rotation_invariance_uniform_square():
    # Mass preservation: integral of each projection == integral of image
    # (within discretization error) for rays fully covering the support.
    N = 48
    cfg = GeometryConfig(N=N, num_nodes=1, angles_total=12, det_width_factor=1.5)
    rng = np.random.default_rng(0)
    img = np.zeros((N, N), dtype=np.float32)
    img[N // 4 : -N // 4, N // 4 : -N // 4] = rng.random((N // 2, N // 2))
    angles = jnp.asarray(radon.aggregate_angles(cfg))
    sino = np.asarray(radon.project(cfg, jnp.asarray(img), angles))
    det_w = cfg.det_width_factor * 2.0
    mass = img.sum() * (2.0 / N) ** 2
    proj_mass = sino.sum(axis=1) * (det_w / cfg.n_det)
    np.testing.assert_allclose(proj_mass, mass, rtol=0.02)


def test_adjoint_exact():
    cfg = GeometryConfig(N=24, num_nodes=1, angles_total=20)
    angles = jnp.asarray(radon.aggregate_angles(cfg))
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (24, 24))
    y = jax.random.normal(jax.random.PRNGKey(1), (20, cfg.n_det))
    ax = radon.project(cfg, x, angles)
    aty = radon.backproject(cfg, y, angles)
    np.testing.assert_allclose(
        float(jnp.sum(ax * y)), float(jnp.sum(x * aty)), rtol=1e-4
    )


def test_dense_matches_matrix_free():
    cfg = GeometryConfig(N=16, num_nodes=1, angles_total=10)
    angles = jnp.asarray(radon.aggregate_angles(cfg))
    A = np.asarray(radon.dense_matrix(cfg, angles, chunk=64))
    assert A.shape == (10 * cfg.n_det, 16 * 16)
    x = np.random.default_rng(0).normal(size=(16, 16)).astype(np.float32)
    direct = np.asarray(radon.project(cfg, jnp.asarray(x), angles)).reshape(-1)
    via_dense = A @ x.reshape(-1)
    np.testing.assert_allclose(via_dense, direct, rtol=1e-4, atol=1e-5)


def test_colnorms_matrix_free_vs_dense():
    cfg = GeometryConfig(N=16, num_nodes=1, angles_total=12)
    angles = jnp.asarray(radon.aggregate_angles(cfg))
    A = np.asarray(radon.dense_matrix(cfg, angles, chunk=64))
    w_dense = np.sum(A * A, axis=0)
    w_free = np.asarray(radon.colnorms_sq(cfg, angles)).reshape(-1)
    np.testing.assert_allclose(w_free, w_dense, rtol=1e-4, atol=1e-5)


def test_padded_angles_masked():
    # Invalid (padding) angles must contribute exactly zero rows.
    cfg = GeometryConfig(N=16, num_nodes=3, angles_total=10)
    angles, valid, _ = radon.node_angles(cfg)
    imgs = jnp.asarray(
        np.random.default_rng(0).normal(size=(3, 16, 16)).astype(np.float32)
    )
    sinos = radon.project_nodes(cfg, imgs, jnp.asarray(angles), jnp.asarray(valid))
    assert sinos.shape == (3, 4, cfg.n_det)
    # node 0 has 4 valid angles, nodes 1-2 have 3 valid + 1 padded.
    assert np.all(np.asarray(sinos[1, 3]) == 0.0)
    assert np.all(np.asarray(sinos[2, 3]) == 0.0)
    assert np.any(np.asarray(sinos[0, 3]) != 0.0)


def test_fan_beam_adjoint_and_mass():
    cfg = GeometryConfig(
        N=24, num_nodes=1, angles_total=16, fan_beam=True,
        det_width_factor=3.0, src_radius=4.0, det_radius=4.0,
    )
    angles = jnp.asarray(np.linspace(0, 2 * np.pi, 16, endpoint=False))
    x = jax.random.normal(jax.random.PRNGKey(2), (24, 24))
    y = jax.random.normal(jax.random.PRNGKey(3), (16, cfg.n_det))
    ax = radon.project(cfg, x, angles)
    aty = radon.backproject(cfg, y, angles)
    np.testing.assert_allclose(
        float(jnp.sum(ax * y)), float(jnp.sum(x * aty)), rtol=1e-4
    )
