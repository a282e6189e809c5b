"""Fan-beam rebinning projector vs the per-ray gather fan projector."""

import jax
import jax.numpy as jnp
import numpy as np

from dip_admm_tpu.config import GeometryConfig
from dip_admm_tpu.ops import radon, radon_fan


CFG = GeometryConfig(
    N=32, num_nodes=1, angles_total=64, fan_beam=True,
    det_width_factor=2.0, src_radius=4.0, det_radius=4.0,
)


def _beta(m=64):
    return jnp.asarray((np.arange(m) + 0.5) * 2 * np.pi / m, jnp.float32)


def _smooth_img(N=32):
    c = np.linspace(-1, 1, N)
    X, Y = np.meshgrid(c, c, indexing="ij")
    return jnp.asarray(
        (np.exp(-((X - 0.15) ** 2 + (Y + 0.1) ** 2) / 0.1)
         + 0.7 * np.exp(-((X + 0.25) ** 2 + Y**2) / 0.2)).astype(np.float32)
    )


def test_matches_gather_fan():
    beta = _beta()
    img = _smooth_img()
    ref = np.asarray(radon.project(CFG, img, beta))
    got = np.asarray(radon_fan.project(CFG, img, beta))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.03, rel


def test_adjoint_exact():
    beta = _beta()
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 32))
    y = jax.random.normal(jax.random.PRNGKey(1), (64, CFG.n_det))
    ax = radon_fan.project(CFG, x, beta)
    aty = radon_fan.backproject(CFG, y, beta)
    np.testing.assert_allclose(
        float(jnp.sum(ax * y)), float(jnp.sum(x * aty)), rtol=1e-3
    )


def test_tables_path_equal():
    beta = _beta()
    img = _smooth_img()
    tabs = radon_fan.precompute_fan(CFG, beta)
    a = np.asarray(radon_fan.project(CFG, img, beta))
    b = np.asarray(radon_fan.project(CFG, img, beta, tables=tabs))
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_valid_mask():
    m = 64
    beta = _beta(m)
    valid = jnp.asarray([True] * 60 + [False] * 4)
    img = _smooth_img()
    out = np.asarray(radon_fan.project(CFG, img, beta, valid))
    assert (out[60:] == 0).all()
    assert np.abs(out[:60]).max() > 0
