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


def test_fan_colnorms_match_brute_force():
    # W[p] = ||A_fan[:, p]||^2 for the rebinned operator, against columns
    # materialized by projecting basis images (setup-scale oracle).
    import jax
    import jax.numpy as jnp

    from dip_admm_tpu.config import GeometryConfig
    from dip_admm_tpu.ops import radon_fan

    N = 16
    cfg = GeometryConfig(N=N, num_nodes=1, fan_beam=True, angles_total=24)
    beta = jnp.asarray(
        (jnp.arange(24, dtype=jnp.float32) + 0.5) * (2 * jnp.pi / 24)
    )
    tables = radon_fan.precompute_fan(cfg, beta)

    def col(p):
        e = jnp.zeros((N * N,)).at[p].set(1.0).reshape(N, N)
        s = radon_fan.project(cfg, e, beta, tables=tables)
        return jnp.sum(s * s)

    W_brute = np.asarray(jax.lax.map(col, jnp.arange(N * N)))
    W = np.asarray(radon_fan.colnorms_sq(cfg, beta)).reshape(-1)
    mask = W_brute > 0.05 * W_brute.max()
    ratio = W[mask] / W_brute[mask]
    # Exact at the center (the rebin phase shift is norm-preserving there);
    # the fractional interp tap attenuates edge pixels' high angular
    # frequencies, so the closed form overestimates those by up to ~1.6x —
    # still strictly tighter everywhere than the old 2-tap heuristic
    # (measured med 1.41/max 1.56 vs med 1.84/max 2.52 at this geometry).
    assert ratio.min() > 0.95, ratio.min()
    assert ratio.max() < 1.65, ratio.max()
    from dip_admm_tpu.ops import radon as radon_mod

    W_old = np.asarray(
        radon_mod.colnorms_sq(cfg, beta, jnp.ones(beta.shape[0], bool))
    ).reshape(-1)
    old_err = np.abs(W_old[mask] / W_brute[mask] - 1.0)
    new_err = np.abs(ratio - 1.0)
    assert np.median(new_err) < np.median(old_err)
