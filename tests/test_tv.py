import jax
import jax.numpy as jnp
import numpy as np

from dip_admm_tpu.ops import tv


def test_grad_adjoint_inner_product():
    # <Kx, p> == <x, K^T p> for random x, p (exact adjoint; the reference's
    # hand-written adjoint has a boundary sign defect we must NOT reproduce).
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    N = 17
    x = jax.random.normal(k1, (N, N))
    px = jax.random.normal(k2, (N, N))
    py = jax.random.normal(k3, (N, N))
    gx, gy = tv.grad(x)
    lhs = jnp.sum(gx * px) + jnp.sum(gy * py)
    rhs = jnp.sum(x * tv.grad_adjoint(px, py))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-5)


def test_tv_value_matches_manual():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 8)))
    X = np.asarray(x)
    dx = np.zeros_like(X)
    dy = np.zeros_like(X)
    dx[:-1, :] = X[1:, :] - X[:-1, :]
    dy[:, :-1] = X[:, 1:] - X[:, :-1]
    expected = np.sum(np.sqrt(dx**2 + dy**2))
    np.testing.assert_allclose(tv.tv_value(x), expected, rtol=1e-6)


def test_tv_value_constant_zero():
    assert float(tv.tv_value(jnp.full((16, 16), 3.7))) == 0.0


def test_grad_opnorm_bound():
    # Power-iteration estimate of ||K||^2 must respect the bound 8.
    key = jax.random.PRNGKey(1)
    v = jax.random.normal(key, (32, 32))
    for _ in range(50):
        gx, gy = tv.grad(v)
        w = tv.grad_adjoint(gx, gy)
        v = w / jnp.linalg.norm(w)
    gx, gy = tv.grad(v)
    lam = float(jnp.sum(gx**2 + gy**2))
    assert lam <= tv.GRAD_OPNORM_SQ + 1e-6


def test_prox_chambolle_denoises():
    # prox_{t*TV} of a noisy flat image should reduce TV while staying close.
    rng = np.random.default_rng(0)
    w = jnp.asarray(10.0 + rng.normal(size=(32, 32)))
    x, _ = tv.tv_prox_chambolle(w, weight=2.0, n_iters=100)
    assert float(tv.tv_value(x)) < 0.25 * float(tv.tv_value(w))
    # Optimality: w - x must equal K^T p with |p|<=weight; check objective
    # decreased.
    obj = lambda u: 0.5 * jnp.sum((u - w) ** 2) + 2.0 * tv.tv_value(u)
    assert float(obj(x)) < float(obj(w))


def test_prox_chambolle_zero_weight_identity():
    w = jnp.asarray(np.random.default_rng(1).normal(size=(16, 16)))
    x, _ = tv.tv_prox_chambolle(w, weight=0.0, n_iters=10)
    np.testing.assert_allclose(np.asarray(x), np.asarray(w), atol=1e-6)


def test_subgradient_bounded_norm():
    # ||K^T s|| with |s|<=1 is bounded by sqrt(8)*sqrt(n_pixels-ish); sanity
    # check the subgradient is finite and zero for constant images.
    x = jnp.full((16, 16), 5.0)
    np.testing.assert_allclose(np.asarray(tv.tv_subgradient(x)), 0.0)
    y = jnp.asarray(np.random.default_rng(2).normal(size=(16, 16)))
    g = tv.tv_subgradient(y)
    assert np.isfinite(np.asarray(g)).all()
