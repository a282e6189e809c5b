"""Isotropic total-variation operators.

TPU-native equivalents of the reference TV helpers
(``/root/reference/block_4_tv_helpers.py``): forward-difference gradient
operator K, its exact adjoint K^T, the isotropic TV value, the normalized-field
subgradient used by the inexact-ADMM acceptance test
(``block_4_tv_helpers.py:37-46``), and the prox operators needed by the
primal-dual node solver (which replace CVXPY's cone formulation,
``block_4_tv_helpers.py:5-14``).

All functions operate on [..., N, N] images (leading batch axes broadcast),
are pure jnp, and fuse fully under jit.

Conventions
-----------
``grad(x) -> (gx, gy)`` with
  gx[i, j] = x[i+1, j] - x[i, j]  (last row zero)
  gy[i, j] = x[i, j+1] - x[i, j]  (last column zero)

``grad_adjoint`` is the *exact* adjoint of ``grad`` (verified by inner-product
tests). Note: the reference's hand-written adjoint flips the sign of the
boundary rows/columns relative to the interior
(``block_4_tv_helpers.py:25-35``) — a defect flagged in SURVEY §2.3 that we do
not replicate; the acceptance residual here uses the true adjoint.

The operator norm bound ``||K||^2 <= 8`` is used for primal-dual step sizes.
"""

from __future__ import annotations

import jax.numpy as jnp

GRAD_OPNORM_SQ = 8.0  # classical bound for forward-difference 2-D gradient


def _pad_tail(x, axis):
    """Append one zero slice along ``axis`` (shift-free; concat fuses on TPU
    where scatter-style ``at[].set`` updates do not)."""
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, 1)
    return jnp.pad(x, pads)


def _pad_head(x, axis):
    pads = [(0, 0)] * x.ndim
    pads[axis] = (1, 0)
    return jnp.pad(x, pads)


def grad(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Forward-difference gradient of [..., N, N] -> two [..., N, N] fields."""
    gx = _pad_tail(x[..., 1:, :] - x[..., :-1, :], x.ndim - 2)
    gy = _pad_tail(x[..., :, 1:] - x[..., :, :-1], x.ndim - 1)
    return gx, gy


def grad_adjoint(gx: jnp.ndarray, gy: jnp.ndarray) -> jnp.ndarray:
    """Exact adjoint K^T of ``grad``.

    (K^T p)[a, b] = p_x[a-1, b] - p_x[a, b] + p_y[a, b-1] - p_y[a, b]
    with out-of-range entries zero; the structurally-zero dual components
    (last row of p_x, last column of p_y) are ignored.
    """
    ax, ay = gx.ndim - 2, gy.ndim - 1
    px = gx[..., :-1, :]  # drop the structurally-zero last row
    py = gy[..., :, :-1]
    out = _pad_head(px, ax) - _pad_tail(px, ax)
    out = out + _pad_head(py, ay) - _pad_tail(py, ay)
    return out


def tv_value(x: jnp.ndarray) -> jnp.ndarray:
    """Isotropic TV: sum over pixels of sqrt(gx^2 + gy^2)
    (matches the CVXPY expression at ``block_4_tv_helpers.py:5-14``)."""
    gx, gy = grad(x)
    return jnp.sum(jnp.sqrt(gx**2 + gy**2), axis=(-2, -1))


def tv_subgradient(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """K^T (Kx / |Kx|): the normalized-field subgradient used by the
    reference's stationarity acceptance test
    (``block_6_admm_loop_ver2.py:134-155``). Zero where |Kx| <= eps."""
    gx, gy = grad(x)
    mag = jnp.sqrt(gx**2 + gy**2)
    scale = jnp.where(mag > eps, 1.0 / jnp.maximum(mag, eps), 0.0)
    return grad_adjoint(gx * scale, gy * scale)


def project_l2_ball(
    gx: jnp.ndarray, gy: jnp.ndarray, radius: float | jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel projection of the dual field onto {|(px,py)|_2 <= radius}.

    This is prox of the conjugate of ``radius * ||.||_{2,1}`` — the dual step
    of the primal-dual node solver. ``radius == 0`` (no TV) projects to zero
    (guarding the 0/0 NaN where the field magnitude is also exactly zero).
    """
    mag = jnp.sqrt(gx**2 + gy**2)
    r = jnp.asarray(radius, dtype=mag.dtype)
    safe_r = jnp.maximum(r, jnp.asarray(1e-30, mag.dtype))
    factor = jnp.where(
        r > 0, 1.0 / jnp.maximum(1.0, mag / safe_r), 0.0
    )
    return gx * factor, gy * factor


def tv_prox_chambolle(
    w: jnp.ndarray,
    weight: float,
    n_iters: int = 20,
    step: float = 0.25,
    p_init: tuple[jnp.ndarray, jnp.ndarray] | None = None,
) -> tuple[jnp.ndarray, tuple[jnp.ndarray, jnp.ndarray]]:
    """prox_{weight * TV}(w) via Chambolle's projected dual ascent.

    Solves argmin_x 0.5 ||x - w||^2 + weight * TV(x) through its dual:
        max_{|p| <= weight} -0.5 ||K^T p||^2 + <K^T p, w>   (x = w - K^T p)
    iterating p <- Proj_{|.|<=weight}(p + step * K(w - K^T p)).

    ``step <= 1/||K||^2 = 1/8`` guarantees convergence; 0.25 is the classical
    over-relaxed choice that works for this projected gradient form in
    practice (Chambolle 2004 uses tau<=1/8; we default to 1/4 with the
    variant normalization). Returns (x, p) so callers can warm-start.
    """
    import jax

    if p_init is None:
        px = jnp.zeros_like(w)
        py = jnp.zeros_like(w)
    else:
        px, py = p_init

    def body(_, carry):
        px, py = carry
        x = w - grad_adjoint(px, py)
        gx, gy = grad(x)
        px, py = project_l2_ball(px + step * gx, py + step * gy, weight)
        return px, py

    px, py = jax.lax.fori_loop(0, n_iters, body, (px, py))
    x = w - grad_adjoint(px, py)
    return x, (px, py)


def edge_map(x: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel gradient magnitude |Kx| (diagnostic parity with
    ``block_4_tv_helpers_with_plot.py:23-40``)."""
    gx, gy = grad(x)
    return jnp.sqrt(gx**2 + gy**2)
