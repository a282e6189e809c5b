"""Fused edge-consensus update as a Pallas TPU kernel.

One outer ADMM iteration updates, for every edge slot (i, j) and pixel p,
given the (possibly over-relaxed) proposals a_ij = x̂_ij + y_ij:

    z_ij   = fuse(a_ij, a_ji)              (midpoint or W-weighted, eq. 2)
    y_ij   = a_ij - z_ij                    (scaled dual, eq. 3: y + x̂ - z)
    pri   += (x̂ - z_ij)^2 = (a - y - z)^2, dz2 += (z_new - z_old)^2  (eqs. 4-5)

The jnp implementation (``core.admm.admm_iteration``) materializes ~6
intermediate [P_loc, P, n] tensors — at 32 nodes x 512^2 that is tens of GB
of HBM traffic per iteration. This kernel performs the whole update in a
single pass: each grid step streams one (i, j, pixel-tile) block through
VMEM, writes z/y in place, and accumulates the per-(i, j) residual partials
across pixel tiles (first-tile-initializes, then adds — Pallas revisits the
same output block for every tile index).

Taking the proposals a (already materialized by the caller for the
``all_to_all`` pair transpose) instead of x keeps the kernel agnostic to
over-relaxation: a = alpha*x + (1-alpha)*z + y reduces to x + y at alpha=1.

Numerics are identical to the jnp path (verified by equivalence tests, which
run the kernel in interpreter mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Kernel block layouts (TPU tiling rule: the last two dims of every VMEM
# block must be (multiple-of-8 | full, multiple-of-128 | full)): all arrays
# carry a singleton axis so blocks are [.., 1, tile] with the "1" equal to
# its full dimension; scalar edge masks / reduction outputs live in SMEM,
# which is exempt.


def pick_tile(n: int, want: int = 2048) -> int:
    """Largest pixel-tile <= ``want`` that divides n and satisfies the TPU
    lane rule (multiple of 128, or the full dimension)."""
    for t in (want, 1024, 512, 256, 128):
        if t <= want and n % t == 0:
            return t
    return n  # full-dim block (always legal)


def _kernel_midpoint(a_ref, y_ref, z_ref, at_ref, adj_ref,
                     zn_ref, yn_ref, pri_ref, dz2_ref):
    t = pl.program_id(2)
    adj = adj_ref[0, 0, 0, 0]
    a = a_ref[0, 0, :]
    y = y_ref[0, 0, :]
    z_old = z_ref[0, 0, :]
    a_t = at_ref[0, 0, :]
    zn = 0.5 * (a + a_t) * adj
    yn = (a - zn) * adj
    zn_ref[0, 0, :] = zn
    yn_ref[0, 0, :] = yn
    dpri = (a - y - zn) * adj
    dz = (zn - z_old) * adj
    pri_part = jnp.sum(dpri * dpri)
    dz2_part = jnp.sum(dz * dz)

    @pl.when(t == 0)
    def _():
        pri_ref[0, 0, 0, 0] = 0.0
        dz2_ref[0, 0, 0, 0] = 0.0

    pri_ref[0, 0, 0, 0] += pri_part
    dz2_ref[0, 0, 0, 0] += dz2_part


def _kernel_weighted(a_ref, y_ref, z_ref, at_ref, adj_ref, wi_ref, wj_ref,
                     zn_ref, yn_ref, pri_ref, dz2_ref):
    t = pl.program_id(2)
    adj = adj_ref[0, 0, 0, 0]
    a = a_ref[0, 0, :]
    y = y_ref[0, 0, :]
    z_old = z_ref[0, 0, :]
    a_t = at_ref[0, 0, :]
    wi = wi_ref[0, 0, :]
    wj = wj_ref[0, 0, :]
    zn = ((wi * a + wj * a_t) / (wi + wj)) * adj
    yn = (a - zn) * adj
    zn_ref[0, 0, :] = zn
    yn_ref[0, 0, :] = yn
    dpri = (a - y - zn) * adj
    dz = (zn - z_old) * adj

    @pl.when(t == 0)
    def _():
        pri_ref[0, 0, 0, 0] = 0.0
        dz2_ref[0, 0, 0, 0] = 0.0

    pri_ref[0, 0, 0, 0] += jnp.sum(dpri * dpri)
    dz2_ref[0, 0, 0, 0] += jnp.sum(dz * dz)


@functools.partial(
    jax.jit, static_argnames=("fusion", "tile", "interpret")
)
def consensus_update(
    a: jnp.ndarray,  # [P_loc, P, n] proposals a_ij = x̂_ij + y_ij
    y: jnp.ndarray,  # [P_loc, P, n] duals
    z: jnp.ndarray,  # [P_loc, P, n] previous consensus
    a_t: jnp.ndarray,  # [P_loc, P, n] transposed proposals a_ji
    adjm: jnp.ndarray,  # [P_loc, P] edge mask (float)
    w_own: jnp.ndarray | None = None,  # [P_loc, n] (weighted fusion)
    w_all: jnp.ndarray | None = None,  # [P, n]
    fusion: str = "midpoint",
    tile: int = 2048,
    interpret: bool = False,
):
    """Fused z/y/residual update. Returns (z_new, y_new, pri_pair, dz2_pair)
    with pri_pair/dz2_pair of shape [P_loc, P] (per-(i, j) partials; callers
    reduce over j / psum as needed)."""
    P_loc, P, n = y.shape
    tile = min(tile, n)
    assert n % tile == 0, (n, tile)
    grid = (P_loc, P, n // tile)
    dtype = a.dtype
    # TPU tiling rule: the last two dims of a VMEM block must be
    # (multiple-of-8 | full-dim, multiple-of-128 | full-dim). Flattening the
    # (i, j) pair axes into the unconstrained leading dim and carrying a
    # singleton middle axis makes every block [1, 1(full), tile].
    Pp = P_loc * P
    pair = lambda M: M.reshape(Pp, 1, n)

    pair_spec = pl.BlockSpec(
        (1, 1, tile), lambda i, j, t: (i * P + j, 0, t),
        memory_space=pltpu.VMEM,
    )
    x_spec = pl.BlockSpec((1, 1, tile), lambda i, j, t: (i, 0, t),
                          memory_space=pltpu.VMEM)
    # Scalars as [P_loc, P, 1, 1] so the (1, 1) trailing block dims equal
    # the full array dims (the tiling rule applies to SMEM blocks too).
    adj_spec = pl.BlockSpec((1, 1, 1, 1), lambda i, j, t: (i, j, 0, 0),
                            memory_space=pltpu.SMEM)
    red_spec = pl.BlockSpec((1, 1, 1, 1), lambda i, j, t: (i, j, 0, 0),
                            memory_space=pltpu.SMEM)
    out_shape = (
        jax.ShapeDtypeStruct((Pp, 1, n), dtype),  # z_new
        jax.ShapeDtypeStruct((Pp, 1, n), dtype),  # y_new
        jax.ShapeDtypeStruct((P_loc, P, 1, 1), dtype),  # pri partials
        jax.ShapeDtypeStruct((P_loc, P, 1, 1), dtype),  # dz2 partials
    )
    out_specs = (pair_spec, pair_spec, red_spec, red_spec)

    if fusion == "midpoint":
        zn, yn, pri, dz2 = pl.pallas_call(
            _kernel_midpoint,
            grid=grid,
            in_specs=[pair_spec, pair_spec, pair_spec, pair_spec, adj_spec],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(pair(a), pair(y), pair(z), pair(a_t),
          adjm.astype(dtype).reshape(P_loc, P, 1, 1))
    elif fusion == "weighted":
        wj_spec = pl.BlockSpec((1, 1, tile), lambda i, j, t: (j, 0, t),
                               memory_space=pltpu.VMEM)
        zn, yn, pri, dz2 = pl.pallas_call(
            _kernel_weighted,
            grid=grid,
            in_specs=[pair_spec, pair_spec, pair_spec, pair_spec, adj_spec,
                      x_spec, wj_spec],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(pair(a), pair(y), pair(z), pair(a_t),
          adjm.astype(dtype).reshape(P_loc, P, 1, 1),
          w_own[:, None, :], w_all[:, None, :])
    else:
        raise ValueError(fusion)
    return (
        zn.reshape(P_loc, P, n),
        yn.reshape(P_loc, P, n),
        pri.reshape(P_loc, P),
        dz2.reshape(P_loc, P),
    )


def consensus_update_reference(a, y, z, a_t, adjm, w_own=None, w_all=None,
                               fusion="midpoint"):
    """Plain-jnp reference with identical semantics (for tests/fallback)."""
    am = adjm[:, :, None].astype(a.dtype)
    if fusion == "midpoint":
        zn = 0.5 * (a + a_t) * am
    else:
        wi = w_own[:, None, :]
        wj = w_all[None, :, :]
        zn = ((wi * a + wj * a_t) / (wi + wj)) * am
    yn = (a - zn) * am
    dpri = (a - y - zn) * am
    dz = (zn - z) * am
    return zn, yn, jnp.sum(dpri * dpri, -1), jnp.sum(dz * dz, -1)
