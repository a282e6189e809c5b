"""MXU-recast Pallas kernel for the FFT-projector filter-sum contraction.

The VPU kernel in ``filter_sum.py`` is compute-bound: the complex
multiply-accumulate over image rows n runs on the vector unit at ~100-200
GB/s effective table bandwidth on a ~800 GB/s part. This module moves the
contraction onto the MXU:

    g[p, t, f] = sum_n r[p, n, f] * H[p, t, n, f]

is, per 128-wide frequency block, a batched-over-f matvec. It becomes a true
matmul by eye-expanding the row spectrum into a block-diagonal rhs

    R[(n, f), f'] = r[n, f] * delta_{f, f'}        (shape [tn*128, 128])

so that  g_blk[t, f'] = H2[t, (n, f)] @ R[(n, f), f']  with H2 the phase
table pre-tiled at build time to [P, FB, NB, Tp, tn*128]. The MXU performs
128x the useful multiply-adds, but at bf16 matmul rate that is still far
faster than the VPU elementwise form, and the kernel stays HBM-bound on the
table read (the speed-of-light for this stage). Complex arithmetic = 4 real
matmuls per block; accumulation is f32 via ``preferred_element_type``.

Branch selection (which image orientation's spectrum each angle contracts,
``radon_fft.precompute_merged``'s ``sel``) is handled OUTSIDE the kernel:
``plan_branch_groups`` reorders each node's angles at table-build time so
every tt-angle block is single-branch (per-node angle blocks are contiguous
in angle, so the |cos|>|sin| boundary splits them into at most three runs;
at 256^2/8 nodes the 45/135-degree boundaries align with node boundaries
and the grouping is the identity). The per-block spectrum plane is then a
plain gather done with a tiny einsum against a [P, TB, 2] one-hot (XLA
transposes it for free), and the kernel itself has no select logic at all.

The row permutation back to original angle order is a pair of
``take_along_axis`` gathers that are each other's transpose (a bijection's
transpose is its inverse permutation — no scatter on the hot path); the
projector adjoint chain in ``ops.radon_fft`` applies the inverse gather
explicitly.

The adjoint contraction (over angles t, K = tt per block) would waste the
MXU (K < 128), so the transpose kernel stays on the VPU — but in the cheap
direction: the cotangent g_bar is lane-tiled across the n axis and the
per-element work is a plain FMA against the same pre-tiled table (~6 ops
per table element vs ~16 in the old select kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# Build-time planning (host / numpy)
# ---------------------------------------------------------------------------


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def plan_branch_groups(
    use_c: np.ndarray,
    valid: np.ndarray,
    tt_candidates=(32, 16, 8),
    max_overhead: float = 1.15,
):
    """Per-node angle regrouping so every tt-angle block is single-branch.

    use_c, valid: [P, T] bool (branch-C selector / angle validity).

    Returns a dict of numpy arrays:
      tt        : chosen angle block (static int)
      Tp        : padded slot count (static int, multiple of tt, >= T)
      src_slot  : [P, Tp] int32, original angle index feeding each slot
                  (-1 = slack slot, table row zeroed)
      posfull   : [P, Tp] int32 bijection, slot of original index i
                  (indices >= T map slack slots; out rows are g[posfull][:T])
      invposfull: [P, Tp] int32 inverse bijection
      onehot    : [P, TB, 2] f32, spectrum plane of each angle block
                  (plane 1 = transposed-image spectrum)

    The chosen tt is the largest candidate whose zero-row padding keeps the
    table read overhead Tp/T below ``max_overhead`` (slack rows are read but
    contain zeros).
    """
    use_c = np.asarray(use_c, bool)
    valid = np.asarray(valid, bool)
    P, T = use_c.shape
    key = np.where(valid, use_c.astype(np.int64), 2)
    n0 = (key == 0).sum(axis=1)
    n1 = (key == 1).sum(axis=1)

    tt = tt_candidates[-1]
    Tp = None
    for cand in tt_candidates:
        need = max(
            int(
                max(
                    _ceil_to(int(a), cand) + _ceil_to(int(b), cand)
                    for a, b in zip(n0, n1)
                )
            ),
            _ceil_to(T, cand),
        )
        if need <= max_overhead * T or cand == tt_candidates[-1]:
            tt, Tp = cand, need
            break

    TB = Tp // tt
    src_slot = np.full((P, Tp), -1, np.int32)
    posfull = np.zeros((P, Tp), np.int32)
    onehot = np.zeros((P, TB, 2), np.float32)
    for i in range(P):
        order = np.argsort(key[i], kind="stable")
        o1 = _ceil_to(int(n0[i]), tt)
        o2 = o1 + _ceil_to(int(n1[i]), tt)
        slot_of = np.empty(T, np.int32)
        slot_of[order[: n0[i]]] = np.arange(n0[i])
        slot_of[order[n0[i] : n0[i] + n1[i]]] = o1 + np.arange(n1[i])
        # invalid angles -> slack slots (zero table rows -> zero output rows)
        slack = np.setdiff1d(np.arange(Tp), slot_of[order[: n0[i] + n1[i]]])
        n_inv = T - n0[i] - n1[i]
        slot_of[order[n0[i] + n1[i] :]] = slack[:n_inv]
        src_slot[i, slot_of] = np.arange(T)
        posfull[i, :T] = slot_of
        posfull[i, T:] = slack[n_inv:]
        blk = np.arange(TB) * tt
        plane1 = (blk >= o1) & (blk < o2)
        onehot[i, :, 1] = plane1.astype(np.float32)
        onehot[i, :, 0] = 1.0 - onehot[i, :, 1]
    invposfull = np.argsort(posfull, axis=1).astype(np.int32)
    return dict(
        tt=int(tt),
        Tp=int(Tp),
        src_slot=src_slot,
        posfull=posfull,
        invposfull=invposfull,
        onehot=onehot,
    )


def pick_tn(N: int, want: int = 32) -> int:
    """Row tile: largest multiple-of-8 divisor of N that is <= want."""
    t = want
    while t >= 8:
        if N % t == 0 and t % 8 == 0:
            return t
        t //= 2
    return N


def tile_table(H, src_slot, Fpad: int, tn: int):
    """Pre-tile one real table plane [P, T, N, F] ->
    [P, Fpad/128, N/tn, Tp, tn*128] with rows permuted into branch-grouped
    slot order (slack slots zero). One-time, at table build."""
    P, T, N, F = H.shape
    Tp = src_slot.shape[1]
    idx = jnp.clip(src_slot, 0)
    Hp = jnp.take_along_axis(H, idx[:, :, None, None], axis=1)
    Hp = Hp * (src_slot >= 0)[:, :, None, None].astype(H.dtype)
    Hp = jnp.pad(Hp, ((0, 0), (0, 0), (0, 0), (0, Fpad - F)))
    NB, FB = N // tn, Fpad // 128
    Hp = Hp.reshape(P, Tp, NB, tn, FB, 128)
    Hp = Hp.transpose(0, 4, 2, 1, 3, 5)
    return Hp.reshape(P, FB, NB, Tp, tn * 128)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(hre_ref, him_ref, rre_ref, rim_ref, gre_ref, gim_ref):
    nb = pl.program_id(3)
    hre = hre_ref[0, 0, 0]  # [tt, tn*128] storage dtype
    him = him_ref[0, 0, 0]
    tdt = hre.dtype
    tn = rre_ref.shape[-2]
    rre = rre_ref[0, 0]  # [tn, 128] f32
    rim = rim_ref[0, 0]
    i1 = jax.lax.broadcasted_iota(jnp.int32, (tn, 128, 128), 1)
    i2 = jax.lax.broadcasted_iota(jnp.int32, (tn, 128, 128), 2)
    eye = i1 == i2
    # Eye-expansion stays f32: Mosaic only supports the minor-dim insert
    # (rre[:, :, None]) for 32-bit types; cast to the table dtype after the
    # collapse-reshape instead.
    Rre = jnp.where(eye, rre[:, :, None], 0.0).reshape(tn * 128, 128)
    Rim = jnp.where(eye, rim[:, :, None], 0.0).reshape(tn * 128, 128)
    Rre = Rre.astype(tdt)
    Rim = Rim.astype(tdt)
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    gre = dot(hre, Rre) - dot(him, Rim)  # [tt, 128] f32
    gim = dot(hre, Rim) + dot(him, Rre)

    @pl.when(nb == 0)
    def _():
        gre_ref[0] = jnp.zeros_like(gre_ref[0])
        gim_ref[0] = jnp.zeros_like(gim_ref[0])

    gre_ref[0] += gre
    gim_ref[0] += gim


def _adj_kernel(gre_ref, gim_ref, hre_ref, him_ref, rre_ref, rim_ref):
    hre = hre_ref[0, 0, 0].astype(jnp.float32)  # [tt, tn*128]
    him = him_ref[0, 0, 0].astype(jnp.float32)
    tn = hre.shape[-1] // 128
    gre = jnp.tile(gre_ref[0], (1, tn))  # [tt, tn*128]
    gim = jnp.tile(gim_ref[0], (1, tn))
    rre = jnp.sum(hre * gre + him * gim, axis=0, keepdims=True)
    rim = jnp.sum(hre * gim - him * gre, axis=0, keepdims=True)
    rre_ref[0, 0] = rre.reshape(tn, 128)
    rim_ref[0, 0] = rim.reshape(tn, 128)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fwd_pallas(rre, rim, Hre, Him, interpret=False):
    P, FB, NB, Tp, tnl = Hre.shape
    tn = tnl // 128
    PB, TB = rre.shape[:2]  # PB = B * P under scenario batching
    tt = Tp // TB
    grid = (PB, TB, FB, NB)  # nb innermost: accumulation axis
    h_spec = pl.BlockSpec(
        (1, 1, 1, tt, tnl), lambda p, tb, fb, nb: (p % P, fb, nb, tb, 0),
        memory_space=pltpu.VMEM,
    )
    r_spec = pl.BlockSpec(
        (1, 1, tn, 128), lambda p, tb, fb, nb: (p, tb, nb, fb),
        memory_space=pltpu.VMEM,
    )
    g_spec = pl.BlockSpec(
        (1, tt, 128), lambda p, tb, fb, nb: (p, tb, fb),
        memory_space=pltpu.VMEM,
    )
    bytes_h = Hre.size * Hre.dtype.itemsize * 2
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[h_spec, h_spec, r_spec, r_spec],
        out_specs=(g_spec, g_spec),
        out_shape=(
            jax.ShapeDtypeStruct((PB, Tp, FB * 128), jnp.float32),
            jax.ShapeDtypeStruct((PB, Tp, FB * 128), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * PB * Tp * NB * tn * FB * 128 * 128,
            bytes_accessed=bytes_h * (PB // P) + rre.size * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(Hre, Him, rre, rim)


@functools.partial(jax.jit, static_argnames=("TB", "interpret"))
def _adj_pallas(gre_b, gim_b, Hre, Him, TB, interpret=False):
    P, FB, NB, Tp, tnl = Hre.shape
    tn = tnl // 128
    tt = Tp // TB
    PB = gre_b.shape[0]
    grid = (PB, TB, FB, NB)
    g_spec = pl.BlockSpec(
        (1, tt, 128), lambda p, tb, fb, nb: (p, tb, fb),
        memory_space=pltpu.VMEM,
    )
    h_spec = pl.BlockSpec(
        (1, 1, 1, tt, tnl), lambda p, tb, fb, nb: (p % P, fb, nb, tb, 0),
        memory_space=pltpu.VMEM,
    )
    r_spec = pl.BlockSpec(
        (1, 1, tn, 128), lambda p, tb, fb, nb: (p, tb, nb, fb),
        memory_space=pltpu.VMEM,
    )
    bytes_h = Hre.size * Hre.dtype.itemsize * 2
    out = pl.pallas_call(
        _adj_kernel,
        grid=grid,
        in_specs=[g_spec, g_spec, h_spec, h_spec],
        out_specs=(r_spec, r_spec),
        out_shape=(
            jax.ShapeDtypeStruct((PB, TB, NB * tn, FB * 128), jnp.float32),
            jax.ShapeDtypeStruct((PB, TB, NB * tn, FB * 128), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * PB * Tp * NB * tn * FB * 128,
            bytes_accessed=bytes_h * (PB // P) + gre_b.size * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(gre_b, gim_b, Hre, Him)
    return out


def _interp() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Public entry points (explicit adjoint + custom_vmap batching)
# ---------------------------------------------------------------------------


from jax import custom_batching  # noqa: E402


def _fold2(a, B):
    return a.reshape((B * a.shape[1],) + a.shape[2:])


@custom_batching.custom_vmap
def filter_sum_mxu(rre, rim, Hre_t, Him_t):
    """g[p,t,f] = sum_n r_sel[p, blk(t), n, f] * H[p,t,n,f] on the MXU.

    rre/rim: per-angle-block selected spectra [P, TB, N, Fpad] (f32);
    Hre_t/Him_t: pre-tiled tables [P, FB, NB, Tp, tn*128] from
    :func:`tile_table` (rows in branch-grouped slot order). Output
    [P, Tp, Fpad] f32 pair, rows in slot order. Adjoint:
    :func:`filter_sum_mxu_t`."""
    return _fwd_pallas(rre, rim, Hre_t, Him_t, interpret=_interp())


@filter_sum_mxu.def_vmap
def _filter_sum_mxu_vmap(axis_size, in_batched, rre, rim, Hre_t, Him_t):
    if not (in_batched[0] and in_batched[1]) or any(in_batched[2:]):
        raise NotImplementedError(
            "filter_sum_mxu: vmap expects spectra batched, tables unbatched"
        )
    out = _fwd_pallas(
        _fold2(rre, axis_size), _fold2(rim, axis_size), Hre_t, Him_t,
        interpret=_interp(),
    )
    return tuple(
        o.reshape((axis_size, -1) + o.shape[1:]) for o in out
    ), (True, True)


@custom_batching.custom_vmap
def filter_sum_mxu_t(gre_b, gim_b, Hre_t, Him_t, blkmark):
    """Exact transpose of :func:`filter_sum_mxu` w.r.t. (rre, rim).
    ``blkmark``: any array whose second dim is TB (the ``onehot`` table).
    Output [P, TB, N, Fpad] pair."""
    return _adj_pallas(
        gre_b, gim_b, Hre_t, Him_t, TB=blkmark.shape[1], interpret=_interp()
    )


@filter_sum_mxu_t.def_vmap
def _filter_sum_mxu_t_vmap(
    axis_size, in_batched, gre_b, gim_b, Hre_t, Him_t, blkmark
):
    if not (in_batched[0] and in_batched[1]) or any(in_batched[2:]):
        raise NotImplementedError(
            "filter_sum_mxu_t: vmap expects cotangents batched, tables "
            "unbatched"
        )
    out = _adj_pallas(
        _fold2(gre_b, axis_size), _fold2(gim_b, axis_size), Hre_t, Him_t,
        TB=blkmark.shape[1], interpret=_interp(),
    )
    return tuple(
        o.reshape((axis_size, -1) + o.shape[1:]) for o in out
    ), (True, True)


def permute_rows(g, perm):
    """y[p, i] = g[p, perm[p, i]] — bijective row gather. Its transpose is
    the same gather with the inverse permutation (``invposfull`` for
    ``posfull`` and vice versa); the projector adjoint chains apply it
    explicitly. Natively vmappable."""
    return jnp.take_along_axis(g, perm[:, :, None], axis=1)


# ---------------------------------------------------------------------------
# Reference (tests)
# ---------------------------------------------------------------------------


def filter_sum_mxu_reference(rre, rim, Hre_t, Him_t):
    """Plain-jnp reference of the slot-order contraction: un-tile the table
    back to [P, Tp, N, Fpad] and contract with the per-block spectra."""
    P, FB, NB, Tp, tnl = Hre_t.shape
    tn = tnl // 128
    TB = rre.shape[1]
    tt = Tp // TB

    def untile(Ht):
        H = Ht.reshape(P, FB, NB, Tp, tn, 128)
        H = H.transpose(0, 3, 2, 4, 1, 5)
        return H.reshape(P, Tp, NB * tn, FB * 128).astype(jnp.float32)

    H_re = untile(Hre_t)
    H_im = untile(Him_t)
    # expand per-block spectra to per-slot
    rre_s = jnp.repeat(rre, tt, axis=1)  # [P, Tp, N, Fpad]
    rim_s = jnp.repeat(rim, tt, axis=1)
    g_re = jnp.sum(rre_s * H_re - rim_s * H_im, axis=2)
    g_im = jnp.sum(rre_s * H_im + rim_s * H_re, axis=2)
    return g_re, g_im
