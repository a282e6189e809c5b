"""Pallas TPU kernel for the FFT-projector filter-sum contraction.

The hot stage of the gather-free projector (``ops.radon_fft._branch_apply``)
is the complex contraction over image rows n

    g[p, t, f] = sum_n r[p, n, f] * H[p, t, n, f]

(r = rfft of the padded image rows, H = precomputed shift-phase table). At
256^2 / 8 nodes the H read (~0.8 GB per branch pair) bounds the whole inner
loop; XLA's einsum pair is near bandwidth-bound in f32 but *regresses* when
H is stored bfloat16 (the mixed-precision lowering materializes an upcast
copy). This kernel reads H blocks in their storage dtype straight from HBM,
upcasts in VMEM, and accumulates in f32 — so bf16 tables genuinely halve
the dominant traffic.

The complex product is carried in real/imaginary planes throughout:

    g_re = sum_n rre*Hre - rim*Him        g_im = sum_n rre*Him + rim*Hre

and the hand-written transpose (contraction over t with conj(H))

    rre_bar = sum_t gre_bar*Hre + gim_bar*Him
    rim_bar = sum_t gim_bar*Hre - gre_bar*Him

is registered via ``jax.custom_transpose`` so ``jax.linear_transpose`` of the
full projector (the adjoint path, ``radon_fft.backproject``) traverses the
kernel. Equivalence with the jnp einsum path and exact adjointness are
covered by tests (interpreter mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick(dim: int, want: int, mult: int = 8) -> int:
    """Largest block <= ``want`` that divides ``dim`` and is a multiple of
    ``mult`` (falling back to the full dim, which is always legal)."""
    t = want
    while t >= mult:
        if dim % t == 0 and t % mult == 0:
            return t
        t //= 2
    return dim


def _tiles(T: int, N: int, F: int) -> tuple[int, int]:
    """(tt, tn) angle/row tiles sized so the kernel's [tt, tn, F] f32
    working set stays within scoped VMEM (~16 MB incl. double-buffered
    blocks and upcast temps) — at 512^2 (F=1025 -> 1152 lanes) the default
    16x32 tiles overflow the stack allocator."""
    fpad = -(-F // 128) * 128
    tt = _pick(T, 16)
    tn = _pick(N, 32, mult=16)
    while tt * tn * fpad > 400_000:
        if tn >= 32 and _pick(N, tn // 2, mult=16) < tn:
            tn = _pick(N, tn // 2, mult=16)
        elif tt > 8 and _pick(T, tt // 2) < tt:
            tt = _pick(T, tt // 2)
        else:
            break
    return tt, tn


def _fwd_kernel(rre_ref, rim_ref, hre_ref, him_ref, gre_ref, gim_ref):
    nb = pl.program_id(1)
    rre = rre_ref[0]  # [tn, F] f32
    rim = rim_ref[0]
    hre = hre_ref[0].astype(jnp.float32)  # [tt, tn, F]
    him = him_ref[0].astype(jnp.float32)
    gre = jnp.sum(rre[None] * hre - rim[None] * him, axis=1)  # [tt, F]
    gim = jnp.sum(rre[None] * him + rim[None] * hre, axis=1)

    @pl.when(nb == 0)
    def _():
        gre_ref[0] = jnp.zeros_like(gre_ref[0])
        gim_ref[0] = jnp.zeros_like(gim_ref[0])

    gre_ref[0] += gre
    gim_ref[0] += gim


def _t_kernel(gre_ref, gim_ref, hre_ref, him_ref, rre_ref, rim_ref):
    tb = pl.program_id(1)
    gre = gre_ref[0]  # [tt, F] f32
    gim = gim_ref[0]
    hre = hre_ref[0].astype(jnp.float32)  # [tt, tn, F]
    him = him_ref[0].astype(jnp.float32)
    rre = jnp.sum(gre[:, None] * hre + gim[:, None] * him, axis=0)  # [tn, F]
    rim = jnp.sum(gim[:, None] * hre - gre[:, None] * him, axis=0)

    @pl.when(tb == 0)
    def _():
        rre_ref[0] = jnp.zeros_like(rre_ref[0])
        rim_ref[0] = jnp.zeros_like(rim_ref[0])

    rre_ref[0] += rre
    rim_ref[0] += rim


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fwd_pallas(rre, rim, Hre, Him, interpret=False):
    P, T, N, F = Hre.shape
    tt, tn = _tiles(T, N, F)  # sublane-multiple for bf16 blocks
    # Flatten (p, t-block) into the first grid axis so every output block is
    # revisited only across the trailing n axis (accumulate pattern).
    grid = (P * (T // tt), N // tn)  # n innermost: accumulation axis
    r_spec = pl.BlockSpec(
        (1, tn, F), lambda q, nb: (q // (T // tt), nb, 0),
        memory_space=pltpu.VMEM,
    )
    h_spec = pl.BlockSpec(
        (1, tt, tn, F),
        lambda q, nb: (q // (T // tt), q % (T // tt), nb, 0),
        memory_space=pltpu.VMEM,
    )
    g_spec = pl.BlockSpec(
        (1, tt, F), lambda q, nb: (q // (T // tt), q % (T // tt), 0),
        memory_space=pltpu.VMEM,
    )
    bytes_h = Hre.size * Hre.dtype.itemsize * 2
    out = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[r_spec, r_spec, h_spec, h_spec],
        out_specs=(g_spec, g_spec),
        out_shape=(
            jax.ShapeDtypeStruct((P, T, F), jnp.float32),
            jax.ShapeDtypeStruct((P, T, F), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * P * T * N * F,
            bytes_accessed=bytes_h + rre.size * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(rre, rim, Hre, Him)
    return out


@functools.partial(jax.jit, static_argnames=("interpret",))
def _t_pallas(gre_b, gim_b, Hre, Him, interpret=False):
    P, T, N, F = Hre.shape
    tt, tn = _tiles(T, N, F)
    grid = (P * (N // tn), T // tt)  # t innermost: accumulation axis
    g_spec = pl.BlockSpec(
        (1, tt, F), lambda q, tb: (q // (N // tn), tb, 0),
        memory_space=pltpu.VMEM,
    )
    h_spec = pl.BlockSpec(
        (1, tt, tn, F),
        lambda q, tb: (q // (N // tn), tb, q % (N // tn), 0),
        memory_space=pltpu.VMEM,
    )
    r_spec = pl.BlockSpec(
        (1, tn, F), lambda q, tb: (q // (N // tn), q % (N // tn), 0),
        memory_space=pltpu.VMEM,
    )
    bytes_h = Hre.size * Hre.dtype.itemsize * 2
    return pl.pallas_call(
        _t_kernel,
        grid=grid,
        in_specs=[g_spec, g_spec, h_spec, h_spec],
        out_specs=(r_spec, r_spec),
        out_shape=(
            jax.ShapeDtypeStruct((P, N, F), jnp.float32),
            jax.ShapeDtypeStruct((P, N, F), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * P * T * N * F,
            bytes_accessed=bytes_h + gre_b.size * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(gre_b, gim_b, Hre, Him)


def _fwd_sel_kernel(rre_ref, rim_ref, hre_ref, him_ref, sel_ref,
                    gre_ref, gim_ref):
    nb = pl.program_id(1)
    s = sel_ref[0][:, :, None]  # [tt, 1, 1]
    # Per-angle branch select: plane 0 = image rows, plane 1 = transposed.
    rre = rre_ref[0, 0][None] + s * (rre_ref[0, 1] - rre_ref[0, 0])[None]
    rim = rim_ref[0, 0][None] + s * (rim_ref[0, 1] - rim_ref[0, 0])[None]
    hre = hre_ref[0].astype(jnp.float32)  # [tt, tn, F]
    him = him_ref[0].astype(jnp.float32)
    gre = jnp.sum(rre * hre - rim * him, axis=1)  # [tt, F]
    gim = jnp.sum(rre * him + rim * hre, axis=1)

    @pl.when(nb == 0)
    def _():
        gre_ref[0] = jnp.zeros_like(gre_ref[0])
        gim_ref[0] = jnp.zeros_like(gim_ref[0])

    gre_ref[0] += gre
    gim_ref[0] += gim


def _t_sel_kernel(gre_ref, gim_ref, hre_ref, him_ref, sel_ref,
                  rre_ref, rim_ref):
    tb = pl.program_id(1)
    s = sel_ref[0]  # [tt, 1]
    gre = gre_ref[0]  # [tt, F]
    gim = gim_ref[0]
    hre = hre_ref[0].astype(jnp.float32)  # [tt, tn, F]
    him = him_ref[0].astype(jnp.float32)
    # Cotangent of plane o is the plain transpose weighted by that plane's
    # per-angle gate: fold the gate into g first, then contract over t.
    gre1 = gre * s
    gim1 = gim * s
    gre0 = gre - gre1
    gim0 = gim - gim1
    r0_re = jnp.sum(gre0[:, None] * hre + gim0[:, None] * him, axis=0)
    r0_im = jnp.sum(gim0[:, None] * hre - gre0[:, None] * him, axis=0)
    r1_re = jnp.sum(gre1[:, None] * hre + gim1[:, None] * him, axis=0)
    r1_im = jnp.sum(gim1[:, None] * hre - gre1[:, None] * him, axis=0)

    @pl.when(tb == 0)
    def _():
        rre_ref[0] = jnp.zeros_like(rre_ref[0])
        rim_ref[0] = jnp.zeros_like(rim_ref[0])

    rre_ref[0, 0] += r0_re
    rre_ref[0, 1] += r1_re
    rim_ref[0, 0] += r0_im
    rim_ref[0, 1] += r1_im


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fwd_sel_pallas(rre2, rim2, Hre, Him, sel, interpret=False):
    P, T, N, F = Hre.shape
    tt, tn = _tiles(T, N, F)
    grid = (P * (T // tt), N // tn)
    r2_spec = pl.BlockSpec(
        (1, 2, tn, F), lambda q, nb: (q // (T // tt), 0, nb, 0),
        memory_space=pltpu.VMEM,
    )
    h_spec = pl.BlockSpec(
        (1, tt, tn, F),
        lambda q, nb: (q // (T // tt), q % (T // tt), nb, 0),
        memory_space=pltpu.VMEM,
    )
    sel_spec = pl.BlockSpec(
        (1, tt, 1), lambda q, nb: (q // (T // tt), q % (T // tt), 0),
        memory_space=pltpu.VMEM,
    )
    g_spec = pl.BlockSpec(
        (1, tt, F), lambda q, nb: (q // (T // tt), q % (T // tt), 0),
        memory_space=pltpu.VMEM,
    )
    bytes_h = Hre.size * Hre.dtype.itemsize * 2
    return pl.pallas_call(
        _fwd_sel_kernel,
        grid=grid,
        in_specs=[r2_spec, r2_spec, h_spec, h_spec, sel_spec],
        out_specs=(g_spec, g_spec),
        out_shape=(
            jax.ShapeDtypeStruct((P, T, F), jnp.float32),
            jax.ShapeDtypeStruct((P, T, F), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=12 * P * T * N * F,
            bytes_accessed=bytes_h + rre2.size * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(rre2, rim2, Hre, Him, sel)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _t_sel_pallas(gre_b, gim_b, Hre, Him, sel, interpret=False):
    P, T, N, F = Hre.shape
    tt, tn = _tiles(T, N, F)
    grid = (P * (N // tn), T // tt)
    g_spec = pl.BlockSpec(
        (1, tt, F), lambda q, tb: (q // (N // tn), tb, 0),
        memory_space=pltpu.VMEM,
    )
    h_spec = pl.BlockSpec(
        (1, tt, tn, F),
        lambda q, tb: (q // (N // tn), tb, q % (N // tn), 0),
        memory_space=pltpu.VMEM,
    )
    sel_spec = pl.BlockSpec(
        (1, tt, 1), lambda q, tb: (q // (N // tn), tb, 0),
        memory_space=pltpu.VMEM,
    )
    r2_spec = pl.BlockSpec(
        (1, 2, tn, F), lambda q, tb: (q // (N // tn), 0, q % (N // tn), 0),
        memory_space=pltpu.VMEM,
    )
    bytes_h = Hre.size * Hre.dtype.itemsize * 2
    return pl.pallas_call(
        _t_sel_kernel,
        grid=grid,
        in_specs=[g_spec, g_spec, h_spec, h_spec, sel_spec],
        out_specs=(r2_spec, r2_spec),
        out_shape=(
            jax.ShapeDtypeStruct((P, 2, N, F), jnp.float32),
            jax.ShapeDtypeStruct((P, 2, N, F), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=16 * P * T * N * F,
            bytes_accessed=bytes_h + gre_b.size * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(gre_b, gim_b, Hre, Him, sel)


def _grp_tn(N: int, tt: int, F: int) -> int:
    """Row tile for the grouped kernels: fit the [tt, tn, F] f32 working set
    in scoped VMEM given the plan-fixed angle block tt."""
    fpad = -(-F // 128) * 128
    tn = _pick(N, 32, mult=16)
    while tn > 16 and tt * tn * fpad > 400_000:
        nxt = _pick(N, tn // 2, mult=16)
        if nxt >= tn:
            break
        tn = nxt
    return tn


def _fwd_grp_kernel(rre_ref, rim_ref, hre_ref, him_ref, gre_ref, gim_ref):
    nb = pl.program_id(1)
    rre = rre_ref[0, 0]  # [tn, F] f32 — this block's (single) spectrum plane
    rim = rim_ref[0, 0]
    hre = hre_ref[0].astype(jnp.float32)  # [tt, tn, F]
    him = him_ref[0].astype(jnp.float32)
    gre = jnp.sum(rre[None] * hre - rim[None] * him, axis=1)  # [tt, F]
    gim = jnp.sum(rre[None] * him + rim[None] * hre, axis=1)

    @pl.when(nb == 0)
    def _():
        gre_ref[0] = jnp.zeros_like(gre_ref[0])
        gim_ref[0] = jnp.zeros_like(gim_ref[0])

    gre_ref[0] += gre
    gim_ref[0] += gim


def _t_grp_kernel(gre_ref, gim_ref, hre_ref, him_ref, rre_ref, rim_ref):
    # Pure map: each (angle-block, row-block) writes its own output block —
    # no cross-step accumulation (the cross-block plane reduction is the
    # transposed one-hot einsum OUTSIDE the kernel).
    gre = gre_ref[0]  # [tt, F] f32
    gim = gim_ref[0]
    hre = hre_ref[0].astype(jnp.float32)  # [tt, tn, F]
    him = him_ref[0].astype(jnp.float32)
    rre_ref[0, 0] = jnp.sum(gre[:, None] * hre + gim[:, None] * him, axis=0)
    rim_ref[0, 0] = jnp.sum(gim[:, None] * hre - gre[:, None] * him, axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fwd_grp_pallas(rre_s, rim_s, Hre, Him, interpret=False):
    P, Tp, N, F = Hre.shape
    TB = rre_s.shape[1]
    tt = Tp // TB
    tn = _grp_tn(N, tt, F)
    grid = (P * TB, N // tn)  # n innermost: accumulation axis
    r_spec = pl.BlockSpec(
        (1, 1, tn, F), lambda q, nb: (q // TB, q % TB, nb, 0),
        memory_space=pltpu.VMEM,
    )
    h_spec = pl.BlockSpec(
        (1, tt, tn, F), lambda q, nb: (q // TB, q % TB, nb, 0),
        memory_space=pltpu.VMEM,
    )
    g_spec = pl.BlockSpec(
        (1, tt, F), lambda q, nb: (q // TB, q % TB, 0),
        memory_space=pltpu.VMEM,
    )
    bytes_h = Hre.size * Hre.dtype.itemsize * 2
    return pl.pallas_call(
        _fwd_grp_kernel,
        grid=grid,
        in_specs=[r_spec, r_spec, h_spec, h_spec],
        out_specs=(g_spec, g_spec),
        out_shape=(
            jax.ShapeDtypeStruct((P, Tp, F), jnp.float32),
            jax.ShapeDtypeStruct((P, Tp, F), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * P * Tp * N * F,
            bytes_accessed=bytes_h + rre_s.size * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(rre_s, rim_s, Hre, Him)


@functools.partial(jax.jit, static_argnames=("TB", "interpret"))
def _t_grp_pallas(gre_b, gim_b, Hre, Him, TB, interpret=False):
    P, Tp, N, F = Hre.shape
    tt = Tp // TB
    tn = _grp_tn(N, tt, F)
    grid = (P * TB, N // tn)
    g_spec = pl.BlockSpec(
        (1, tt, F), lambda q, nb: (q // TB, q % TB, 0),
        memory_space=pltpu.VMEM,
    )
    h_spec = pl.BlockSpec(
        (1, tt, tn, F), lambda q, nb: (q // TB, q % TB, nb, 0),
        memory_space=pltpu.VMEM,
    )
    r_spec = pl.BlockSpec(
        (1, 1, tn, F), lambda q, nb: (q // TB, q % TB, nb, 0),
        memory_space=pltpu.VMEM,
    )
    bytes_h = Hre.size * Hre.dtype.itemsize * 2
    return pl.pallas_call(
        _t_grp_kernel,
        grid=grid,
        in_specs=[g_spec, g_spec, h_spec, h_spec],
        out_specs=(r_spec, r_spec),
        out_shape=(
            jax.ShapeDtypeStruct((P, TB, N, F), jnp.float32),
            jax.ShapeDtypeStruct((P, TB, N, F), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * P * Tp * N * F,
            bytes_accessed=bytes_h + gre_b.size * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(gre_b, gim_b, Hre, Him)


def _interp() -> bool:
    return jax.default_backend() != "tpu"


@jax.custom_transpose.custom_transpose
def _filter_sum_ct(res, lin):
    Hre, Him = res
    rre, rim = lin
    return _fwd_pallas(rre, rim, Hre, Him, interpret=_interp())


@_filter_sum_ct.def_transpose
def _filter_sum_transpose(res, out_bar):
    Hre, Him = res
    gre_b, gim_b = out_bar
    return _t_pallas(gre_b, gim_b, Hre, Him, interpret=_interp())


def filter_sum(rre, rim, Hre, Him):
    """Batched complex filter-sum ``g[p,t,f] = sum_n r[p,n,f] H[p,t,n,f]``
    as real planes; linear in (rre, rim) with a registered transpose (so the
    projector adjoint via ``jax.linear_transpose`` works through it)."""
    P, T, N, F = Hre.shape
    # custom_transpose wants avals (ShapedArray), not ShapeDtypeStructs.
    aval = jax.core.ShapedArray((P, T, F), jnp.float32)
    return _filter_sum_ct((aval, aval), (Hre, Him), (rre, rim))


@jax.custom_transpose.custom_transpose
def _filter_sum_sel_ct(res, lin):
    Hre, Him, sel = res
    rre2, rim2 = lin
    return _fwd_sel_pallas(rre2, rim2, Hre, Him, sel, interpret=_interp())


@_filter_sum_sel_ct.def_transpose
def _filter_sum_sel_transpose(res, out_bar):
    Hre, Him, sel = res
    gre_b, gim_b = out_bar
    return _t_sel_pallas(gre_b, gim_b, Hre, Him, sel, interpret=_interp())


def filter_sum_sel(rre2, rim2, Hre, Him, sel):
    """Branch-merged filter-sum: per angle t, contract the sel-selected
    spectrum plane (0 = image rows, 1 = transposed image rows) with the
    merged phase table:

        g[p,t,f] = sum_n r[p, sel[p,t], n, f] * H[p,t,n,f]

    rre2/rim2: [P, 2, N, F]; sel: [P, T, 1] float in {0, 1}. Linear in
    (rre2, rim2) with a registered transpose."""
    P, T, N, F = Hre.shape
    aval = jax.core.ShapedArray((P, T, F), jnp.float32)
    return _filter_sum_sel_ct((aval, aval), (Hre, Him, sel), (rre2, rim2))


@jax.custom_transpose.custom_transpose
def _filter_sum_grp_ct(res, lin):
    Hre, Him, onehot = res
    rre_s, rim_s = lin
    return _fwd_grp_pallas(rre_s, rim_s, Hre, Him, interpret=_interp())


@_filter_sum_grp_ct.def_transpose
def _filter_sum_grp_transpose(res, out_bar):
    Hre, Him, onehot = res
    gre_b, gim_b = out_bar
    return _t_grp_pallas(
        gre_b, gim_b, Hre, Him, TB=onehot.shape[1], interpret=_interp()
    )


def filter_sum_grouped(rre_s, rim_s, Hre_g, Him_g, onehot):
    """Branch-grouped select-free filter-sum:

        g[p, t, f] = sum_n r_s[p, blk(t), n, f] * H[p, t, n, f]

    Hre_g/Him_g [P, Tp, N, F]: merged phase tables with rows permuted into
    branch-grouped slot order (``filter_mxu.plan_branch_groups``) so every
    tt-angle block contracts a single spectrum plane; rre_s/rim_s
    [P, TB, N, F]: that block's selected spectrum (the one-hot gather done
    outside). No in-kernel select — the forward is the plain 8-op complex
    FMA, the transpose a pure map (each block owns its output, no
    accumulate) at half the select kernel's arithmetic. ``onehot``
    [P, TB, 2] rides along so the transpose rule can recover TB. Output
    [P, Tp, F] f32 pair in slot order; linear in (rre_s, rim_s) with a
    registered transpose."""
    P, Tp, N, F = Hre_g.shape
    aval = jax.core.ShapedArray((P, Tp, F), jnp.float32)
    return _filter_sum_grp_ct(
        (aval, aval), (Hre_g, Him_g, onehot), (rre_s, rim_s)
    )


def filter_sum_grouped_reference(rre_s, rim_s, Hre_g, Him_g):
    """Plain-jnp reference of the slot-order grouped contraction."""
    P, Tp, N, F = Hre_g.shape
    TB = rre_s.shape[1]
    tt = Tp // TB
    rre = jnp.repeat(rre_s, tt, axis=1)  # [P, Tp, N, F]
    rim = jnp.repeat(rim_s, tt, axis=1)
    Hre32 = Hre_g.astype(jnp.float32)
    Him32 = Him_g.astype(jnp.float32)
    g_re = jnp.sum(rre * Hre32 - rim * Him32, axis=2)
    g_im = jnp.sum(rre * Him32 + rim * Hre32, axis=2)
    return g_re, g_im


def filter_sum_sel_reference(rre2, rim2, Hre, Him, sel):
    """Plain-jnp reference for tests (reads both planes, selects)."""
    s = sel[:, :, None, :]  # [P, T, 1, 1]
    rre = rre2[:, None, 0] + s * (rre2[:, None, 1] - rre2[:, None, 0])
    rim = rim2[:, None, 0] + s * (rim2[:, None, 1] - rim2[:, None, 0])
    Hre32 = Hre.astype(jnp.float32)
    Him32 = Him.astype(jnp.float32)
    g_re = jnp.sum(rre * Hre32 - rim * Him32, axis=2)
    g_im = jnp.sum(rre * Him32 + rim * Hre32, axis=2)
    return g_re, g_im


def filter_sum_reference(rre, rim, Hre, Him):
    """Plain-jnp reference (f32 accumulation) for tests."""
    ein = functools.partial(
        jnp.einsum, "pnf,ptnf->ptf", preferred_element_type=jnp.float32
    )
    g_re = ein(rre, Hre) - ein(rim, Him)
    g_im = ein(rre, Him) + ein(rim, Hre)
    return g_re, g_im
