"""Pallas TPU kernels for the FFT-projector filter-sum contraction.

The hot stage of the gather-free projector (``ops.radon_fft``) is the
complex contraction over image rows n

    g[p, t, f] = sum_n r[p, n, f] * H[p, t, n, f]

(r = rfft of the padded image rows, H = precomputed shift-phase table). At
256^2 / 8 nodes the H read (~0.4 GB merged bf16) bounds the whole inner
loop; XLA's einsum pair is near bandwidth-bound in f32 but *regresses* when
H is stored bfloat16 (the mixed-precision lowering materializes an upcast
copy). These kernels read H blocks in their storage dtype straight from
HBM, upcast in VMEM, and accumulate in f32 — so low-precision tables
genuinely cut the dominant traffic.

The complex product is carried in real/imaginary planes throughout:

    g_re = sum_n rre*Hre - rim*Him        g_im = sum_n rre*Him + rim*Hre

Two variants:
  - ``filter_sum_sel``: merged-branch tables with an in-kernel per-angle
    branch select (plane 0 = image rows, plane 1 = transposed image).
  - ``filter_sum_grouped``: angle rows pre-permuted into branch-grouped
    slot order (``filter_mxu.plan_branch_groups``) so every tt-angle block
    contracts one spectrum plane — no select, half the arithmetic.

Adjoints are NOT derived via autodiff: each forward has an explicit
transpose entry point (``*_t``) driving the transposed kernel, and
``ops.radon_fft`` composes the full projector adjoint by hand (verified
against ``jax.linear_transpose`` of the jnp reference in tests). This keeps
the hot path free of ``custom_transpose`` machinery, which has no batching
rule — every entry point here is wrapped in ``jax.custom_batching
.custom_vmap`` whose rule folds the scenario-batch axis into the node axis
of the kernel grid (tables stay unbatched; the H block index maps take
``p % P``), so ``vmap``-ed whole runs (scenario batching, BASELINE config
4) traverse the kernels without duplicating the tables.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import custom_batching
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


def _interp() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Merged-branch kernels with in-kernel select (fft_pallas mode)
# ---------------------------------------------------------------------------


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
    # rre2/rim2 may carry a scenario batch folded into the leading axis:
    # PB = B * P with the table/node index p = q % P.
    P, T, N, F = Hre.shape
    PB = rre2.shape[0]
    tt, tn = _tiles(T, N, F)
    TBq = T // tt
    grid = (PB * TBq, N // tn)
    r2_spec = pl.BlockSpec(
        (1, 2, tn, F), lambda q, nb: (q // TBq, 0, nb, 0),
        memory_space=pltpu.VMEM,
    )
    h_spec = pl.BlockSpec(
        (1, tt, tn, F),
        lambda q, nb: ((q // TBq) % P, q % TBq, nb, 0),
        memory_space=pltpu.VMEM,
    )
    sel_spec = pl.BlockSpec(
        (1, tt, 1), lambda q, nb: ((q // TBq) % P, q % TBq, 0),
        memory_space=pltpu.VMEM,
    )
    g_spec = pl.BlockSpec(
        (1, tt, F), lambda q, nb: (q // TBq, q % TBq, 0),
        memory_space=pltpu.VMEM,
    )
    bytes_h = Hre.size * Hre.dtype.itemsize * 2
    return pl.pallas_call(
        _fwd_sel_kernel,
        grid=grid,
        in_specs=[r2_spec, r2_spec, h_spec, h_spec, sel_spec],
        out_specs=(g_spec, g_spec),
        out_shape=(
            jax.ShapeDtypeStruct((PB, T, F), jnp.float32),
            jax.ShapeDtypeStruct((PB, T, F), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=12 * PB * T * N * F,
            bytes_accessed=bytes_h * (PB // P) + rre2.size * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(rre2, rim2, Hre, Him, sel)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _t_sel_pallas(gre_b, gim_b, Hre, Him, sel, interpret=False):
    P, T, N, F = Hre.shape
    PB = gre_b.shape[0]
    tt, tn = _tiles(T, N, F)
    NBq = N // tn
    grid = (PB * NBq, T // tt)  # t innermost: accumulation axis
    g_spec = pl.BlockSpec(
        (1, tt, F), lambda q, tb: (q // NBq, tb, 0),
        memory_space=pltpu.VMEM,
    )
    h_spec = pl.BlockSpec(
        (1, tt, tn, F),
        lambda q, tb: ((q // NBq) % P, tb, q % NBq, 0),
        memory_space=pltpu.VMEM,
    )
    sel_spec = pl.BlockSpec(
        (1, tt, 1), lambda q, tb: ((q // NBq) % P, tb, 0),
        memory_space=pltpu.VMEM,
    )
    r2_spec = pl.BlockSpec(
        (1, 2, tn, F), lambda q, tb: (q // NBq, 0, q % NBq, 0),
        memory_space=pltpu.VMEM,
    )
    bytes_h = Hre.size * Hre.dtype.itemsize * 2
    return pl.pallas_call(
        _t_sel_kernel,
        grid=grid,
        in_specs=[g_spec, g_spec, h_spec, h_spec, sel_spec],
        out_specs=(r2_spec, r2_spec),
        out_shape=(
            jax.ShapeDtypeStruct((PB, 2, N, F), jnp.float32),
            jax.ShapeDtypeStruct((PB, 2, N, F), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=16 * PB * T * N * F,
            bytes_accessed=bytes_h * (PB // P) + gre_b.size * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(gre_b, gim_b, Hre, Him, sel)


# ---------------------------------------------------------------------------
# Branch-grouped select-free kernels (fft_grouped mode)
# ---------------------------------------------------------------------------


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
    PB, TB = rre_s.shape[:2]
    tt = Tp // TB
    tn = _grp_tn(N, tt, F)
    grid = (PB * TB, N // tn)  # n innermost: accumulation axis
    r_spec = pl.BlockSpec(
        (1, 1, tn, F), lambda q, nb: (q // TB, q % TB, nb, 0),
        memory_space=pltpu.VMEM,
    )
    h_spec = pl.BlockSpec(
        (1, tt, tn, F), lambda q, nb: ((q // TB) % P, q % TB, nb, 0),
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
            jax.ShapeDtypeStruct((PB, Tp, F), jnp.float32),
            jax.ShapeDtypeStruct((PB, Tp, F), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * PB * Tp * N * F,
            bytes_accessed=bytes_h * (PB // P) + rre_s.size * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(rre_s, rim_s, Hre, Him)


@functools.partial(jax.jit, static_argnames=("TB", "interpret"))
def _t_grp_pallas(gre_b, gim_b, Hre, Him, TB, interpret=False):
    P, Tp, N, F = Hre.shape
    PB = gre_b.shape[0]
    tt = Tp // TB
    tn = _grp_tn(N, tt, F)
    grid = (PB * TB, N // tn)
    g_spec = pl.BlockSpec(
        (1, tt, F), lambda q, nb: (q // TB, q % TB, 0),
        memory_space=pltpu.VMEM,
    )
    h_spec = pl.BlockSpec(
        (1, tt, tn, F), lambda q, nb: ((q // TB) % P, q % TB, nb, 0),
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
            jax.ShapeDtypeStruct((PB, TB, N, F), jnp.float32),
            jax.ShapeDtypeStruct((PB, TB, N, F), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * PB * Tp * N * F,
            bytes_accessed=bytes_h * (PB // P) + gre_b.size * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(gre_b, gim_b, Hre, Him)


# ---------------------------------------------------------------------------
# Public entry points: custom_vmap wrappers (batch folds into the node axis)
# ---------------------------------------------------------------------------


def _fold_batch(arrs, B):
    return [a.reshape((B * a.shape[1],) + a.shape[2:]) for a in arrs]


def _unfold_batch(arrs, B):
    return tuple(a.reshape((B, a.shape[0] // B) + a.shape[1:]) for a in arrs)


def _check_tables_unbatched(in_batched, n_lin: int, name: str):
    if not all(in_batched[:n_lin]) or any(in_batched[n_lin:]):
        raise NotImplementedError(
            f"{name}: vmap expects the spectra batched and the geometry "
            f"tables unbatched (got in_batched={in_batched})"
        )


@custom_batching.custom_vmap
def filter_sum_sel(rre2, rim2, Hre, Him, sel):
    """Branch-merged filter-sum: per angle t, contract the sel-selected
    spectrum plane (0 = image rows, 1 = transposed image rows) with the
    merged phase table:

        g[p,t,f] = sum_n r[p, sel[p,t], n, f] * H[p,t,n,f]

    rre2/rim2: [P, 2, N, F]; sel: [P, T, 1] float in {0, 1}. Output
    [P, T, F] f32 pair. Adjoint: :func:`filter_sum_sel_t`."""
    return _fwd_sel_pallas(rre2, rim2, Hre, Him, sel, interpret=_interp())


@filter_sum_sel.def_vmap
def _filter_sum_sel_vmap(axis_size, in_batched, rre2, rim2, Hre, Him, sel):
    _check_tables_unbatched(in_batched, 2, "filter_sum_sel")
    rre2f, rim2f = _fold_batch([rre2, rim2], axis_size)
    out = _fwd_sel_pallas(rre2f, rim2f, Hre, Him, sel, interpret=_interp())
    return _unfold_batch(out, axis_size), (True, True)


@custom_batching.custom_vmap
def filter_sum_sel_t(gre_b, gim_b, Hre, Him, sel):
    """Exact transpose of :func:`filter_sum_sel` w.r.t. (rre2, rim2):
    contract cotangents over angles with conj(H), routing each angle's
    contribution to its selected spectrum plane. Output [P, 2, N, F]."""
    return _t_sel_pallas(gre_b, gim_b, Hre, Him, sel, interpret=_interp())


@filter_sum_sel_t.def_vmap
def _filter_sum_sel_t_vmap(axis_size, in_batched, gre_b, gim_b, Hre, Him, sel):
    _check_tables_unbatched(in_batched, 2, "filter_sum_sel_t")
    gre_f, gim_f = _fold_batch([gre_b, gim_b], axis_size)
    out = _t_sel_pallas(gre_f, gim_f, Hre, Him, sel, interpret=_interp())
    return _unfold_batch(out, axis_size), (True, True)


@custom_batching.custom_vmap
def filter_sum_grouped(rre_s, rim_s, Hre_g, Him_g):
    """Branch-grouped select-free filter-sum:

        g[p, t, f] = sum_n r_s[p, blk(t), n, f] * H[p, t, n, f]

    Hre_g/Him_g [P, Tp, N, F]: merged phase tables with rows permuted into
    branch-grouped slot order (``filter_mxu.plan_branch_groups``) so every
    tt-angle block contracts a single spectrum plane; rre_s/rim_s
    [P, TB, N, F]: that block's selected spectrum (the one-hot gather done
    outside). No in-kernel select — the forward is the plain 8-op complex
    FMA at half the select kernel's arithmetic. Output [P, Tp, F] f32 pair
    in slot order. Adjoint: :func:`filter_sum_grouped_t`."""
    return _fwd_grp_pallas(rre_s, rim_s, Hre_g, Him_g, interpret=_interp())


@filter_sum_grouped.def_vmap
def _filter_sum_grouped_vmap(axis_size, in_batched, rre_s, rim_s, Hre, Him):
    _check_tables_unbatched(in_batched, 2, "filter_sum_grouped")
    rre_f, rim_f = _fold_batch([rre_s, rim_s], axis_size)
    out = _fwd_grp_pallas(rre_f, rim_f, Hre, Him, interpret=_interp())
    return _unfold_batch(out, axis_size), (True, True)


@custom_batching.custom_vmap
def filter_sum_grouped_t(gre_b, gim_b, Hre_g, Him_g, blkmark):
    """Exact transpose of :func:`filter_sum_grouped` w.r.t. (rre_s, rim_s):
    a pure map (each slot block owns its output block). ``blkmark`` is any
    array whose second dim is TB (the plan's ``onehot`` table) — it only
    carries the block split. Output [P, TB, N, F] pair."""
    return _t_grp_pallas(
        gre_b, gim_b, Hre_g, Him_g, TB=blkmark.shape[1], interpret=_interp()
    )


@filter_sum_grouped_t.def_vmap
def _filter_sum_grouped_t_vmap(
    axis_size, in_batched, gre_b, gim_b, Hre, Him, blkmark
):
    _check_tables_unbatched(in_batched, 2, "filter_sum_grouped_t")
    gre_f, gim_f = _fold_batch([gre_b, gim_b], axis_size)
    out = _t_grp_pallas(
        gre_f, gim_f, Hre, Him, TB=blkmark.shape[1], interpret=_interp()
    )
    return _unfold_batch(out, axis_size), (True, True)


# ---------------------------------------------------------------------------
# Plain-jnp references (tests; also the transpose oracles)
# ---------------------------------------------------------------------------


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


def filter_sum_reference(rre, rim, Hre, Him):
    """Plain-jnp split-table filter-sum (f32 accumulation), kept as the
    stage-bench oracle (``scripts/bench_fft_stages.py``)."""
    ein = functools.partial(
        jnp.einsum, "pnf,ptnf->ptf", preferred_element_type=jnp.float32
    )
    g_re = ein(rre, Hre) - ein(rim, Him)
    g_im = ein(rre, Him) + ein(rim, Hre)
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
