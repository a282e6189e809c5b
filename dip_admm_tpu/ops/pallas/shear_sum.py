"""MXU-cast filter-sum: the shear contraction as real matmuls + phase FMA.

The grouped filter-sum kernel (``filter_sum.py``) contracts the rfft'd image
rows with a dense per-(angle, row, frequency) phase table

    g[t, f] = sum_n r[n, f] * H[t, n, f],
    H[t, n, f] = (1-fr) W^{f k(t,n)} + fr W^{f (k(t,n)+1)},  W = e^{2pi i/Np}

whose [P, T, N, F] read + upcast + complex FMA binds the kernel on the VPU.
This module exploits the affine shear structure: within a 128-row block,
k(t, n) = floor(B_t n + C_t) spans at most nb+1 consecutive integers, so

    k(t, n) = k0(t, blk) + delta(t, n),   delta in [0, nb]

and the table factors EXACTLY (no approximation) into

    H[t, n, f] = E[t, blk, f] * sum_d Phi[d, f] * Wt[t, blk, d, n]

with a tiny shared DFT-twiddle table Phi[d, f] = W^{f d}, a per-(angle,
block) phase E = W^{f k0}, and REAL tap weights Wt (the (1-fr, fr) pair
scattered at rows delta, delta+1). The row contraction

    S[t, d, f] = sum_n Wt[t, d, n] r[n, f]

is then a true [tt*D2, nb] x [nb, F] matmul per (angle-block, row-block) —
it runs on the MXU in the tables' storage dtype — and only the phase
combine sum_d Phi * S (pure f32 FMA, no upcasts) remains on the VPU. Table
HBM traffic drops ~11x (Wt [Tp, NB, D2, nb] bf16 + small phases vs the
[Tp, N, F] complex pair).

Entry points mirror ``filter_sum_grouped``/``_t`` (same slot-ordered
spectra in/out, custom_vmap batch folding into the node axis); the exact
transpose is again hand-written, not autodiff.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import custom_batching
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interp() -> bool:
    return jax.default_backend() != "tpu"


def _f_chunks(F: int, fb: int = 256):
    """Static lane-aligned frequency chunks (the [tt*D2, F] matmul temp is
    the kernel's VMEM hog — chunking f bounds it at [tt*D2, fb], which is
    what lets the plan use tt=32 angle blocks and so 4x fewer slot-spectrum
    blocks than tt=8)."""
    cuts = list(range(0, F, fb)) + [F]
    return [(a, b - a) for a, b in zip(cuts[:-1], cuts[1:])]


def _fwd_kernel(rre_ref, rim_ref, wt_ref, sere_ref, seim_ref,
                phire_ref, phiim_ref, gre_ref, gim_ref):
    b = pl.program_id(1)
    # bf16 tap tables run the MXU dot natively (bf16 x bf16 -> f32
    # accumulate, 4x the f32 matmul rate); the spectra are quantized to the
    # table precision only inside the dot. f32 tables stay fully f32.
    W = wt_ref[0, 0]  # [tt, D2, nb]
    tt, D2, nb = W.shape
    lowp = W.dtype == jnp.bfloat16
    if not lowp:
        W = W.astype(jnp.float32)
    W2 = W.reshape(tt * D2, nb)
    F = gre_ref.shape[-1]

    @pl.when(b == 0)
    def _():
        gre_ref[0] = jnp.zeros_like(gre_ref[0])
        gim_ref[0] = jnp.zeros_like(gim_ref[0])

    for f0, fw in _f_chunks(F):
        rre = rre_ref[0, 0, :, f0:f0 + fw]  # [nb, fw] f32
        rim = rim_ref[0, 0, :, f0:f0 + fw]
        if lowp:
            rre = rre.astype(jnp.bfloat16)
            rim = rim.astype(jnp.bfloat16)
        Sre = jnp.dot(W2, rre, preferred_element_type=jnp.float32)
        Sim = jnp.dot(W2, rim, preferred_element_type=jnp.float32)
        Sre = Sre.reshape(tt, D2, fw)
        Sim = Sim.reshape(tt, D2, fw)
        phre = phire_ref[:, f0:f0 + fw][None]  # [1, D2, fw]
        phim = phiim_ref[:, f0:f0 + fw][None]
        Tre = jnp.sum(Sre * phre - Sim * phim, axis=1)  # [tt, fw]
        Tim = jnp.sum(Sre * phim + Sim * phre, axis=1)
        ere = sere_ref[0, 0, :, f0:f0 + fw]  # [tt, fw]
        eim = seim_ref[0, 0, :, f0:f0 + fw]
        gre_ref[0, :, f0:f0 + fw] += Tre * ere - Tim * eim
        gim_ref[0, :, f0:f0 + fw] += Tre * eim + Tim * ere


def _t_kernel(gre_ref, gim_ref, wt_ref, sere_ref, seim_ref,
              phire_ref, phiim_ref, rre_ref, rim_ref):
    # Pure map: each (angle-block, row-block) owns its r-cotangent block.
    W = wt_ref[0, 0]  # [tt, D2, nb]
    tt, D2, nb = W.shape
    lowp = W.dtype == jnp.bfloat16
    if not lowp:
        W = W.astype(jnp.float32)
    W2t = W.reshape(tt * D2, nb).T  # [nb, tt*D2]
    F = gre_ref.shape[-1]
    for f0, fw in _f_chunks(F):
        gre = gre_ref[0, :, f0:f0 + fw]  # [tt, fw]
        gim = gim_ref[0, :, f0:f0 + fw]
        ere = sere_ref[0, 0, :, f0:f0 + fw]
        eim = seim_ref[0, 0, :, f0:f0 + fw]
        Tre = gre * ere + gim * eim  # conj(E) * g_bar
        Tim = gim * ere - gre * eim
        phre = phire_ref[:, f0:f0 + fw][None]
        phim = phiim_ref[:, f0:f0 + fw][None]
        Sre = Tre[:, None] * phre + Tim[:, None] * phim  # conj(Phi)
        Sim = Tim[:, None] * phre - Tre[:, None] * phim  # [tt, D2, fw]
        Sre = Sre.reshape(tt * D2, fw)
        Sim = Sim.reshape(tt * D2, fw)
        if lowp:
            Sre = Sre.astype(jnp.bfloat16)
            Sim = Sim.astype(jnp.bfloat16)
        rre_ref[0, 0, :, f0:f0 + fw] = jnp.dot(
            W2t, Sre, preferred_element_type=jnp.float32
        )
        rim_ref[0, 0, :, f0:f0 + fw] = jnp.dot(
            W2t, Sim, preferred_element_type=jnp.float32
        )


def _specs(P, TB, tt, D2, nb, F):
    """Block specs shared by both kernels. Wt is stored [P, NB, Tp, D2, nb]
    and the phase table [P, NB, Tp, F] so every block's trailing two dims
    are TPU-tile aligned ((D2, nb) / (tt, F))."""
    r_spec = pl.BlockSpec(
        (1, 1, nb, F), lambda q, b: (q // TB, q % TB, b, 0),
        memory_space=pltpu.VMEM,
    )
    wt_spec = pl.BlockSpec(
        (1, 1, tt, D2, nb),
        lambda q, b: ((q // TB) % P, b, q % TB, 0, 0),
        memory_space=pltpu.VMEM,
    )
    se_spec = pl.BlockSpec(
        (1, 1, tt, F), lambda q, b: ((q // TB) % P, b, q % TB, 0),
        memory_space=pltpu.VMEM,
    )
    phi_spec = pl.BlockSpec(
        (D2, F), lambda q, b: (0, 0), memory_space=pltpu.VMEM
    )
    g_spec = pl.BlockSpec(
        (1, tt, F), lambda q, b: (q // TB, q % TB, 0),
        memory_space=pltpu.VMEM,
    )
    return r_spec, wt_spec, se_spec, phi_spec, g_spec


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fwd_pallas(rre_s, rim_s, Wt, SEre, SEim, Phire, Phiim, interpret=False):
    P, NB, Tp, D2, nb = Wt.shape
    PB, TB, N, F = rre_s.shape
    tt = Tp // TB
    grid = (PB * TB, NB)  # row blocks innermost: accumulation axis
    r_spec, wt_spec, se_spec, phi_spec, g_spec = _specs(P, TB, tt, D2, nb, F)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[r_spec, r_spec, wt_spec, se_spec, se_spec, phi_spec,
                  phi_spec],
        out_specs=(g_spec, g_spec),
        out_shape=(
            jax.ShapeDtypeStruct((PB, Tp, F), jnp.float32),
            jax.ShapeDtypeStruct((PB, Tp, F), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * PB * Tp * D2 * nb * NB * F
            + 12 * PB * Tp * NB * D2 * F,
            bytes_accessed=Wt.size * Wt.dtype.itemsize * (PB // P)
            + rre_s.size * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(rre_s, rim_s, Wt, SEre, SEim, Phire, Phiim)


@functools.partial(jax.jit, static_argnames=("TB", "interpret"))
def _t_pallas(gre_b, gim_b, Wt, SEre, SEim, Phire, Phiim, TB,
              interpret=False):
    P, NB, Tp, D2, nb = Wt.shape
    PB = gre_b.shape[0]
    F = gre_b.shape[-1]
    tt = Tp // TB
    grid = (PB * TB, NB)  # pure map: every cell owns its output block
    r_spec, wt_spec, se_spec, phi_spec, g_spec = _specs(P, TB, tt, D2, nb, F)
    return pl.pallas_call(
        _t_kernel,
        grid=grid,
        in_specs=[g_spec, g_spec, wt_spec, se_spec, se_spec, phi_spec,
                  phi_spec],
        out_specs=(r_spec, r_spec),
        out_shape=(
            jax.ShapeDtypeStruct((PB, TB, NB * nb, F), jnp.float32),
            jax.ShapeDtypeStruct((PB, TB, NB * nb, F), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * PB * Tp * D2 * nb * NB * F
            + 12 * PB * Tp * NB * D2 * F,
            bytes_accessed=Wt.size * Wt.dtype.itemsize * (PB // P)
            + gre_b.size * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(gre_b, gim_b, Wt, SEre, SEim, Phire, Phiim)


def _fold_batch(arrs, B):
    return [a.reshape((B * a.shape[1],) + a.shape[2:]) for a in arrs]


def _unfold_batch(arrs, B):
    return tuple(a.reshape((B, a.shape[0] // B) + a.shape[1:]) for a in arrs)


def _check_unbatched(in_batched, n_lin, name):
    if not all(in_batched[:n_lin]) or any(in_batched[n_lin:]):
        raise NotImplementedError(
            f"{name}: vmap expects the spectra batched and the geometry "
            f"tables unbatched (got in_batched={in_batched})"
        )


@custom_batching.custom_vmap
def shear_sum(rre_s, rim_s, Wt, SEre, SEim, Phire, Phiim):
    """MXU shear filter-sum: identical output contract to
    :func:`filter_sum.filter_sum_grouped` (slot-ordered [P, Tp, F] f32
    spectrum pair) from the factored tables (see module docstring)."""
    return _fwd_pallas(
        rre_s, rim_s, Wt, SEre, SEim, Phire, Phiim, interpret=_interp()
    )


@shear_sum.def_vmap
def _shear_sum_vmap(axis_size, in_batched, rre_s, rim_s, *tabs):
    _check_unbatched(in_batched, 2, "shear_sum")
    rre_f, rim_f = _fold_batch([rre_s, rim_s], axis_size)
    out = _fwd_pallas(rre_f, rim_f, *tabs, interpret=_interp())
    return _unfold_batch(out, axis_size), (True, True)


@custom_batching.custom_vmap
def shear_sum_t(gre_b, gim_b, Wt, SEre, SEim, Phire, Phiim, blkmark):
    """Exact transpose of :func:`shear_sum` w.r.t. the spectra (a pure map
    over (angle-block, row-block) cells). ``blkmark`` is any array whose
    second dim is TB (the plan's ``onehot`` table) — it only carries the
    angle-block split."""
    return _t_pallas(
        gre_b, gim_b, Wt, SEre, SEim, Phire, Phiim, TB=blkmark.shape[1],
        interpret=_interp(),
    )


@shear_sum_t.def_vmap
def _shear_sum_t_vmap(axis_size, in_batched, gre_b, gim_b, *tabs_blk):
    _check_unbatched(in_batched, 2, "shear_sum_t")
    gre_f, gim_f = _fold_batch([gre_b, gim_b], axis_size)
    tabs, blkmark = tabs_blk[:-1], tabs_blk[-1]
    out = _t_pallas(
        gre_f, gim_f, *tabs, TB=blkmark.shape[1], interpret=_interp()
    )
    return _unfold_batch(out, axis_size), (True, True)


def shear_sum_reference(rre_s, rim_s, Wt, SEre, SEim, Phire, Phiim):
    """Plain-jnp reference of the factored contraction (tests)."""
    P, NB, Tp, D2, nb = Wt.shape
    TB = rre_s.shape[1]
    tt = Tp // TB
    W32 = Wt.astype(jnp.float32)
    r_re = rre_s.reshape(P, TB, NB, nb, -1)
    r_im = rim_s.reshape(P, TB, NB, nb, -1)
    # S[p, b, t, d, f] = sum_j Wt[p, b, t, d, j] r[p, blk(t), b, j, f]
    Wb = W32.reshape(P, NB, TB, tt, D2, nb)
    Sre = jnp.einsum("pbktdj,pkbjf->pbktdf", Wb, r_re)
    Sim = jnp.einsum("pbktdj,pkbjf->pbktdf", Wb, r_im)
    Tre = jnp.einsum("pbktdf,df->pbktf", Sre, Phire) - jnp.einsum(
        "pbktdf,df->pbktf", Sim, Phiim
    )
    Tim = jnp.einsum("pbktdf,df->pbktf", Sre, Phiim) + jnp.einsum(
        "pbktdf,df->pbktf", Sim, Phire
    )
    E_re = SEre.reshape(P, NB, TB, tt, -1)
    E_im = SEim.reshape(P, NB, TB, tt, -1)
    g_re = jnp.sum(Tre * E_re - Tim * E_im, axis=1)  # sum over row blocks
    g_im = jnp.sum(Tre * E_im + Tim * E_re, axis=1)
    return (
        g_re.reshape(P, Tp, -1),
        g_im.reshape(P, Tp, -1),
    )


# ---------------------------------------------------------------------------
# Factored hat-evaluation tail (the irfft + 2-tap detector evaluation +
# branch scale as MXU matmuls). The evaluation coordinate p(t, d) is affine
# in the detector index d, so within a db-detector block
#
#     p(t, d) = k0'(t, blk) + delta'(t, d) + fr',   delta' in [0, D2'-2]
#
# and (exactly, via sum_v hat(p - v) e^{i w_f v} = (1-fr) W^{f kp} +
# fr W^{f (kp+1)} and the irfft coefficient c_f/Np folded into the base
# phase E') the whole tail becomes
#
#     out[t, d] = sum_dd Wd[t, dd, d] * [ A(t) @ PhiD_re - B(t) @ PhiD_im ]
#     A = g_re*E're - g_im*E'im,   B = g_re*E'im + g_im*E're
#
# — two [tt, F] x [F, D2'] MXU matmuls per (angle, detector) block plus a
# small broadcast-MAC, replacing the [P, T, D, Np] hat-weight einsum (256^2)
# / the VPU hat_eval kernel (512^2) that dominated the projector at 512^2
# (measured 7.6 ms fwd / 15.5 ms adjoint of a ~32 ms apply pair).
# ---------------------------------------------------------------------------


def _eval_r_kernel(gre_ref, gim_ref, ere_ref, eim_ref, phre_ref, phim_ref,
                   r_ref):
    """Phase combine + PhiD contraction of the eval tail. The per-angle Wd
    epilogue deliberately does NOT live in this kernel: R [P, DB, Tp, D2p]
    is tiny (~1.6 MB at 512^2), so it goes to HBM and the epilogue runs as
    one XLA batched einsum outside — measured 18% faster than the in-kernel
    VPU broadcast-multiply-reduce (which paid a full Wd upcast per cell;
    an in-kernel MXU cast is impossible: Mosaic tpu.dot has no batch dims,
    and a block-diagonal-R restructure costs tt x the FLOPs).
    The detector-block axis is FOLDED into the cell (r5, VERDICT r4 #7):
    this stage is latency-bound (<2% MXU), so DB-fewer grid cells and a
    single g read per angle block beat the finer grid."""
    gre = gre_ref[0]  # [tt, F] f32 (slot order)
    gim = gim_ref[0]
    DB, tt, F = ere_ref.shape[1:]
    lowp = phre_ref.dtype == jnp.bfloat16
    dn = (((1,), (1,)), ((), ()))  # contract f
    # One [DB*tt, F] x [F, D2p] dot pair per cell instead of DB [tt, F]
    # dots: tt=32 rows quarter-fill the 128-row MXU; stacking the
    # detector blocks' phase products fills it.
    ere = ere_ref[0].reshape(DB * tt, F)
    eim = eim_ref[0].reshape(DB * tt, F)
    gre_t = jnp.concatenate([gre] * DB, axis=0)  # [DB*tt, F]
    gim_t = jnp.concatenate([gim] * DB, axis=0)
    A = gre_t * ere - gim_t * eim
    B = gre_t * eim + gim_t * ere
    if lowp:
        A = A.astype(jnp.bfloat16)
        B = B.astype(jnp.bfloat16)
    R = jax.lax.dot_general(
        A, phre_ref[...], dn, preferred_element_type=jnp.float32
    ) - jax.lax.dot_general(
        B, phim_ref[...], dn, preferred_element_type=jnp.float32
    )  # [DB*tt, D2p]
    r_ref[0] = R.reshape(DB, tt, -1)


def _eval_t_kernel(rbar_ref, ere_ref, eim_ref, phre_ref, phim_ref,
                   gre_ref, gim_ref):
    """Transpose of the eval tail from the PRE-contracted cotangent
    R_bar = sum_d Wd * ob (an XLA einsum outside — the round-4 in-kernel
    Wd matvec cannot fold the detector blocks into the cell without
    blowing VMEM at D2p ~ 192, and the r5 folded grid + one batched
    [DB*tt, D2p] x [D2p, F] MXU dot pair beats the fine grid's DB small
    M=tt dots). Each output block is written exactly once; the per-b
    phase accumulate runs in registers."""
    DB, tt = ere_ref.shape[1:3]
    lowp = phre_ref.dtype == jnp.bfloat16
    R = rbar_ref[0].reshape(DB * tt, -1)  # [DB*tt, D2p] f32
    if lowp:
        R = R.astype(jnp.bfloat16)
    A_bar = jnp.dot(R, phre_ref[...], preferred_element_type=jnp.float32)
    B_bar = -jnp.dot(R, phim_ref[...], preferred_element_type=jnp.float32)
    acc_re = jnp.zeros_like(gre_ref[0])  # [tt, F]
    acc_im = jnp.zeros_like(acc_re)
    for b in range(DB):
        Ab = A_bar[b * tt:(b + 1) * tt]
        Bb = B_bar[b * tt:(b + 1) * tt]
        ere = ere_ref[0, b]
        eim = eim_ref[0, b]
        acc_re += Ab * ere + Bb * eim
        acc_im += -Ab * eim + Bb * ere
    gre_ref[0] = acc_re
    gim_ref[0] = acc_im


def _eval_specs(P, TB, tt, DB, D2p, F):
    g_spec = pl.BlockSpec(
        (1, tt, F), lambda q: (q // TB, q % TB, 0),
        memory_space=pltpu.VMEM,
    )
    e_spec = pl.BlockSpec(
        (1, DB, tt, F), lambda q: ((q // TB) % P, 0, q % TB, 0),
        memory_space=pltpu.VMEM,
    )
    phi_spec = pl.BlockSpec(
        (D2p, F), lambda q: (0, 0), memory_space=pltpu.VMEM
    )
    r_spec = pl.BlockSpec(
        (1, DB, tt, D2p), lambda q: (q // TB, 0, q % TB, 0),
        memory_space=pltpu.VMEM,
    )
    return g_spec, e_spec, phi_spec, r_spec


def _eval_cost(PB, Tp, DB, D2p, db, F, Wd):
    return pl.CostEstimate(
        flops=4 * PB * Tp * DB * D2p * F,
        bytes_accessed=2 * PB * DB * Tp * F * 4
        + PB * DB * Tp * D2p * 4,
        transcendentals=0,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _eval_fwd_pallas(gre, gim, Wd, TEre, TEim, PhiDre, PhiDim,
                     interpret=False):
    P, DB, Tp, D2p, db = Wd.shape
    PB = gre.shape[0]
    F = gre.shape[-1]
    tt = _eval_tt(Tp)
    TB = Tp // tt
    g_spec, e_spec, phi_spec, r_spec = _eval_specs(P, TB, tt, DB, D2p, F)
    R = pl.pallas_call(
        _eval_r_kernel,
        grid=(PB * TB,),
        in_specs=[g_spec, g_spec, e_spec, e_spec, phi_spec, phi_spec],
        out_specs=r_spec,
        out_shape=jax.ShapeDtypeStruct((PB, DB, Tp, D2p), jnp.float32),
        cost_estimate=_eval_cost(PB, Tp, DB, D2p, db, F, Wd),
        interpret=interpret,
    )(gre, gim, TEre, TEim, PhiDre.astype(Wd.dtype), PhiDim.astype(Wd.dtype))
    # Scenario batching folds B into the node axis (PB = B * P): lift the
    # fold out so the per-node Wd broadcasts over it. R stays f32 and Wd is
    # upcast — matching the in-kernel variant's f32 x f32 epilogue exactly
    # (rounding R down to a bf16 table dtype here would move the bf16
    # rounding point relative to the unsplit kernel, ADVICE r4).
    Rb = R.reshape(PB // P, P, DB, Tp, D2p)
    out = jnp.einsum(
        "kpbtz,pbtzd->kpbtd", Rb, Wd.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return out.transpose(0, 1, 3, 2, 4).reshape(PB, Tp, DB * db)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _eval_t_pallas(ob, Wd, TEre, TEim, PhiDre, PhiDim, interpret=False):
    P, DB, Tp, D2p, db = Wd.shape
    PB = ob.shape[0]
    F = TEre.shape[-1]
    tt = _eval_tt(Tp)
    TB = Tp // tt
    g_spec, e_spec, phi_spec, r_spec = _eval_specs(P, TB, tt, DB, D2p, F)
    # XLA pre-contraction of the Wd matvec: R_bar [PB, DB, Tp, D2p] is
    # tiny, and keeping Wd out of the kernel is what lets the folded grid
    # fit VMEM (Wd's [DB, tt, D2p, db] block alone is ~6 MB at 512^2).
    # Scenario batching folds B into the node axis (PB = B * P).
    obb = ob.reshape(PB // P, P, Tp, DB, db)
    Rbar = jnp.einsum(
        "kptbd,pbtzd->kpbtz", obb, Wd.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).reshape(PB, DB, Tp, D2p)
    return pl.pallas_call(
        _eval_t_kernel,
        grid=(PB * TB,),  # detector blocks folded into the cell (r5)
        in_specs=[r_spec, e_spec, e_spec, phi_spec, phi_spec],
        out_specs=(g_spec, g_spec),
        out_shape=(
            jax.ShapeDtypeStruct((PB, Tp, F), jnp.float32),
            jax.ShapeDtypeStruct((PB, Tp, F), jnp.float32),
        ),
        cost_estimate=_eval_cost(PB, Tp, DB, D2p, db, F, Wd),
        interpret=interpret,
    )(Rbar, TEre, TEim, PhiDre.astype(Wd.dtype), PhiDim.astype(Wd.dtype))


def _eval_tt(Tp: int) -> int:
    """Angle block for the eval-tail kernels (the [tt, F] x [F, D2\'] dots
    have no big temp, so tt just needs to divide Tp and align sublanes)."""
    for cand in (32, 16, 8):
        if Tp % cand == 0:
            return cand
    return Tp


@custom_batching.custom_vmap
def eval_shear(gre, gim, Wd, TEre, TEim, PhiDre, PhiDim):
    """Factored hat-evaluation tail: slot-order spectra [P, Tp, F] pair ->
    slot-order sinograms [P, Tp, D] (branch scale and row masks folded into
    Wd). Exact same math as ``radon_fft._eval_tail`` on the irfft+hat path.
    Split structure: Pallas kernel to R, XLA einsum epilogue (18% faster
    than the fully-in-kernel variant at 512^2, bit-identical).
    """
    return _eval_fwd_pallas(
        gre, gim, Wd, TEre, TEim, PhiDre, PhiDim, interpret=_interp()
    )


@eval_shear.def_vmap
def _eval_shear_vmap(axis_size, in_batched, gre, gim, *tabs):
    _check_unbatched(in_batched, 2, "eval_shear")
    gre_f, gim_f = _fold_batch([gre, gim], axis_size)
    out = _eval_fwd_pallas(gre_f, gim_f, *tabs, interpret=_interp())
    return out.reshape((axis_size, out.shape[0] // axis_size) + out.shape[1:]), True


@custom_batching.custom_vmap
def eval_shear_t(ob, Wd, TEre, TEim, PhiDre, PhiDim):
    """Exact transpose of :func:`eval_shear`."""
    return _eval_t_pallas(
        ob, Wd, TEre, TEim, PhiDre, PhiDim, interpret=_interp()
    )


@eval_shear_t.def_vmap
def _eval_shear_t_vmap(axis_size, in_batched, ob, *tabs):
    _check_unbatched(in_batched, 1, "eval_shear_t")
    obf = ob.reshape((axis_size * ob.shape[1],) + ob.shape[2:])
    out = _eval_t_pallas(obf, *tabs, interpret=_interp())
    return _unfold_batch(out, axis_size), (True, True)


# ---------------------------------------------------------------------------
# Scalar-prefetch plane selection: the slot-ordered spectra rre_s/rim_s were
# materialized [P, TB, N, F] by a one-hot gather einsum purely to route each
# angle block to its spectrum plane (~0.5 ms/apply at 256^2, ~1.2 at 512^2,
# each direction). With the per-block plane index prefetched to SMEM, the
# forward kernel reads its [nb, F] spectrum block straight out of the
# two-plane tensor [P, 2, N, F], and the transpose ACCUMULATES its
# cotangent blocks directly into the planes (the branch-grouped slot order
# makes the plane sequence monotone per node, so output-block revisits are
# consecutive; pure-slack blocks carry zero taps and the per-plane
# ``pvisited`` mask zeroes planes no block wrote).
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fwd_pallas_planes(rre2, rim2, Wt, SEre, SEim, Phire, Phiim, plane,
                       interpret=False):
    P, NB, Tp, D2, nb = Wt.shape
    PB = rre2.shape[0]
    F = rre2.shape[-1]
    TB = plane.shape[1]
    tt = Tp // TB
    grid = (PB * TB, NB)
    r_spec = pl.BlockSpec(
        (1, 1, nb, F),
        lambda q, b, pr: (q // TB, pr[(q // TB) % P, q % TB], b, 0),
        memory_space=pltpu.VMEM,
    )
    wt_spec = pl.BlockSpec(
        (1, 1, tt, D2, nb),
        lambda q, b, pr: ((q // TB) % P, b, q % TB, 0, 0),
        memory_space=pltpu.VMEM,
    )
    se_spec = pl.BlockSpec(
        (1, 1, tt, F), lambda q, b, pr: ((q // TB) % P, b, q % TB, 0),
        memory_space=pltpu.VMEM,
    )
    phi_spec = pl.BlockSpec(
        (D2, F), lambda q, b, pr: (0, 0), memory_space=pltpu.VMEM
    )
    g_spec = pl.BlockSpec(
        (1, tt, F), lambda q, b, pr: (q // TB, q % TB, 0),
        memory_space=pltpu.VMEM,
    )

    def kern(plane_ref, rre_ref, rim_ref, wt_ref, sere_ref, seim_ref,
             phire_ref, phiim_ref, gre_ref, gim_ref):
        _fwd_kernel(rre_ref, rim_ref, wt_ref, sere_ref, seim_ref,
                    phire_ref, phiim_ref, gre_ref, gim_ref)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[r_spec, r_spec, wt_spec, se_spec, se_spec, phi_spec,
                  phi_spec],
        out_specs=(g_spec, g_spec),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((PB, Tp, F), jnp.float32),
            jax.ShapeDtypeStruct((PB, Tp, F), jnp.float32),
        ),
        interpret=interpret,
    )(plane, rre2, rim2, Wt, SEre, SEim, Phire, Phiim)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _t_pallas_planes(gre_b, gim_b, Wt, SEre, SEim, Phire, Phiim, plane,
                     pfirst, interpret=False):
    P, NB, Tp, D2, nb = Wt.shape
    PB = gre_b.shape[0]
    F = gre_b.shape[-1]
    TB = plane.shape[1]
    tt = Tp // TB
    N = NB * nb
    grid = (PB * NB, TB)  # tb innermost: consecutive same-plane revisits
    g_spec = pl.BlockSpec(
        (1, tt, F), lambda q, tb, pr, fr: (q // NB, tb, 0),
        memory_space=pltpu.VMEM,
    )
    wt_spec = pl.BlockSpec(
        (1, 1, tt, D2, nb),
        lambda q, tb, pr, fr: ((q // NB) % P, q % NB, tb, 0, 0),
        memory_space=pltpu.VMEM,
    )
    se_spec = pl.BlockSpec(
        (1, 1, tt, F), lambda q, tb, pr, fr: ((q // NB) % P, q % NB, tb, 0),
        memory_space=pltpu.VMEM,
    )
    phi_spec = pl.BlockSpec(
        (D2, F), lambda q, tb, pr, fr: (0, 0), memory_space=pltpu.VMEM
    )
    r2_spec = pl.BlockSpec(
        (1, 1, nb, F),
        lambda q, tb, pr, fr: (q // NB, pr[(q // NB) % P, tb], q % NB, 0),
        memory_space=pltpu.VMEM,
    )

    def kern(plane_ref, first_ref, gre_ref, gim_ref, wt_ref, sere_ref,
             seim_ref, phire_ref, phiim_ref, rre2_ref, rim2_ref):
        q = pl.program_id(0)
        tb = pl.program_id(1)
        p = (q // NB) % P
        W = wt_ref[0, 0]  # [tt, D2, nb]
        ttk, D2k, nbk = W.shape
        lowp = W.dtype == jnp.bfloat16
        if not lowp:
            W = W.astype(jnp.float32)
        W2t = W.reshape(ttk * D2k, nbk).T

        @pl.when(first_ref[p, tb] == 1)
        def _():
            rre2_ref[0, 0] = jnp.zeros_like(rre2_ref[0, 0])
            rim2_ref[0, 0] = jnp.zeros_like(rim2_ref[0, 0])

        for f0, fw in _f_chunks(F):
            gre = gre_ref[0, :, f0:f0 + fw]
            gim = gim_ref[0, :, f0:f0 + fw]
            ere = sere_ref[0, 0, :, f0:f0 + fw]
            eim = seim_ref[0, 0, :, f0:f0 + fw]
            Tre = gre * ere + gim * eim
            Tim = gim * ere - gre * eim
            phre = phire_ref[:, f0:f0 + fw][None]
            phim = phiim_ref[:, f0:f0 + fw][None]
            Sre = Tre[:, None] * phre + Tim[:, None] * phim
            Sim = Tim[:, None] * phre - Tre[:, None] * phim
            Sre = Sre.reshape(ttk * D2k, fw)
            Sim = Sim.reshape(ttk * D2k, fw)
            if lowp:
                Sre = Sre.astype(jnp.bfloat16)
                Sim = Sim.astype(jnp.bfloat16)
            rre2_ref[0, 0, :, f0:f0 + fw] += jnp.dot(
                W2t, Sre, preferred_element_type=jnp.float32
            )
            rim2_ref[0, 0, :, f0:f0 + fw] += jnp.dot(
                W2t, Sim, preferred_element_type=jnp.float32
            )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[g_spec, g_spec, wt_spec, se_spec, se_spec, phi_spec,
                  phi_spec],
        out_specs=(r2_spec, r2_spec),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((PB, 2, N, F), jnp.float32),
            jax.ShapeDtypeStruct((PB, 2, N, F), jnp.float32),
        ),
        interpret=interpret,
    )(plane, pfirst, gre_b, gim_b, Wt, SEre, SEim, Phire, Phiim)


@custom_batching.custom_vmap
def shear_sum_planes(rre2, rim2, Wt, SEre, SEim, Phire, Phiim, plane):
    """Plane-prefetch forward shear-sum: two-plane spectra [P, 2, N, F]
    pair -> slot-order [P, Tp, F] pair, no slot-spectrum materialization."""
    return _fwd_pallas_planes(
        rre2, rim2, Wt, SEre, SEim, Phire, Phiim, plane,
        interpret=_interp(),
    )


@shear_sum_planes.def_vmap
def _shear_sum_planes_vmap(axis_size, in_batched, rre2, rim2, *tabs):
    _check_unbatched(in_batched, 2, "shear_sum_planes")
    rre_f, rim_f = _fold_batch([rre2, rim2], axis_size)
    out = _fwd_pallas_planes(rre_f, rim_f, *tabs, interpret=_interp())
    return _unfold_batch(out, axis_size), (True, True)


@custom_batching.custom_vmap
def shear_sum_planes_t(gre_b, gim_b, Wt, SEre, SEim, Phire, Phiim, plane,
                       pfirst):
    """Exact transpose of :func:`shear_sum_planes`: accumulates straight
    into the two spectrum planes [P, 2, N, F] (apply the per-plane
    ``pvisited`` mask afterwards — planes no block wrote are undefined)."""
    return _t_pallas_planes(
        gre_b, gim_b, Wt, SEre, SEim, Phire, Phiim, plane, pfirst,
        interpret=_interp(),
    )


@shear_sum_planes_t.def_vmap
def _shear_sum_planes_t_vmap(axis_size, in_batched, gre_b, gim_b, *tabs):
    _check_unbatched(in_batched, 2, "shear_sum_planes_t")
    gre_f, gim_f = _fold_batch([gre_b, gim_b], axis_size)
    out = _t_pallas_planes(gre_f, gim_f, *tabs, interpret=_interp())
    return _unfold_batch(out, axis_size), (True, True)


# ---------------------------------------------------------------------------
# Spatial skew row stage (mode "fft_skew"): the same factored tap tables
# applied to RAW zero-padded image rows instead of row spectra. Per
# (angle-block, row-block)
#
#     MXU : sigma[t, d, u] = sum_n Wt[t, d, n] x[n, u]        (REAL, u < N)
#     VPU : z[t, v]        = sum_d sigma[t, d, v - (D2-1) + d]  (skew sum)
#     MXU : g[t, f]        = E[t, f] * sum_v z[t, v] D[v, f]   (DFT-back)
#
# with D[v, f] = W^{-f (v - (D2-1))} a small SHARED matrix (the (D2-1)
# offset keeps skew indices nonnegative and folds into D). Equivalent to
# the spectra formulation by substituting v = u - d + (D2-1) into
# g = E sum_{d,n,u} Phi_d Wt x W^{-fu} — exact, not an approximation. The
# win: the spatial matmul contracts N real columns instead of 2F complex
# ones (~3.2x fewer MACs at 512^2), the VPU phase combine (the measured
# ~1.9 TFLOP/s wall, NEXT.md #1) becomes pure shifted adds, and the row
# rfft/irfft stages disappear from the pipeline entirely (the kernel eats
# raw image rows and the transpose emits raw row cotangents). Measured
# A/B at the production 512^2/8 block shapes: 4.30 ms (phase combine)
# vs 3.39 ms (skew) per 192-block sweep; the stride-trick reshape variant
# does not lower (Mosaic "unsupported shape cast" — scripts/
# bench_skew_combine.py).
# ---------------------------------------------------------------------------


def _skew_dc(D2: int) -> int:
    """d-chunk bounding the [tt*DC, WS] sigma temp in VMEM (D2 is always a
    multiple of 16 by construction)."""
    return 16 if D2 % 16 == 0 else D2


def _skew_fwd_body(x_ref, wt_ref, sere_ref, seim_ref, dre_ref, dim_ref,
                   gre_ref, gim_ref, z_acc, *, accum_first):
    # d-MAJOR tap layout WtT [D2, tt, nb] (r5): with the old t-major [tt,
    # D2, nb] table the per-tap read sig.reshape(tt, DC, WS)[:, j, :]
    # sliced the SUBLANE axis of a (DC, WS)-tiled temp — a 1-of-8 masked
    # strided access per tap that serialized on the VPU between the MXU
    # dots (the measured skew-T wall, VERDICT r4 #1; DC sweeps moved
    # nothing because the masked-access count is D2 regardless). d-major
    # makes sig[j] a full [tt, WS] tile read and the W chunk a free
    # leading-dim slice.
    W = wt_ref[0, 0]  # [D2, tt, nb]
    D2, tt, nb = W.shape
    WS = x_ref.shape[-1]
    lowp = W.dtype == jnp.bfloat16
    x = x_ref[0, 0]  # [nb, WS]
    if lowp:
        x = x.astype(jnp.bfloat16)
    else:
        W = W.astype(jnp.float32)
        x = x.astype(jnp.float32)
    z_acc[...] = jnp.zeros_like(z_acc)
    DC = _skew_dc(D2)
    for d0 in range(0, D2, DC):
        Wc = W[d0:d0 + DC].reshape(DC * tt, nb)
        sig = jnp.dot(Wc, x, preferred_element_type=jnp.float32)
        sig = sig.reshape(DC, tt, WS)
        for j in range(DC):
            off = (D2 - 1) - (d0 + j)
            z_acc[:, off:off + WS] += sig[j]
    z = z_acc[...]
    if dre_ref.dtype == jnp.bfloat16:
        z = z.astype(jnp.bfloat16)
    Zr = jnp.dot(z, dre_ref[...], preferred_element_type=jnp.float32)
    Zi = jnp.dot(z, dim_ref[...], preferred_element_type=jnp.float32)
    ere = sere_ref[0, 0]  # [tt, F]
    eim = seim_ref[0, 0]

    @pl.when(accum_first)
    def _():
        gre_ref[0] = jnp.zeros_like(gre_ref[0])
        gim_ref[0] = jnp.zeros_like(gim_ref[0])

    gre_ref[0] += Zr * ere - Zi * eim
    gim_ref[0] += Zr * eim + Zi * ere


@functools.partial(jax.jit, static_argnames=("interpret",))
def _skew_fwd_pallas_planes(rows2, WtT, SEre, SEim, Dre, Dim, plane,
                            interpret=False):
    P, NB, D2, Tp, nb = WtT.shape
    PB = rows2.shape[0]
    WS = rows2.shape[-1]
    WZ, F = Dre.shape
    TB = plane.shape[1]
    tt = Tp // TB
    grid = (PB * TB, NB)  # row blocks innermost: accumulation axis
    x_spec = pl.BlockSpec(
        (1, 1, nb, WS),
        lambda q, b, pr: (q // TB, pr[(q // TB) % P, q % TB], b, 0),
        memory_space=pltpu.VMEM,
    )
    wt_spec = pl.BlockSpec(
        (1, 1, D2, tt, nb),
        lambda q, b, pr: ((q // TB) % P, b, 0, q % TB, 0),
        memory_space=pltpu.VMEM,
    )
    se_spec = pl.BlockSpec(
        (1, 1, tt, F), lambda q, b, pr: ((q // TB) % P, b, q % TB, 0),
        memory_space=pltpu.VMEM,
    )
    d_spec = pl.BlockSpec(
        (WZ, F), lambda q, b, pr: (0, 0), memory_space=pltpu.VMEM
    )
    g_spec = pl.BlockSpec(
        (1, tt, F), lambda q, b, pr: (q // TB, q % TB, 0),
        memory_space=pltpu.VMEM,
    )

    def kern(plane_ref, x_ref, wt_ref, sere_ref, seim_ref, dre_ref, dim_ref,
             gre_ref, gim_ref, z_acc):
        _skew_fwd_body(x_ref, wt_ref, sere_ref, seim_ref, dre_ref, dim_ref,
                       gre_ref, gim_ref, z_acc,
                       accum_first=pl.program_id(1) == 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[x_spec, wt_spec, se_spec, se_spec, d_spec, d_spec],
        out_specs=(g_spec, g_spec),
        scratch_shapes=[pltpu.VMEM((tt, WZ), jnp.float32)],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((PB, Tp, F), jnp.float32),
            jax.ShapeDtypeStruct((PB, Tp, F), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            # Tap matmuls (2*Tp*D2*N*WS per image) + in-kernel DFT-back
            # (4*Tp*WZ*F); rows re-read once per angle block, tables once.
            flops=2 * PB * Tp * D2 * NB * nb * WS
            + 4 * PB * Tp * WZ * F,
            bytes_accessed=PB * TB * NB * nb * WS * 4
            + (PB // P)
            * (WtT.size * WtT.dtype.itemsize
               + 2 * SEre.size * SEre.dtype.itemsize)
            + 2 * WZ * F * Dre.dtype.itemsize
            + 2 * PB * Tp * F * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(plane, rows2, WtT, SEre, SEim, Dre, Dim)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "row_width", "dc"))
def _skew_t_pallas_planes(gre_b, gim_b, WtT, SEre, SEim, DreT, DimT, plane,
                          pfirst, interpret=False, row_width=None, dc=None):
    P, NB, D2, Tp, nb = WtT.shape
    PB = gre_b.shape[0]
    F, WZ = DreT.shape
    TB = plane.shape[1]
    tt = Tp // TB
    N = NB * nb  # rows this call produces (local blocks when WtT is sliced)
    # Raw row width (x is zero outside [0, row_width)). Defaults to the
    # square case; the row-sharded path passes the FULL image width while
    # WtT carries only this shard's row blocks.
    WS = N if row_width is None else row_width
    grid = (PB * NB, TB)  # tb innermost: consecutive same-plane revisits
    g_spec = pl.BlockSpec(
        (1, tt, F), lambda q, tb, pr, fr: (q // NB, tb, 0),
        memory_space=pltpu.VMEM,
    )
    wt_spec = pl.BlockSpec(
        (1, 1, D2, tt, nb),
        lambda q, tb, pr, fr: ((q // NB) % P, q % NB, 0, tb, 0),
        memory_space=pltpu.VMEM,
    )
    se_spec = pl.BlockSpec(
        (1, 1, tt, F), lambda q, tb, pr, fr: ((q // NB) % P, q % NB, tb, 0),
        memory_space=pltpu.VMEM,
    )
    d_spec = pl.BlockSpec(
        (F, WZ), lambda q, tb, pr, fr: (0, 0), memory_space=pltpu.VMEM
    )
    x2_spec = pl.BlockSpec(
        (1, 1, nb, WS),
        lambda q, tb, pr, fr: (q // NB, pr[(q // NB) % P, tb], q % NB, 0),
        memory_space=pltpu.VMEM,
    )
    DC = _skew_dc(D2) if dc is None else dc
    assert D2 % DC == 0, (D2, DC)
    sig_dtype = WtT.dtype if WtT.dtype == jnp.bfloat16 else jnp.float32

    def kern(plane_ref, first_ref, gre_ref, gim_ref, wt_ref, sere_ref,
             seim_ref, dreT_ref, dimT_ref, x2_ref, sig_acc):
        q = pl.program_id(0)
        tb = pl.program_id(1)
        p = (q // NB) % P
        # d-MAJOR taps [D2, tt, nb] + [DC, tt, WS] scratch (r5): the old
        # t-major sig_acc[:, j, :] writes sliced the sublane axis of a
        # (DC, WS)-tiled scratch — 1-of-8 masked strided VPU stores that
        # serialized between the MXU dots (the 14.7%-MXU skew-T wall,
        # VERDICT r4 #1). With d outermost each window copy is a full
        # [tt, WS] tile store and the W chunk a leading-dim slice.
        W = wt_ref[0, 0]  # [D2, tt, nb]
        lowp = W.dtype == jnp.bfloat16
        if not lowp:
            W = W.astype(jnp.float32)
        gre = gre_ref[0]  # [tt, F]
        gim = gim_ref[0]
        ere = sere_ref[0, 0]
        eim = seim_ref[0, 0]
        Zr = gre * ere + gim * eim  # conj(E) * g_bar
        Zi = gim * ere - gre * eim
        if dreT_ref.dtype == jnp.bfloat16:
            Zr = Zr.astype(jnp.bfloat16)
            Zi = Zi.astype(jnp.bfloat16)
        zbar = jnp.dot(
            Zr, dreT_ref[...], preferred_element_type=jnp.float32
        ) + jnp.dot(
            Zi, dimT_ref[...], preferred_element_type=jnp.float32
        )  # [tt, WZ]

        @pl.when(first_ref[p, tb] == 1)
        def _():
            x2_ref[0, 0] = jnp.zeros_like(x2_ref[0, 0])

        for d0 in range(0, D2, DC):
            for j in range(DC):
                off = (D2 - 1) - (d0 + j)
                sig_acc[j] = zbar[:, off:off + WS].astype(sig_dtype)
            Wc = W[d0:d0 + DC].reshape(DC * tt, nb)
            sig = sig_acc[...].reshape(DC * tt, WS)
            x2_ref[0, 0] += jax.lax.dot_general(
                Wc, sig, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [nb, WS]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[g_spec, g_spec, wt_spec, se_spec, se_spec, d_spec, d_spec],
        out_specs=(x2_spec,),
        scratch_shapes=[pltpu.VMEM((DC, tt, WS), sig_dtype)],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((PB, 2, N, WS), jnp.float32),),
        cost_estimate=pl.CostEstimate(
            # Transpose of the forward: DFT-forward (4*Tp*WZ*F) + tap
            # matmuls (2*Tp*D2*N*WS per image); spectra read once per row
            # block, tables once, output written once per angle block.
            flops=2 * PB * Tp * D2 * NB * nb * WS
            + 4 * PB * Tp * WZ * F,
            bytes_accessed=2 * PB * NB * Tp * F * 4
            + (PB // P)
            * (WtT.size * WtT.dtype.itemsize
               + 2 * SEre.size * SEre.dtype.itemsize)
            + 2 * F * WZ * DreT.dtype.itemsize
            + PB * TB * 2 * N * WS * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(plane, pfirst, gre_b, gim_b, WtT, SEre, SEim, DreT, DimT)[0]


@custom_batching.custom_vmap
def skew_sum_planes(rows2, WtT, SEre, SEim, Dre, Dim, plane):
    """Spatial skew row stage forward: raw two-plane image rows
    [P, 2, N, N] -> slot-order spectrum pair [P, Tp, F] (no row rfft).
    Takes the d-major tap table ``WtT`` [P, NB, D2, Tp, nb]
    (``precompute_shear``'s "WtT" entry)."""
    return _skew_fwd_pallas_planes(
        rows2, WtT, SEre, SEim, Dre, Dim, plane, interpret=_interp()
    )


@skew_sum_planes.def_vmap
def _skew_sum_planes_vmap(axis_size, in_batched, rows2, *tabs):
    _check_unbatched(in_batched, 1, "skew_sum_planes")
    rows_f = rows2.reshape((axis_size * rows2.shape[1],) + rows2.shape[2:])
    out = _skew_fwd_pallas_planes(rows_f, *tabs, interpret=_interp())
    return _unfold_batch(out, axis_size), (True, True)


@custom_batching.custom_vmap
def skew_sum_planes_t(gre_b, gim_b, WtT, SEre, SEim, DreT, DimT, plane,
                      pfirst):
    """Exact transpose of :func:`skew_sum_planes`: accumulates raw row
    cotangents straight into the two planes [P, 2, N, N] (apply the
    per-plane ``pvisited`` mask afterwards)."""
    return _skew_t_pallas_planes(
        gre_b, gim_b, WtT, SEre, SEim, DreT, DimT, plane, pfirst,
        interpret=_interp(),
    )


@custom_batching.custom_vmap
def skew_sum_planes_t_rows(gre_b, gim_b, WtT, SEre, SEim, DreT, DimT, plane,
                           pfirst, rowmark):
    """Row-sharded variant of :func:`skew_sum_planes_t`: ``WtT``/``SE``
    carry only this shard's row blocks while the raw row width stays the
    full image width — output [P, 2, NB_loc*nb, row_width]. ``rowmark`` is
    any array whose LAST dim is the full image row width (it only carries
    the static width through vmap, like ``blkmark`` in
    :func:`shear_sum_t`) — the fan path vmaps this over nodes against the
    single shared parallel-stage table set."""
    return _skew_t_pallas_planes(
        gre_b, gim_b, WtT, SEre, SEim, DreT, DimT, plane, pfirst,
        interpret=_interp(), row_width=rowmark.shape[-1],
    )


@skew_sum_planes_t_rows.def_vmap
def _skew_sum_planes_t_rows_vmap(axis_size, in_batched, gre_b, gim_b,
                                 *tabs_mark):
    _check_unbatched(in_batched, 2, "skew_sum_planes_t_rows")
    gre_f, gim_f = _fold_batch([gre_b, gim_b], axis_size)
    tabs, rowmark = tabs_mark[:-1], tabs_mark[-1]
    out = _skew_t_pallas_planes(
        gre_f, gim_f, *tabs, interpret=_interp(),
        row_width=rowmark.shape[-1],
    )
    return out.reshape(
        (axis_size, out.shape[0] // axis_size) + out.shape[1:]
    ), True


@skew_sum_planes_t.def_vmap
def _skew_sum_planes_t_vmap(axis_size, in_batched, gre_b, gim_b, *tabs):
    _check_unbatched(in_batched, 2, "skew_sum_planes_t")
    gre_f, gim_f = _fold_batch([gre_b, gim_b], axis_size)
    out = _skew_t_pallas_planes(gre_f, gim_f, *tabs, interpret=_interp())
    return out.reshape(
        (axis_size, out.shape[0] // axis_size) + out.shape[1:]
    ), True
