"""Gather-free Radon projector: FFT row shears + banded evaluation matmul.

Motivation (measured on TPU v5e): XLA lowers the gather-based Joseph
projector (``ops.radon``) to near-scalar gathers — ~2.9 s for a
256x256/8-node forward projection, unusable as the inner-loop operator. This
module reformulates the projection with no gathers at all, using only FFTs,
elementwise phase filters, and small matmuls — all TPU-native ops.

Derivation. For parallel-beam angle t (Joseph branch: integrate along the
row axis a, interpolate along the in-row axis), the interpolation coordinate
is affine:   fb(t, l, a) = A_t * l + B_t * a + C_t
(l = detector index, A_t = det_spacing/(h sin), B_t = -cos/sin). Split
fb = v + sigma_{t,a} with per-row real shift sigma_{t,a} = B_t a + C_t and
evaluation points v = A_t * l:

  1. shift each image row by sigma (linear-interp shift, done *exactly* in
     the Fourier domain: filter H[f] = ((1-fr) + fr e^{+2 pi i f/Np})
     e^{+2 pi i f k/Np}, sigma = k + fr),
  2. sum the shifted rows (one elementwise-multiply + reduction per angle in
     frequency space), inverse FFT once per angle,
  3. evaluate the summed profile at the A_t-spaced detector grid through a
     2-tap hat matrix (built on the fly from iota arithmetic — a small
     [D, Np] matmul on the MXU).

The composite interpolation kernel is hat-composed-with-hat (a 4-tap
quadratic-B-spline-like footprint) — slightly smoother than the pure 2-tap
Joseph kernel but an equally consistent discretization of the same line
integral (nonnegative weights, partition of unity); accuracy tests (analytic
disk profile, mass preservation, adjointness) hold at the same tolerances.

Angles with |cos| > |sin| use the transposed image (branch C), mirroring
``ops.radon``. Adjoints of the node-batched Pallas paths are composed by
hand (each stage's exact transpose in reverse order — still gather/
scatter-free, and vmappable for scenario batching); the plain-jnp ``project``
adjoint comes from ``jax.linear_transpose``. Hand-written adjoints are
verified against ``jax.linear_transpose`` of the jnp reference in tests.

Directly supports parallel-beam geometries (per-ray affine structure);
fan-beam reuses this projector through angular rebinning (``ops.radon_fan``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dip_admm_tpu.config import GeometryConfig


# Window slack multiplier. Live interpolation coordinates satisfy
# |fb| <= sqrt(2) * max(N, D) + O(1) (detector width <= image diagonal), and
# circular reads only alias into the content region [0, N) when
# |pos| > Np - N, so Np >= (sqrt(2) + 1) * max(N, D) + margin is alias-free.
# The no-aliasing property is asserted by a test comparing against a 4x pad.
_PAD_FACTOR = 2.5


def _padded_len(N: int, D: int) -> int:
    """Smallest power-of-two window >= the alias-free bound
    _PAD_FACTOR * max(N, D) + 8.

    Power-of-two only: a measured attempt at tighter mixed-radix windows
    (e.g. 640 = 2^7*5 at N=256) halved throughput — TPU FFTs and the
    [.., F]-wide table contractions want pow2/lane-aligned sizes.
    """
    need = int(np.ceil(_PAD_FACTOR * max(N, D))) + 8
    return 1 << int(np.ceil(np.log2(need)))


def _coeffs(cfg: GeometryConfig, angles: jnp.ndarray, dets=None):
    """Coefficients of fb(t, l, a) = P(t, l) + B_t a + C_t for both Joseph
    branches; mirrors the gather implementation's geometry exactly (pixel
    centers c(i) = -1 + (i+.5) h, detector centers likewise). ``dets``
    overrides the uniform detector grid with explicit positions [D] (used by
    the fan-beam rebinning path); P is returned as the per-(t, l) evaluation
    coordinate array."""
    N, D = cfg.N, cfg.n_det
    h = 2.0 / N
    if dets is None:
        det_w = cfg.det_width_factor * 2.0
        dd = det_w / D
        dets = -det_w / 2.0 + (jnp.arange(D, dtype=jnp.float32) + 0.5) * dd
    else:
        dets = jnp.asarray(dets, jnp.float32)
    c0 = -1.0 + 0.5 * h  # first pixel center
    sin = jnp.sin(angles)
    cos = jnp.cos(angles)

    def branch(s, c):
        # x1 = (d - ca * c) / s ; fb = (x1 + 1)/h - 0.5
        safe = jnp.where(jnp.abs(s) < 1e-9, 1e-9, s)
        P = dets[None, :] / (h * safe[:, None])  # [T, D]
        B = -(c / safe)
        C = (-c0 * (c / safe) + 1.0) / h - 0.5
        scale = h / jnp.abs(safe)
        return P, B, C, scale

    # Branch R: integrate over axis0 rows, interp axis1 (needs |sin|>=|cos|).
    P_r, B_r, C_r, s_r = branch(sin, cos)
    # Branch C: on the transposed image, roles of sin/cos swap.
    P_c, B_c, C_c, s_c = branch(cos, sin)
    use_r = jnp.abs(sin) >= jnp.abs(cos)
    return (P_r, B_r, C_r, s_r), (P_c, B_c, C_c, s_c), use_r


def _branch_phases(P, B, C, N: int, Np: int, mask=None):
    """Shift-filter phase table H [T, N, F] (complex64) for one branch.

    H depends only on the geometry, so callers should precompute it once per
    problem (``precompute_phases``) — evaluating ~1e8 complex exponentials
    per projector application otherwise dominates the runtime (measured).
    ``mask`` zeroes the rows of inactive angles so the two branch outputs can
    simply be added.
    """
    F = Np // 2 + 1
    f = jnp.arange(F, dtype=jnp.float32)
    a_idx = jnp.arange(N, dtype=jnp.float32)
    # Recenter so evaluation points P - delta stay in [0, Np).
    delta = jnp.floor(jnp.min(P, axis=1))  # [T]
    sigma = B[:, None] * a_idx[None, :] + C[:, None] + delta[:, None]  # [T,N]
    k = jnp.floor(sigma)
    fr = sigma - k
    # s[v] = row[v + k] advances the signal: multiply rfft bins by
    # e^{+2 pi i f k / Np}; the fractional tap adds ((1-fr) + fr e^{+i w_f}).
    ang = (2.0 * jnp.pi / Np) * f  # [F]
    base = jnp.exp(1j * ang[None, None, :] * k[:, :, None])  # [T, N, F]
    tap = (1.0 - fr)[:, :, None] + fr[:, :, None] * jnp.exp(
        1j * ang[None, None, :]
    )
    H = (base * tap).astype(jnp.complex64)
    if mask is not None:
        H = H * mask[:, None, None]
    return H, delta


def precompute_phases(
    cfg: GeometryConfig, angles: jnp.ndarray, valid=None,
    table_dtype=jnp.float32, dets=None,
):
    """Geometry-only tables for :func:`project`.

    Only the shift-filter phase tensors H (the expensive exponentials) are
    materialized — stored as separate real/imaginary planes so the apply-time
    contraction runs in real arithmetic and the storage dtype is free to be
    bfloat16 (``table_dtype=jnp.bfloat16`` halves the HBM traffic that bounds
    the inner loop, at ~0.1% operator perturbation). The 2-sparse evaluation
    weights are rebuilt on the fly from the small coefficient vectors.
    Inactive-branch angles are masked to zero in H so the two branch outputs
    simply add.
    """
    N, D = cfg.N, cfg.n_det
    Np = _padded_len(N, D)
    (Pr, Br, Cr, sr), (Pc, Bc, Cc, sc), use_r = _coeffs(cfg, angles, dets)
    m_r = use_r.astype(jnp.float32)
    m_c = 1.0 - m_r
    if valid is not None:
        vm = valid.astype(jnp.float32)
        m_r = m_r * vm
        m_c = m_c * vm
    H_r, d_r = _branch_phases(Pr, Br, Cr, N, Np, mask=m_r)
    H_c, d_c = _branch_phases(Pc, Bc, Cc, N, Np, mask=m_c)
    # Np is recoverable from the (static) table shapes (Np = 2*(F-1));
    # keeping it out of the pytree keeps the tables jit-transparent.
    return {
        "Hre_r": jnp.real(H_r).astype(table_dtype),
        "Him_r": jnp.imag(H_r).astype(table_dtype),
        "p_r": Pr - d_r[:, None], "s_r": sr,
        "Hre_c": jnp.real(H_c).astype(table_dtype),
        "Him_c": jnp.imag(H_c).astype(table_dtype),
        "p_c": Pc - d_c[:, None], "s_c": sc,
    }


def _branch_apply(img, Hre, Him, p, scale):
    """rows -FFT-> filter/sum (real arithmetic) -IFFT-> evaluation matmul.

    ``p`` [T, D]: recentered evaluation coordinates in [0, Np)."""
    N = img.shape[0]
    Np = 2 * (Hre.shape[-1] - 1)
    rows = jnp.pad(img, ((0, 0), (0, Np - N)))
    rhat = jnp.fft.rfft(rows, axis=1)  # [N, F]
    rre = jnp.real(rhat)
    rim = jnp.imag(rhat)
    # (rre + i rim) * (Hre + i Him), summed over rows n — as real einsums so
    # low-precision tables feed f32 accumulation without a complex temp.
    ein = functools.partial(
        jnp.einsum, "nf,tnf->tf", preferred_element_type=jnp.float32
    )
    g_re = ein(rre, Hre) - ein(rim, Him)
    g_im = ein(rre, Him) + ein(rim, Hre)
    ghat = jax.lax.complex(g_re.astype(jnp.float32), g_im.astype(jnp.float32))
    g = jnp.fft.irfft(ghat, n=Np, axis=1).astype(img.dtype)  # [T, Np]
    v_idx = jnp.arange(Np, dtype=img.dtype)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(p[:, :, None] - v_idx[None, None, :]))
    out = jnp.einsum("tdv,tv->td", w, g)
    return scale[:, None] * out


def project(
    cfg: GeometryConfig,
    img: jnp.ndarray,
    angles: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    tables=None,
) -> jnp.ndarray:
    """Forward projection [N, N] x [T] -> [T, D], gather-free.

    Pass ``tables=precompute_phases(...)`` to skip the per-call phase
    construction (the fast path for repeated application).
    """
    if cfg.fan_beam:
        raise NotImplementedError("FFT projector supports parallel beam only")
    if tables is None:
        tables = precompute_phases(cfg, angles, valid)
    t = tables
    out = _branch_apply(img, t["Hre_r"], t["Him_r"], t["p_r"], t["s_r"])
    out = out + _branch_apply(img.T, t["Hre_c"], t["Him_c"], t["p_c"], t["s_c"])
    return out


def precompute_merged(
    cfg: GeometryConfig, angles: jnp.ndarray, valid=None,
    table_dtype=jnp.float32, dets=None,
):
    """Branch-merged tables for :func:`project_nodes_merged`.

    :func:`precompute_phases` stores separate R/C branch tables with the
    inactive branch's rows masked to zero — every application then reads a
    [T, N, F] pair per branch, half of it zeros (for coarse node angle
    blocks, one branch is almost entirely inactive). Here the two branches
    are merged into ONE table pair plus a per-angle selector choosing which
    image orientation's spectrum to contract — half the table memory and
    half the apply-time HBM traffic, with identical math (per angle exactly
    one branch is active; masks are complementary).
    """
    N, D = cfg.N, cfg.n_det
    Np = _padded_len(N, D)
    (Pr, Br, Cr, sr), (Pc, Bc, Cc, sc), use_r = _coeffs(cfg, angles, dets)
    m_r = use_r.astype(jnp.float32)
    m_c = 1.0 - m_r
    if valid is not None:
        vm = valid.astype(jnp.float32)
        m_r = m_r * vm
        m_c = m_c * vm
    H_r, d_r = _branch_phases(Pr, Br, Cr, N, Np, mask=m_r)
    H_c, d_c = _branch_phases(Pc, Bc, Cc, N, Np, mask=m_c)
    H = H_r + H_c  # complementary masks: per angle one branch is nonzero
    p = jnp.where(use_r[:, None], Pr - d_r[:, None], Pc - d_c[:, None])
    s = jnp.where(use_r, sr, sc)
    # DFT matrices are materialized here rather than rebuilt at apply time:
    # inside the ADMM while_loop the rebuild (~2M sin/cos per application)
    # is NOT hoisted by XLA and measured 5x slower end-to-end.
    Ere, Eim, Cre, Cim = _dft_mats(N, Np)
    return {
        "Hre": jnp.real(H).astype(table_dtype),
        "Him": jnp.imag(H).astype(table_dtype),
        "p": p,  # [T, D] recentered evaluation coordinates
        "s": s,  # [T] branch scale
        "sel": m_c[:, None],  # [T, 1]: 1 -> transposed-image spectrum
        "Ere": Ere, "Eim": Eim,  # [N, F] forward DFT of zero-padded rows
        "Cre": Cre, "Cim": Cim,  # [F, Np] irfft coefficients
    }


def _dft_mats(N: int, Np: int):
    """DFT matrices replacing rfft/irfft with MXU matmuls: rows are
    zero-padded N -> Np, so the forward DFT only needs the first N columns;
    the inverse needs the standard irfft coefficients (non-DC/Nyquist bins
    doubled, DC/Nyquist imaginary parts dropped — verified against
    jnp.fft.irfft). XLA's TPU FFT measures ~1 ms per [8, 256, 1024] batch
    while these matmuls are microseconds on the MXU."""
    F = Np // 2 + 1
    f = jnp.arange(F, dtype=jnp.float32)
    v = jnp.arange(N, dtype=jnp.float32)
    ang = (2.0 * jnp.pi / Np) * v[:, None] * f[None, :]
    Ere = jnp.cos(ang)
    Eim = -jnp.sin(ang)
    c = jnp.full((F,), 2.0).at[0].set(1.0).at[-1].set(1.0)
    vv = jnp.arange(Np, dtype=jnp.float32)
    ang2 = (2.0 * jnp.pi / Np) * f[:, None] * vv[None, :]
    Cre = c[:, None] * jnp.cos(ang2) / Np
    Cim = -c[:, None] * jnp.sin(ang2) / Np
    return Ere, Eim, Cre, Cim


def _ein32(*args):
    return jnp.einsum(*args, preferred_element_type=jnp.float32)


def _plane_spectra(imgs, t):
    """Forward DFT of both image orientations' rows: [P, N, N] ->
    ([P, 2, N, F], [P, 2, N, F]) real/imag planes (MXU matmuls)."""
    rows2 = jnp.stack([imgs, imgs.transpose(0, 2, 1)], axis=1)  # [P,2,N,N]
    rre2 = _ein32("ponv,pvf->ponf", rows2, t["Ere"])
    rim2 = _ein32("ponv,pvf->ponf", rows2, t["Eim"])
    return rre2, rim2


def _plane_spectra_t(rre2_bar, rim2_bar, t, dtype):
    """Exact transpose of :func:`_plane_spectra`."""
    rows2_bar = _ein32("ponf,pvf->ponv", rre2_bar, t["Ere"]) + _ein32(
        "ponf,pvf->ponv", rim2_bar, t["Eim"]
    )
    return (rows2_bar[:, 0] + rows2_bar[:, 1].transpose(0, 2, 1)).astype(dtype)


def _eval_tail(g_re, g_im, t, dtype):
    """irfft matmul + hat evaluation + branch scale: [P, T, F] spectra ->
    [P, T, D] sinograms. The XLA hat einsum (MXU) wins while the
    materialized weight tensor w [P, T, D, Np] stays HBM-friendly (measured:
    4.1 vs 5.5 ms/normal-op at 256^2); past ~1.5 GB (512^2) materializing w
    is infeasible and the on-the-fly Pallas kernel takes over."""
    from dip_admm_tpu.ops.pallas.hat_eval import hat_eval

    g = _ein32("ptf,pfv->ptv", g_re, t["Cre"]) + _ein32(
        "ptf,pfv->ptv", g_im, t["Cim"]
    )
    P = g.shape[0]
    T, D = t["p"].shape[-2:]
    Np = t["Cre"].shape[-1]
    if P * T * D * Np * 4 > 1.5e9:
        return hat_eval(g, t["p"], t["s"][..., None]).astype(dtype)
    g = g.astype(dtype)
    v_idx = jnp.arange(Np, dtype=dtype)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(t["p"][..., None] - v_idx))
    out = jnp.einsum("ptdv,ptv->ptd", w, g)
    return t["s"][..., None] * out


def _eval_tail_t(sinos, t):
    """Exact transpose of :func:`_eval_tail`: [P, T, D] cotangents ->
    ([P, T, F], [P, T, F]) spectrum cotangents."""
    from dip_admm_tpu.ops.pallas.hat_eval import hat_eval_t

    P, T, D = sinos.shape
    Np = t["Cre"].shape[-1]
    if P * T * D * Np * 4 > 1.5e9:
        g_bar = hat_eval_t(
            sinos.astype(jnp.float32), t["p"], t["s"][..., None],
            t["Cre"][0, 0],
        )
    else:
        v_idx = jnp.arange(Np, dtype=sinos.dtype)
        w = jnp.maximum(0.0, 1.0 - jnp.abs(t["p"][..., None] - v_idx))
        g_bar = jnp.einsum(
            "ptdv,ptd->ptv", w, t["s"][..., None] * sinos,
            preferred_element_type=jnp.float32,
        )
    g_re_bar = _ein32("ptv,pfv->ptf", g_bar, t["Cre"])
    g_im_bar = _ein32("ptv,pfv->ptf", g_bar, t["Cim"])
    return g_re_bar, g_im_bar


def project_nodes_merged(cfg: GeometryConfig, imgs, tables):
    """Batched forward projection [P, N, N] -> [P, T, D] on merged tables
    (:func:`precompute_merged`): DFT matmuls (MXU) + the select filter-sum
    Pallas kernel + hat evaluation. Parallel beam only."""
    if cfg.fan_beam:
        raise NotImplementedError("fft_pallas supports parallel beam only")
    from dip_admm_tpu.ops.pallas.filter_sum import filter_sum_sel

    t = tables
    rre2, rim2 = _plane_spectra(imgs, t)
    g_re, g_im = filter_sum_sel(rre2, rim2, t["Hre"], t["Him"], t["sel"])
    return _eval_tail(g_re, g_im, t, imgs.dtype)


def backproject_nodes_merged(cfg: GeometryConfig, sinos, tables):
    """Exact adjoint of :func:`project_nodes_merged`, composed by hand
    (each stage's transpose in reverse; verified against
    ``jax.linear_transpose`` of the jnp reference in tests)."""
    from dip_admm_tpu.ops.pallas.filter_sum import filter_sum_sel_t

    t = tables
    g_re_bar, g_im_bar = _eval_tail_t(sinos, t)
    rre2_bar, rim2_bar = filter_sum_sel_t(
        g_re_bar, g_im_bar, t["Hre"], t["Him"], t["sel"]
    )
    return _plane_spectra_t(rre2_bar, rim2_bar, t, sinos.dtype)


def precompute_merged_mxu(
    cfg: GeometryConfig, angles, valid=None, table_dtype=jnp.float32
):
    """Node-batched MXU-layout tables for :func:`project_nodes_mxu`.

    Builds the merged-branch tables (:func:`precompute_merged`), then
    regroups each node's angle rows so every tt-angle block contracts a
    single image-orientation spectrum (``filter_mxu.plan_branch_groups``)
    and pre-tiles the phase tables to the [P, FB, NB, Tp, tn*128] matmul
    layout. ``angles``/``valid`` are batched [P, T]; the slot permutation is
    internal — ``p``/``s`` stay in original angle order and the projector
    unpermutes the spectra right after the kernel.
    """
    from dip_admm_tpu.ops.pallas import filter_mxu

    P, T = angles.shape
    if valid is None:
        valid = jnp.ones((P, T), bool)
    merged = jax.jit(
        jax.vmap(
            lambda a, v: precompute_merged(cfg, a, v, table_dtype=table_dtype)
        )
    )((jnp.asarray(angles, jnp.float32)), valid)
    use_c = np.asarray(merged["sel"])[:, :, 0] > 0.5
    plan = filter_mxu.plan_branch_groups(use_c, np.asarray(valid))
    F = merged["Hre"].shape[-1]
    Fpad = -(-F // 128) * 128
    tn = filter_mxu.pick_tn(cfg.N)
    src = jnp.asarray(plan["src_slot"])
    tile = jax.jit(
        functools.partial(filter_mxu.tile_table, Fpad=Fpad, tn=tn)
    )
    # DFT matrices keep the node axis (geometry-global but the sharded
    # runtime shards every table leaf over its leading node dim).
    Ere = jnp.pad(merged["Ere"], ((0, 0), (0, 0), (0, Fpad - F)))
    Eim = jnp.pad(merged["Eim"], ((0, 0), (0, 0), (0, Fpad - F)))
    Cre = jnp.pad(merged["Cre"], ((0, 0), (0, Fpad - F), (0, 0)))
    Cim = jnp.pad(merged["Cim"], ((0, 0), (0, Fpad - F), (0, 0)))
    return {
        "Hre_t": tile(merged["Hre"], src),
        "Him_t": tile(merged["Him"], src),
        "onehot": jnp.asarray(plan["onehot"]),
        "posfull": jnp.asarray(plan["posfull"]),
        "invposfull": jnp.asarray(plan["invposfull"]),
        "p": merged["p"], "s": merged["s"],
        "Ere": Ere, "Eim": Eim, "Cre": Cre, "Cim": Cim,
    }


# Fold the irfft/hat-eval stage into precomputed WC tables up to this many
# bytes (pair, storage dtype): 512^2/8 bf16 is 3.2 GB and wanted; 512^2 f32
# (6.4 GB) falls back to the on-the-fly hat_eval kernel.
_FOLD_EVAL_MAX_BYTES = 4.0e9


def precompute_grouped(
    cfg: GeometryConfig, angles, valid=None, table_dtype=jnp.float32,
    fold_eval: bool | None = None, dets=None,
):
    """Branch-grouped merged tables for :func:`project_nodes_grouped`.

    Builds the merged-branch tables (:func:`precompute_merged`) and permutes
    each node's angle rows into ``filter_mxu.plan_branch_groups`` slot order
    (every tt-angle block single-branch, slack rows zeroed) so the
    filter-sum kernel needs no in-kernel select — half the select kernel's
    arithmetic/VMEM traffic at identical HBM table bytes. Layout stays
    [P, Tp, N, F] (no MXU tiling, no frequency padding).

    ``fold_eval`` (default OFF): additionally precompute the irfft +
    hat-evaluation + branch-scale composition as one table pair

        WC_re[p, t, d, f] = s[p,t] * sum_v hat(p[p,t,d] - v) * Cre[p, f, v]

    (slot-ordered rows, slack zero) so the apply-time tail after the
    filter-sum is a single einsum over f. MEASURED SLOWER end-to-end: the
    in-process interleaved A/B at 256^2/8 (scripts/bench_e2e_modes.py)
    runs 2.03 outer it/s unfolded vs 1.49 folded — the WC read (~0.4 GB
    bf16 per apply direction) costs more inside the ADMM loop than the
    unfolded irfft-matmul + hat-einsum tail, and the fold adds ~2 min of
    table build. Kept as an option for memory-constrained geometries where
    the materialized hat weights would not fit.
    """
    from dip_admm_tpu.ops.pallas import filter_mxu

    P, T = angles.shape
    if valid is None:
        valid = jnp.ones((P, T), bool)
    merged = jax.jit(
        jax.vmap(
            lambda a, v: precompute_merged(
                cfg, a, v, table_dtype=table_dtype, dets=dets
            )
        )
    )(jnp.asarray(angles, jnp.float32), valid)
    use_c = np.asarray(merged["sel"])[:, :, 0] > 0.5
    plan = filter_mxu.plan_branch_groups(use_c, np.asarray(valid))
    src = jnp.asarray(plan["src_slot"])

    @jax.jit
    def permute(H):
        Hp = jnp.take_along_axis(H, jnp.clip(src, 0)[:, :, None, None], axis=1)
        return Hp * (src >= 0)[:, :, None, None].astype(H.dtype)

    tables = {
        "Hre_g": permute(merged["Hre"]),
        "Him_g": permute(merged["Him"]),
        "onehot": jnp.asarray(plan["onehot"]),
        "posfull": jnp.asarray(plan["posfull"]),
        "invposfull": jnp.asarray(plan["invposfull"]),
        "p": merged["p"], "s": merged["s"],
        "Ere": merged["Ere"], "Eim": merged["Eim"],
        "Cre": merged["Cre"], "Cim": merged["Cim"],
    }
    Tp = int(plan["Tp"])
    D = merged["p"].shape[-1]
    F = merged["Cre"].shape[-2]
    tdt = jnp.dtype(table_dtype)
    wc_bytes = 2 * P * Tp * D * F * tdt.itemsize
    if fold_eval is None:
        fold_eval = False  # measured slower end-to-end (see docstring)
    if fold_eval and wc_bytes > _FOLD_EVAL_MAX_BYTES:
        fold_eval = False
    if not fold_eval:
        return tables

    # Slot-ordered coordinates/scales (slack rows -> s = 0 -> zero WC rows).
    keep2 = (src >= 0).astype(jnp.float32)
    p_slot = jnp.take_along_axis(
        merged["p"], jnp.clip(src, 0)[:, :, None], axis=1
    )
    s_slot = jnp.take_along_axis(merged["s"], jnp.clip(src, 0), axis=1) * keep2
    tt = int(plan["tt"])
    TB = Tp // tt
    Np = merged["Cre"].shape[-1]
    v_idx = jnp.arange(Np, dtype=jnp.float32)

    # Chunked over angle blocks: the transient hat tensor w is
    # [P, tt, D, Np] f32 (~1 GB at 512^2), not [P, Tp, D, Np] (~13 GB).
    def one(args):
        pcb, scb = args  # [P, tt, D], [P, tt]
        w = jnp.maximum(0.0, 1.0 - jnp.abs(pcb[..., None] - v_idx))
        ein = functools.partial(
            jnp.einsum, "ptdv,pfv->ptdf", preferred_element_type=jnp.float32
        )
        sc = scb[:, :, None, None]
        return (
            (sc * ein(w, merged["Cre"])).astype(tdt),
            (sc * ein(w, merged["Cim"])).astype(tdt),
        )

    pc = p_slot.reshape(P, TB, tt, D).transpose(1, 0, 2, 3)
    sc = s_slot.reshape(P, TB, tt).transpose(1, 0, 2)
    WCre, WCim = jax.jit(lambda a, b: jax.lax.map(one, (a, b)))(pc, sc)
    tables["WCre"] = WCre.transpose(1, 0, 2, 3, 4).reshape(P, Tp, D, F)
    tables["WCim"] = WCim.transpose(1, 0, 2, 3, 4).reshape(P, Tp, D, F)
    return tables


def project_nodes_grouped(cfg: GeometryConfig, imgs, tables):
    """Batched forward projection [P, N, N] -> [P, T, D] on branch-grouped
    tables (:func:`precompute_grouped`): DFT matmuls + the select-free
    grouped filter-sum kernel + slot unpermute + hat evaluation."""
    if cfg.fan_beam:
        raise NotImplementedError("fft_grouped supports parallel beam only")
    from dip_admm_tpu.ops.pallas.filter_mxu import permute_rows
    from dip_admm_tpu.ops.pallas.filter_sum import filter_sum_grouped

    t = tables
    T = t["p"].shape[-2]
    rre2, rim2 = _plane_spectra(imgs, t)
    # per-angle-block spectrum plane (transposable gather via one-hot)
    rre_s = _ein32("ponf,pto->ptnf", rre2, t["onehot"])
    rim_s = _ein32("ponf,pto->ptnf", rim2, t["onehot"])
    g_re, g_im = filter_sum_grouped(rre_s, rim_s, t["Hre_g"], t["Him_g"])
    if "WCre" in t:
        # Folded irfft+hat+scale tail: one einsum over f per plane, rows in
        # slot order (WC rows are slot-permuted at build), then the output
        # permute. Cast g to the table dtype — the mixed bf16xf32 einsum
        # lowering materializes an upcast table copy (the regression the
        # filter-sum kernel exists to avoid).
        wdt = t["WCre"].dtype
        out = _ein32("ptdf,ptf->ptd", t["WCre"], g_re.astype(wdt)) + _ein32(
            "ptdf,ptf->ptd", t["WCim"], g_im.astype(wdt)
        )
        out = permute_rows(out, t["posfull"])[:, :T]
        return out.astype(imgs.dtype)
    g_re = permute_rows(g_re, t["posfull"])[:, :T]
    g_im = permute_rows(g_im, t["posfull"])[:, :T]
    return _eval_tail(g_re, g_im, t, imgs.dtype)


def _pad_unpermute(bar, t):
    """Transpose of ``permute_rows(x, posfull)[:, :T]``: zero-pad the T rows
    back to Tp slots and apply the inverse gather."""
    Tp = t["posfull"].shape[1]
    T = bar.shape[1]
    bar_full = jnp.pad(bar, ((0, 0), (0, Tp - T)) + ((0, 0),) * (bar.ndim - 2))
    return jnp.take_along_axis(bar_full, t["invposfull"][:, :, None], axis=1)


def backproject_nodes_grouped(cfg: GeometryConfig, sinos, tables):
    """Exact adjoint of :func:`project_nodes_grouped`, composed by hand
    (verified against ``jax.linear_transpose`` of the jnp reference)."""
    from dip_admm_tpu.ops.pallas.filter_sum import filter_sum_grouped_t

    t = tables
    if "WCre" in t:
        wdt = t["WCre"].dtype
        ob = _pad_unpermute(sinos, t).astype(wdt)  # [P, Tp, D] slot order
        g_re_bar = _ein32("ptdf,ptd->ptf", t["WCre"], ob)
        g_im_bar = _ein32("ptdf,ptd->ptf", t["WCim"], ob)
    else:
        g_re_bar, g_im_bar = _eval_tail_t(sinos, t)
        g_re_bar = _pad_unpermute(g_re_bar, t)
        g_im_bar = _pad_unpermute(g_im_bar, t)
    rre_s_bar, rim_s_bar = filter_sum_grouped_t(
        g_re_bar, g_im_bar, t["Hre_g"], t["Him_g"], t["onehot"]
    )
    rre2_bar = _ein32("ptnf,pto->ponf", rre_s_bar, t["onehot"])
    rim2_bar = _ein32("ptnf,pto->ponf", rim_s_bar, t["onehot"])
    return _plane_spectra_t(rre2_bar, rim2_bar, t, sinos.dtype)


def precompute_shear(
    cfg: GeometryConfig, angles, valid=None, table_dtype=jnp.float32,
    nb: int = 128, dets=None,
):
    """Factored shear tables for :func:`project_nodes_shear` (the MXU-cast
    filter-sum, ``ops.pallas.shear_sum``).

    Exploits the affine shear structure k(t, n) = floor(B_t n + C_t + d_t):
    within an ``nb``-row block the integer shifts span <= nb+1 consecutive
    values, so the dense [T, N, F] phase table factors EXACTLY into real
    tap weights Wt [P, NB, Tp, D2, nb] (two nonzeros per row column, stored
    dense for the MXU), a per-(angle, block) base phase SE [P, NB, Tp, F],
    and one tiny shared twiddle table Phi [D2, F] — ~11x less table HBM
    than the merged H pair at 256^2. Angle rows are slot-ordered
    (``filter_mxu.plan_branch_groups``) so each block contracts one
    spectrum plane; the kernel f-chunks its [tt*D2, F] matmul temp in
    VMEM, which lets the plan use large (tt=32) angle blocks and shrinks
    the slot-spectrum gather blocks by the same factor.
    """
    from dip_admm_tpu.ops.pallas import filter_mxu

    P, T = angles.shape
    if valid is None:
        valid = jnp.ones((P, T), bool)
    N, D = cfg.N, cfg.n_det
    Np = _padded_len(N, D)
    F = Np // 2 + 1
    # Largest row block <= nb that divides N and is a multiple of 8 (full-N
    # fallback for sizes with no aligned divisor, e.g. N = 8 * prime).
    want = min(nb, N)
    nb = N
    for cand in range(want, 7, -8):
        if N % cand == 0 and cand % 8 == 0:
            nb = cand
            break
    NB = N // nb
    D2 = -(-(nb + 2) // 16) * 16

    a32 = jnp.asarray(angles, jnp.float32)

    def one(a):
        # ``dets`` (explicit, possibly nonuniform detector positions — the
        # fan-beam rebinned grid) only moves the evaluation coordinates P;
        # the row-stage shears depend on B/C alone. The eval tail's
        # per-block tap span D2p is computed from the data, so a
        # near-linear nonuniform grid just widens it slightly.
        (Pr, Br, Cr, sr), (Pc, Bc, Cc, sc), use_r = _coeffs(
            cfg, a, dets=dets
        )
        a_idx = jnp.arange(N, dtype=jnp.float32)
        d_r = jnp.floor(jnp.min(Pr, axis=1))
        d_c = jnp.floor(jnp.min(Pc, axis=1))
        sig_r = Br[:, None] * a_idx + Cr[:, None] + d_r[:, None]
        sig_c = Bc[:, None] * a_idx + Cc[:, None] + d_c[:, None]
        sigma = jnp.where(use_r[:, None], sig_r, sig_c)  # [T, N]
        p = jnp.where(use_r[:, None], Pr - d_r[:, None], Pc - d_c[:, None])
        s = jnp.where(use_r, sr, sc)
        return sigma, p, s, use_r

    sigma, p, s, use_r = jax.jit(jax.vmap(one))(a32)
    # Large angle blocks: the kernel chunks its [tt*D2, F] matmul temp over
    # f in VMEM, so large blocks are cheap — fewer grid cells amortize the
    # per-cell block-copy latency, and the slot-spectrum materialization
    # shrinks with TB = Tp/tt. tt=48 measured fastest at 256^2 AND 512^2
    # (r5 sweep: 256^2 fwd 0.79 vs 0.84 ms at the old pick, 512^2 1.67 vs
    # 1.73; tt >= 64 fails to compile at 512^2 — VMEM).
    # One combined device->host fetch: through the socket relay each
    # transfer serializes behind queued work and can stall for seconds.
    use_r_np, valid_np = jax.device_get((use_r, valid))
    plan = filter_mxu.plan_branch_groups(
        ~use_r_np, valid_np, tt_candidates=(48, 32, 16, 8)
    )
    Tp = int(plan["Tp"])

    @jax.jit  # eager gathers/indexing are unimplemented on the axon backend
    def build_tables(sigma, src):
        keep = (src >= 0).astype(jnp.float32)
        srcc = jnp.clip(src, 0)
        sigma_s = jnp.take_along_axis(sigma, srcc[:, :, None], axis=1)
        sigma_s = jnp.where(keep[:, :, None] > 0, sigma_s, 0.0)  # [P,Tp,N]
        k = jnp.floor(sigma_s).astype(jnp.int32)  # [P, Tp, N]
        fr = (sigma_s - jnp.floor(sigma_s)).astype(jnp.float32)
        kb = k.reshape(P, Tp, NB, nb)
        frb = fr.reshape(P, Tp, NB, nb)
        k0 = jnp.min(kb, axis=-1)  # [P, Tp, NB]
        delta = kb - k0[..., None]  # [P, Tp, NB, nb] in [0, nb]
        d_rng = jnp.arange(D2, dtype=jnp.int32)
        w_tap = (
            (delta[..., None, :] == d_rng[:, None])
            * (1.0 - frb[..., None, :])
            + (delta[..., None, :] + 1 == d_rng[:, None])
            * frb[..., None, :]
        )  # [P, Tp, NB, D2, nb]
        w_tap = w_tap * keep[:, :, None, None, None]
        Wt = w_tap.transpose(0, 2, 1, 3, 4).astype(table_dtype)

        f_idx = jnp.arange(F, dtype=jnp.float32)
        ang = (2.0 * jnp.pi / Np) * f_idx
        ph = ang[None, None, None, :] * k0.astype(jnp.float32)[..., None]
        SEre = jnp.cos(ph).transpose(0, 2, 1, 3)  # [P, NB, Tp, F]
        SEim = jnp.sin(ph).transpose(0, 2, 1, 3)
        ph_d = ang[None, :] * jnp.arange(D2, dtype=jnp.float32)[:, None]
        Phire = jnp.cos(ph_d)  # [D2, F]
        Phiim = jnp.sin(ph_d)
        return Wt, SEre, SEim, Phire, Phiim

    src = jnp.asarray(plan["src_slot"])
    Wt, SEre, SEim, Phire, Phiim = build_tables(sigma, src)

    # Skew-mode DFT-back matrices (mode "fft_skew", the spatial row stage):
    # g[t, f] = E * sum_v z[t, v] W^{-f (v - (D2-1))} where z is the
    # anti-diagonal skew sum of the spatial tap matmul sigma[t, d, u] at
    # v = u + (D2-1) - d (the (D2-1) offset keeps indices nonnegative and is
    # folded into the matrix). Stored in the table dtype — the matmul
    # replaces the row rfft, so bf16 here mirrors the bf16 tap dots.
    WZ = -(-(N + D2 - 1) // 128) * 128

    @jax.jit
    def skew_mats():
        f_idx = jnp.arange(F, dtype=jnp.float32)
        v = jnp.arange(WZ, dtype=jnp.float32) - jnp.float32(D2 - 1)
        ang3 = (2.0 * jnp.pi / Np) * v[:, None] * f_idx[None, :]
        Dre = jnp.cos(ang3).astype(table_dtype)  # [WZ, F]
        Dim = (-jnp.sin(ang3)).astype(table_dtype)
        return Dre, Dim, Dre.T.copy(), Dim.T.copy()

    Dre, Dim, DreT, DimT = skew_mats()

    # Per-block spectrum-plane index for the scalar-prefetch kernels.
    # Pure-slack blocks (zero tap rows) inherit the previous block's plane
    # so the sequence is MONOTONE per node — the transpose kernel
    # accumulates straight into the [P, 2, N, F] planes and monotonicity
    # makes its output-block revisits consecutive (a Pallas requirement).
    TBp = int(plan["onehot"].shape[1])
    tt_plan = int(plan["tt"])
    plane_np = np.argmax(np.asarray(plan["onehot"]), axis=2).astype(np.int32)
    src_np = np.asarray(plan["src_slot"])
    for i in range(P):
        for bsl in range(TBp):
            blk_slack = (src_np[i, bsl * tt_plan:(bsl + 1) * tt_plan] < 0).all()
            if blk_slack and bsl > 0:
                plane_np[i, bsl] = plane_np[i, bsl - 1]
    pfirst_np = np.zeros((P, TBp), np.int32)
    pfirst_np[:, 0] = 1
    pfirst_np[:, 1:] = (plane_np[:, 1:] != plane_np[:, :-1]).astype(np.int32)
    pvisited_np = np.zeros((P, 2), np.float32)
    for i in range(P):
        pvisited_np[i, np.unique(plane_np[i])] = 1.0

    # ---- factored eval tail (same trick on the detector axis): the
    # evaluation coordinate p(t, d) is affine in d, so within a db-detector
    # block p = k0' + delta' + fr' with delta' spanning O(db) consecutive
    # integers; the irfft coefficients c_f/Np fold into the base phase and
    # the branch scale + row masks fold into the tap weights. ----
    db = D
    for cand in range(min(128, D), 7, -8):
        if D % cand == 0 and cand % 8 == 0:
            db = cand
            break
    DB = D // db

    @jax.jit
    def tail_coords(p, s_valid, src):
        keep = (src >= 0).astype(jnp.float32)
        srcc = jnp.clip(src, 0)
        p_s = jnp.take_along_axis(p, srcc[:, :, None], axis=1)
        p_s = jnp.where(keep[:, :, None] > 0, p_s, 0.0)  # [P, Tp, D]
        s_s = jnp.take_along_axis(s_valid, srcc, axis=1) * keep
        kd = jnp.floor(p_s).astype(jnp.int32).reshape(P, Tp, DB, db)
        frd = (p_s - jnp.floor(p_s)).astype(jnp.float32).reshape(
            P, Tp, DB, db
        )
        k0d = jnp.min(kd, axis=-1)  # [P, Tp, DB]
        return s_s, k0d, kd - k0d[..., None], frd

    s_s, k0d, deltad, frd = tail_coords(p, s * valid.astype(s.dtype), src)
    D2p = -(-(int(jnp.max(deltad)) + 2) // 16) * 16

    @jax.jit
    def tail_tables(s_s, k0d, deltad, frd):
        ddr = jnp.arange(D2p, dtype=jnp.int32)
        wd = (
            (deltad[..., None, :] == ddr[:, None])
            * (1.0 - frd[..., None, :])
            + (deltad[..., None, :] + 1 == ddr[:, None])
            * frd[..., None, :]
        )  # [P, Tp, DB, D2p, db]
        wd = wd * s_s[:, :, None, None, None]
        Wd = wd.transpose(0, 2, 1, 3, 4).astype(table_dtype)
        f_idx = jnp.arange(F, dtype=jnp.float32)
        ang = (2.0 * jnp.pi / Np) * f_idx
        cfac = jnp.full((F,), 2.0 / Np).at[0].set(1.0 / Np)
        cfac = cfac.at[-1].set(1.0 / Np)
        ph = ang[None, None, None, :] * k0d.astype(jnp.float32)[..., None]
        TEre = (cfac * jnp.cos(ph)).transpose(0, 2, 1, 3)  # [P, DB, Tp, F]
        TEim = (cfac * jnp.sin(ph)).transpose(0, 2, 1, 3)
        ph_d = ang[None, :] * jnp.arange(D2p, dtype=jnp.float32)[:, None]
        return Wd, TEre, TEim, jnp.cos(ph_d), jnp.sin(ph_d)

    Wd, TEre, TEim, PhiDre, PhiDim = tail_tables(s_s, k0d, deltad, frd)

    Ere, Eim, _, _ = jax.jit(_dft_mats, static_argnums=(0, 1))(N, Np)
    rep = jax.jit(lambda x: jnp.broadcast_to(x[None], (P,) + x.shape))
    # Node-SHARED geometry lives under the "shared" subtree — the placement
    # contract (parallel.mesh.table_partition_specs) replicates that subtree
    # over the node mesh axis and shards everything else by its leading node
    # dim (key-based because a twiddle table's leading dim D2 can equal the
    # node count).
    return {
        "Wt": Wt,
        # d-major alias for the SPATIAL skew kernels: with taps d-outermost
        # every per-tap window access in the kernels is a full [tt, WS]
        # tile (t-major sliced the sublane axis of a (DC, WS)-tiled temp —
        # 1-of-8 masked VPU accesses that serialized the skew-T kernel,
        # VERDICT r4 #1). The spectra-path kernels keep the t-major Wt.
        "WtT": jnp.copy(Wt.transpose(0, 1, 3, 2, 4)),
        "SEre": SEre, "SEim": SEim,
        "Wd": Wd,
        "TEre": TEre, "TEim": TEim,
        "shared": {
            "Phire": Phire, "Phiim": Phiim,
            "PhiDre": PhiDre, "PhiDim": PhiDim,
            "Dre": Dre, "Dim": Dim, "DreT": DreT, "DimT": DimT,
        },
        "onehot": jnp.asarray(plan["onehot"]),
        "posfull": jnp.asarray(plan["posfull"]),
        "invposfull": jnp.asarray(plan["invposfull"]),
        "plane": jnp.asarray(plane_np),
        "pfirst": jnp.asarray(pfirst_np),
        "pvisited": jnp.asarray(pvisited_np),
        "Ere": rep(Ere), "Eim": rep(Eim),
    }


def project_nodes_shear(cfg: GeometryConfig, imgs, tables, n_rows=None):
    """Batched forward projection [P, N, N] -> [P, T, D] on factored shear
    tables (:func:`precompute_shear`): DFT matmuls + the MXU shear-sum
    kernel + the factored MXU eval tail + slot unpermute. Parallel beam
    only (``n_rows`` overrides the per-node angle count — the fan rebin
    path runs this stage on T_fan/2 shared parallel angles)."""
    if cfg.fan_beam:
        raise NotImplementedError("fft_shear supports parallel beam only")
    from dip_admm_tpu.ops.pallas.filter_mxu import permute_rows
    from dip_admm_tpu.ops.pallas.shear_sum import (
        eval_shear, shear_sum_planes,
    )

    t = tables
    sh = t["shared"]
    T = max(cfg.angles_per_node()) if n_rows is None else n_rows
    rre2, rim2 = _plane_spectra(imgs, t)
    g_re, g_im = shear_sum_planes(
        rre2, rim2, t["Wt"], t["SEre"], t["SEim"], sh["Phire"], sh["Phiim"],
        t["plane"],
    )
    out_slot = eval_shear(
        g_re, g_im, t["Wd"], t["TEre"], t["TEim"], sh["PhiDre"], sh["PhiDim"]
    )  # [P, Tp, D] in slot order (scale + masks folded into Wd)
    return permute_rows(out_slot, t["posfull"])[:, :T].astype(imgs.dtype)


def backproject_nodes_shear(cfg: GeometryConfig, sinos, tables):
    """Exact adjoint of :func:`project_nodes_shear`, composed by hand."""
    from dip_admm_tpu.ops.pallas.shear_sum import (
        eval_shear_t, shear_sum_planes_t,
    )

    t = tables
    sh = t["shared"]
    ob = _pad_unpermute(sinos.astype(jnp.float32), t)  # [P, Tp, D] slots
    g_re_bar, g_im_bar = eval_shear_t(
        ob, t["Wd"], t["TEre"], t["TEim"], sh["PhiDre"], sh["PhiDim"]
    )
    rre2_bar, rim2_bar = shear_sum_planes_t(
        g_re_bar, g_im_bar, t["Wt"], t["SEre"], t["SEim"],
        sh["Phire"], sh["Phiim"], t["plane"], t["pfirst"],
    )
    # Planes no angle block wrote are uninitialized kernel outputs.
    vis = t["pvisited"][:, :, None, None]
    rre2_bar = jnp.where(vis > 0, rre2_bar, 0.0)
    rim2_bar = jnp.where(vis > 0, rim2_bar, 0.0)
    return _plane_spectra_t(rre2_bar, rim2_bar, t, sinos.dtype)


def project_nodes_skew(cfg: GeometryConfig, imgs, tables, n_rows=None):
    """Batched forward projection [P, N, N] -> [P, T, D] via the SPATIAL
    skew row stage (mode "fft_skew", ``ops.pallas.shear_sum`` skew
    section): same factored shear tables as :func:`project_nodes_shear`,
    but the kernel eats raw image rows — the tap matmul runs in the
    spatial domain, the phase combine becomes shifted adds, and the
    DFT-back happens in-kernel, so the row rfft stage disappears. Exact
    same operator (equivalence tested). Parallel beam only."""
    if cfg.fan_beam:
        raise NotImplementedError("fft_skew supports parallel beam only")
    from dip_admm_tpu.ops.pallas.filter_mxu import permute_rows
    from dip_admm_tpu.ops.pallas.shear_sum import eval_shear, skew_sum_planes

    t = tables
    sh = t["shared"]
    T = max(cfg.angles_per_node()) if n_rows is None else n_rows
    dtype = imgs.dtype
    imgs = imgs.astype(jnp.float32)
    rows2 = jnp.stack([imgs, imgs.transpose(0, 2, 1)], axis=1)  # [P,2,N,N]
    g_re, g_im = skew_sum_planes(
        rows2, t["WtT"], t["SEre"], t["SEim"], sh["Dre"], sh["Dim"],
        t["plane"],
    )
    out_slot = eval_shear(
        g_re, g_im, t["Wd"], t["TEre"], t["TEim"], sh["PhiDre"], sh["PhiDim"]
    )  # [P, Tp, D] in slot order (scale + masks folded into Wd)
    return permute_rows(out_slot, t["posfull"])[:, :T].astype(dtype)


def backproject_nodes_skew(cfg: GeometryConfig, sinos, tables):
    """Exact adjoint of :func:`project_nodes_skew`, composed by hand."""
    from dip_admm_tpu.ops.pallas.shear_sum import (
        eval_shear_t, skew_sum_planes_t,
    )

    t = tables
    sh = t["shared"]
    ob = _pad_unpermute(sinos.astype(jnp.float32), t)  # [P, Tp, D] slots
    g_re_bar, g_im_bar = eval_shear_t(
        ob, t["Wd"], t["TEre"], t["TEim"], sh["PhiDre"], sh["PhiDim"]
    )
    rows2_bar = skew_sum_planes_t(
        g_re_bar, g_im_bar, t["WtT"], t["SEre"], t["SEim"],
        sh["DreT"], sh["DimT"], t["plane"], t["pfirst"],
    )
    # Planes no angle block wrote are uninitialized kernel outputs.
    vis = t["pvisited"][:, :, None, None]
    rows2_bar = jnp.where(vis > 0, rows2_bar, 0.0)
    return (
        rows2_bar[:, 0] + rows2_bar[:, 1].transpose(0, 2, 1)
    ).astype(sinos.dtype)


def project_nodes_skew_rowshard(cfg: GeometryConfig, imgs, tables,
                                axis_name: str, n_rows=None):
    """Pixel-axis COMPUTE sharding of the skew projector (VERDICT r3 #4):
    each shard of a mesh axis ``axis_name`` applies only ITS row blocks of
    the factored tables (``Wt``/``SEre``/``SEim`` pre-sliced along the NB
    axis by the shard_map in_specs) to its slice of the (replicated) image
    planes, and one psum of the tiny slot-spectrum pair [P, Tp, F]
    completes the forward. The tap matmuls — the dominant FLOPs of the
    projector — divide by the pixel mesh size; the eval tail stays
    replicated (it is latency/HBM-bound and small). Tables also shard,
    dividing their per-device HBM."""
    from dip_admm_tpu.ops.pallas.filter_mxu import permute_rows
    from dip_admm_tpu.ops.pallas.shear_sum import eval_shear, skew_sum_planes

    t = tables
    sh = t["shared"]
    T = max(cfg.angles_per_node()) if n_rows is None else n_rows
    dtype = imgs.dtype
    NB_loc, nb = t["WtT"].shape[1], t["WtT"].shape[-1]
    imgs = imgs.astype(jnp.float32)
    rows2 = jnp.stack([imgs, imgs.transpose(0, 2, 1)], axis=1)  # [P,2,N,N]
    r0 = jax.lax.axis_index(axis_name) * (NB_loc * nb)
    rows2_loc = jax.lax.dynamic_slice_in_dim(rows2, r0, NB_loc * nb, axis=2)
    g_re, g_im = skew_sum_planes(
        rows2_loc, t["WtT"], t["SEre"], t["SEim"], sh["Dre"], sh["Dim"],
        t["plane"],
    )
    g_re = jax.lax.psum(g_re, axis_name)
    g_im = jax.lax.psum(g_im, axis_name)
    out_slot = eval_shear(
        g_re, g_im, t["Wd"], t["TEre"], t["TEim"], sh["PhiDre"], sh["PhiDim"]
    )
    return permute_rows(out_slot, t["posfull"])[:, :T].astype(dtype)


def backproject_nodes_skew_rowshard(cfg: GeometryConfig, sinos, tables,
                                    axis_name: str):
    """Exact adjoint of :func:`project_nodes_skew_rowshard`: replicated
    eval-tail transpose, row-sharded tap-matmul transpose (each shard
    produces its row blocks of both planes), then one tiled all_gather
    along the pixel axis reassembles the full image."""
    from dip_admm_tpu.ops.pallas.shear_sum import (
        eval_shear_t, skew_sum_planes_t_rows,
    )

    t = tables
    sh = t["shared"]
    N = cfg.N
    ob = _pad_unpermute(sinos.astype(jnp.float32), t)  # [P, Tp, D] slots
    g_re_bar, g_im_bar = eval_shear_t(
        ob, t["Wd"], t["TEre"], t["TEim"], sh["PhiDre"], sh["PhiDim"]
    )
    rows2_bar_loc = skew_sum_planes_t_rows(
        g_re_bar, g_im_bar, t["WtT"], t["SEre"], t["SEim"],
        sh["DreT"], sh["DimT"], t["plane"], t["pfirst"],
        jnp.zeros((1, N), jnp.float32),  # rowmark: full image row width
    )  # [P, 2, NB_loc*nb, N]
    vis = t["pvisited"][:, :, None, None]
    rows2_bar_loc = jnp.where(vis > 0, rows2_bar_loc, 0.0)
    rows2_bar = jax.lax.all_gather(
        rows2_bar_loc, axis_name, axis=2, tiled=True
    )  # [P, 2, N, N] (shards own consecutive row blocks in device order)
    return (
        rows2_bar[:, 0] + rows2_bar[:, 1].transpose(0, 2, 1)
    ).astype(sinos.dtype)


def project_nodes_mxu(cfg: GeometryConfig, imgs, tables):
    """Batched forward projection [P, N, N] -> [P, T, D] on MXU-layout
    tables (:func:`precompute_merged_mxu`): DFT matmuls + the MXU filter-sum
    kernel + slot unpermute + hat evaluation. Parallel beam only."""
    if cfg.fan_beam:
        raise NotImplementedError("fft_mxu supports parallel beam only")
    from dip_admm_tpu.ops.pallas.filter_mxu import filter_sum_mxu, permute_rows

    t = tables
    T = t["p"].shape[-2]
    rre2, rim2 = _plane_spectra(imgs, t)
    rre_s = _ein32("ponf,pto->ptnf", rre2, t["onehot"])
    rim_s = _ein32("ponf,pto->ptnf", rim2, t["onehot"])
    g_re, g_im = filter_sum_mxu(rre_s, rim_s, t["Hre_t"], t["Him_t"])
    g_re = permute_rows(g_re, t["posfull"])[:, :T]
    g_im = permute_rows(g_im, t["posfull"])[:, :T]
    return _eval_tail(g_re, g_im, t, imgs.dtype)


def backproject_nodes_mxu(cfg: GeometryConfig, sinos, tables):
    """Exact adjoint of :func:`project_nodes_mxu`, composed by hand."""
    from dip_admm_tpu.ops.pallas.filter_mxu import filter_sum_mxu_t

    t = tables
    g_re_bar, g_im_bar = _eval_tail_t(sinos, t)
    g_re_bar = _pad_unpermute(g_re_bar, t)
    g_im_bar = _pad_unpermute(g_im_bar, t)
    rre_s_bar, rim_s_bar = filter_sum_mxu_t(
        g_re_bar, g_im_bar, t["Hre_t"], t["Him_t"], t["onehot"]
    )
    rre2_bar = _ein32("ptnf,pto->ponf", rre_s_bar, t["onehot"])
    rim2_bar = _ein32("ptnf,pto->ponf", rim_s_bar, t["onehot"])
    return _plane_spectra_t(rre2_bar, rim2_bar, t, sinos.dtype)


def backproject(
    cfg: GeometryConfig,
    sino: jnp.ndarray,
    angles: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    tables=None,
) -> jnp.ndarray:
    """Exact adjoint of :func:`project` (transposed FFTs + matmuls)."""
    N = cfg.N
    if tables is None:
        tables = precompute_phases(cfg, angles, valid)
    f = lambda x: project(cfg, x, angles, valid, tables)
    (out,) = jax.linear_transpose(f, jnp.zeros((N, N), sino.dtype))(sino)
    return out


def colnorms_sq(
    cfg: GeometryConfig,
    angles: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    block: int = 4,
    dets=None,
) -> jnp.ndarray:
    """Exact W[p] = ||A[:, p]||^2 for the composite-kernel operator,
    computed in the frequency domain (setup-time: seconds at 512^2 instead
    of minutes for the old [D, N, N]-block-per-angle scan).

    Each ray's composite weight on pixel (a, i) is the 2x2-tap product
    w = sum_r hv_r(l) hat(v_r(l) + sigma_{t,a} - i). Squaring and summing
    over detectors l collapses the detector axis into three v-indexed
    sequences (the squared/cross tap scatters)

        c0[v] = sum_l s^2 (1-fp_l)^2 [v0_l = v],   c1, c2 likewise,

    and the remaining pixel dependence is a <=2-tap circular READ of those
    sequences at integer shifts k(t, a) = floor(sigma) — which is a phase
    multiply in frequency space, exactly like the projector's row shears:

        W_t[a, :] = irfft( c0^ H1 + c1^ H2 + c2^ H3 )(a),
        H1 = (1-fr)^2 e^{-iwk} + fr^2 e^{-iw(k+1)},
        H2 = 2 fr (1-fr) e^{-iw(k+1)},
        H3 = (1-fr)^2 e^{-iw(k+1)} + fr^2 e^{-iwk}.

    Circularity matches the projector's own alias-free padded window, so
    this is the exact diag(A^T A) of the operator in use (brute-force
    oracle tests). ``dets`` overrides the uniform detector grid (fan
    rebinning path). ``block``: angles per scan step."""
    if cfg.fan_beam:
        raise NotImplementedError
    N, D = cfg.N, cfg.n_det
    Np = _padded_len(N, D)
    F = Np // 2 + 1
    (Pr, Br, Cr, sr), (Pc, Bc, Cc, sc), use_r = _coeffs(cfg, angles, dets)
    T = angles.shape[0]
    vmask = (
        jnp.ones((T,), jnp.float32)
        if valid is None
        else valid.astype(jnp.float32)
    )

    # Branch-select the coefficients once (scalar/vector level).
    selr = use_r
    Pv = jnp.where(selr[:, None], Pr, Pc)  # [T, D]
    B = jnp.where(selr, Br, Bc)
    C = jnp.where(selr, Cr, Cc)
    sc_ = jnp.where(selr, sr, sc)

    a_idx = jnp.arange(N, dtype=jnp.float32)
    v_idx = jnp.arange(Np, dtype=jnp.int32)
    f_idx = jnp.arange(F, dtype=jnp.float32)
    ang_f = (2.0 * jnp.pi / Np) * f_idx

    def one_angle(t):
        # Detector-axis collapse into integer-indexed sequences: with
        # y = i - k_a,   sum_l w^2 = (1-fr)^2 G0[y] + 2fr(1-fr) G1[y]
        #                           + fr^2 G0[y-1],
        # G0[y] = sum_l s^2 hat(p_l - y)^2  (taps (1-fp)^2 at v0, fp^2 at
        # v0+1), G1[y] = sum_l s^2 hat(p_l-y)hat(p_l-y+1) (tap fp(1-fp)
        # at v0+1).
        pl_ = Pv[t]  # [D]
        v0 = jnp.floor(pl_).astype(jnp.int32) % Np
        fp = (pl_ - jnp.floor(pl_)).astype(jnp.float32)
        s2 = (sc_[t] * sc_[t]) * vmask[t]
        oh0 = (v0[None, :] == v_idx[:, None]).astype(jnp.float32)  # [Np, D]
        oh1 = (((v0 + 1) % Np)[None, :] == v_idx[:, None]).astype(
            jnp.float32
        )
        G0 = oh0 @ (s2 * (1.0 - fp) ** 2) + oh1 @ (s2 * fp * fp)
        G1 = oh1 @ (s2 * fp * (1.0 - fp))
        G0h = jnp.fft.rfft(G0)
        G1h = jnp.fft.rfft(G1)

        sig = B[t] * a_idx + C[t]  # [N]
        k = jnp.floor(sig)
        fr = (sig - k).astype(jnp.float32)
        ek = jnp.exp(-1j * ang_f[None, :] * k[:, None])  # [N, F]
        e1 = jnp.exp(-1j * ang_f)[None, :] * ek  # e^{-iw(k+1)}
        w0 = (1.0 - fr)[:, None] ** 2
        w2 = (fr * fr)[:, None]
        wx = (2.0 * fr * (1.0 - fr))[:, None]
        What = G0h[None, :] * (w0 * ek + w2 * e1) + G1h[None, :] * (wx * ek)
        Wt = jnp.fft.irfft(What, n=Np, axis=1)[:, :N]  # [a, i]
        return jnp.where(selr[t], Wt, Wt.T)

    def body(carry, t):
        return carry + one_angle(t), None

    W0 = jnp.zeros((N, N), jnp.float32)
    W, _ = jax.lax.scan(body, W0, jnp.arange(T))
    return W
