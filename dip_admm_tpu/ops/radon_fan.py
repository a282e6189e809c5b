"""Gather-free fan-beam projector via parallel-beam rebinning.

Completes the matrix-free operator family for the fan-beam configuration
(BASELINE.json config 5: 512^2 fan-beam) without gathers: a flat-detector
fan ray (source angle beta, detector offset d) is exactly the parallel-beam
ray at

    theta = beta + gamma - pi/2,     s = -R_src * sin(gamma),
    gamma = atan(d / (R_src + R_det)),

so the fan sinogram is an *angular resampling* of a parallel sinogram
evaluated on the nonuniform detector grid {s_l}:

  1. parallel-project with the FFT-shear projector (``ops.radon_fft``, which
     accepts explicit detector positions) at T_p = T_fan/2 uniform angles,
  2. extend to a 2*pi-periodic sinogram with the flip identity
     p(theta + pi, s) = p(theta, -s) (exact for the symmetric grid),
  3. shift each detector column along the angle axis by gamma_l/dbeta —
     an exact-linear-interp circular shift done with one rFFT/irFFT pair and
     a per-column phase filter (the same machinery as the row shears).

The composed operator is linear with an automatic exact adjoint; accuracy vs
the per-ray gather Joseph fan projector is a few percent (angular linear
interpolation + the composite in-row kernel), verified by tests. Requires an
even fan angle count per node (the flip identity pairs the half-turns).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dip_admm_tpu.config import GeometryConfig
from dip_admm_tpu.ops import radon, radon_fft


def _parallel_cfg(cfg: GeometryConfig) -> GeometryConfig:
    import dataclasses

    return dataclasses.replace(cfg, fan_beam=False)


def precompute_fan(
    cfg: GeometryConfig,
    beta: jnp.ndarray,
    valid=None,
    table_dtype=jnp.float32,
):
    """Tables for :func:`project`: the parallel-stage phase tables on the
    rebinned detector grid plus the per-column angular shift filter."""
    assert cfg.fan_beam
    m = beta.shape[0]
    if m % 2 != 0:
        raise ValueError("fan rebinning needs an even angle count per node")
    T_p = m // 2
    D = cfg.n_det
    dets = jnp.asarray(
        radon.detector_centers(D, cfg.det_width_factor * 2.0), jnp.float32
    )
    gamma = jnp.arctan(dets / (cfg.src_radius + cfg.det_radius))  # [D]
    s_l = -cfg.src_radius * jnp.sin(gamma)

    theta = (jnp.arange(T_p, dtype=jnp.float32) + 0.5) * (jnp.pi / T_p)
    par = radon_fft.precompute_phases(
        _parallel_cfg(cfg), theta, valid=None, table_dtype=table_dtype,
        dets=s_l,
    )

    # Column shift in beta-index units; the fan beta grid must be the
    # uniform (j+0.5)*2*pi/m grid (node_angles provides exactly that).
    dbeta = 2.0 * jnp.pi / m
    shift = (gamma - jnp.pi / 2.0) / dbeta  # [D]
    k = jnp.floor(shift)
    fr = shift - k
    F = T_p + 1  # rfft length of the 2*T_p-periodic angle axis
    f = jnp.arange(F, dtype=jnp.float32)
    ang = (2.0 * jnp.pi / m) * f
    base = jnp.exp(1j * ang[None, :] * k[:, None])  # [D, F]
    tap = (1.0 - fr)[:, None] + fr[:, None] * jnp.exp(1j * ang[None, :])
    R = (base * tap).astype(jnp.complex64)
    tables = dict(par)
    tables["rebin_re"] = jnp.real(R).astype(table_dtype)
    tables["rebin_im"] = jnp.imag(R).astype(table_dtype)
    if valid is not None:
        tables["fan_valid"] = valid.astype(jnp.float32)
    return tables


def colnorms_sq(cfg: GeometryConfig, beta: jnp.ndarray, valid=None):
    """W[p] = ||A[:, p]||^2 for the rebinned fan operator.

    Exact column norms of the parallel stage evaluated on the rebinned
    geometry (theta grid over [0, pi), detector positions s_l), treating the
    angular rebin filter as norm-preserving per detector column (exact for
    integer shifts; the fractional linear-interp tap attenuates only the
    highest angular frequencies, a few-%% effect). Replaces the 2-tap
    gather heuristic previously used for fan precision weights
    (ref weights semantics: ``block_3_graph_and_precisions.py:21-24``)."""
    assert cfg.fan_beam
    m = beta.shape[0]
    T_p = m // 2
    D = cfg.n_det
    dets = jnp.asarray(
        radon.detector_centers(D, cfg.det_width_factor * 2.0), jnp.float32
    )
    gamma = jnp.arctan(dets / (cfg.src_radius + cfg.det_radius))
    s_l = -cfg.src_radius * jnp.sin(gamma)
    theta = (jnp.arange(T_p, dtype=jnp.float32) + 0.5) * (jnp.pi / T_p)
    del valid  # rebinning requires the full uniform beta grid
    # Factor 2: the 2*pi periodization duplicates every parallel sample
    # (p2 = concat([p, p[:, ::-1]])) before the norm-preserving phase shift.
    return 2.0 * radon_fft.colnorms_sq(_parallel_cfg(cfg), theta, dets=s_l)


def project(
    cfg: GeometryConfig,
    img: jnp.ndarray,
    beta: jnp.ndarray,
    valid=None,
    tables=None,
) -> jnp.ndarray:
    """Fan forward projection [N, N] x [T_fan] -> [T_fan, D]."""
    if tables is None:
        tables = precompute_fan(cfg, beta, valid)
    t = tables
    p = radon_fft._branch_apply(img, t["Hre_r"], t["Him_r"], t["p_r"], t["s_r"])
    p = p + radon_fft._branch_apply(
        img.T, t["Hre_c"], t["Him_c"], t["p_c"], t["s_c"]
    )  # [T_p, D]
    p2 = jnp.concatenate([p, p[:, ::-1]], axis=0)  # [2 T_p, D], 2*pi-periodic
    m = p2.shape[0]
    phat = jnp.fft.rfft(p2, axis=0)  # [F, D]
    Rre = t["rebin_re"].T.astype(jnp.float32)  # [F, D]
    Rim = t["rebin_im"].T.astype(jnp.float32)
    out_hat = jax.lax.complex(
        jnp.real(phat) * Rre - jnp.imag(phat) * Rim,
        jnp.real(phat) * Rim + jnp.imag(phat) * Rre,
    )
    out = jnp.fft.irfft(out_hat, n=m, axis=0).astype(img.dtype)  # [T_fan, D]
    if "fan_valid" in t:
        out = out * t["fan_valid"][:, None]
    elif valid is not None:
        out = jnp.where(valid[:, None], out, 0.0)
    return out


def backproject(
    cfg: GeometryConfig,
    sino: jnp.ndarray,
    beta: jnp.ndarray,
    valid=None,
    tables=None,
) -> jnp.ndarray:
    """Exact adjoint of :func:`project`."""
    N = cfg.N
    if tables is None:
        tables = precompute_fan(cfg, beta, valid)
    f = lambda x: project(cfg, x, beta, valid, tables)
    (out,) = jax.linear_transpose(f, jnp.zeros((N, N), sino.dtype))(sino)
    return out
