"""Pallas TPU kernel for the projector's hat-weight evaluation stage.

The last stage of the FFT-shear projector evaluates the per-angle summed
profile g[t, :] at the detector coordinates p[t, d] through a 2-tap hat:

    out[p, t, d] = s[p, t] * sum_v max(0, 1 - |pc[p, t, d] - v|) * g[p, t, v]

As an XLA einsum this materializes the weight tensor w [P, T, D, Np]
(~0.8 GB at 256^2/8 nodes) in HBM per application. Here the weights are
rebuilt from iota arithmetic inside the kernel (VPU) and reduced in VMEM —
the stage's HBM traffic drops to g + out (a few MB).

The adjoint (scatter detector cotangents back onto the profile grid,
g_bar[t, v] = s_t * sum_d w[t, d, v] * out_bar[t, d]) has the same
structure with the reduction over d and is exposed as the explicit entry
point :func:`hat_eval_t` (``ops.radon_fft`` composes projector adjoints by
hand). Both directions carry ``custom_vmap`` rules folding a scenario
batch into the node axis (geometry stays unbatched, indexed ``p % P``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import custom_batching
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick(dim: int, want: int, mult: int = 8) -> int:
    t = want
    while t >= mult:
        if dim % t == 0 and t % mult == 0:
            return t
        t //= 2
    return dim


def _fwd_kernel(g_ref, pc_ref, s_ref, out_ref):
    vb = pl.program_id(3)
    g = g_ref[0]  # [tt, vt]
    pc = pc_ref[0]  # [tt, dt]
    s = s_ref[0]  # [tt, 1]
    vt = g.shape[-1]
    # v tiled across the grid: bounds the w working set to [tt, dt, vt]
    # (the untiled [tt, dt, Np] temp is 8 MB at 512^2 — VMEM thrash).
    v0 = (vb * vt).astype(jnp.float32)
    v = v0 + jax.lax.broadcasted_iota(jnp.int32, (1, 1, vt), 2).astype(
        jnp.float32
    )
    w = jnp.maximum(0.0, 1.0 - jnp.abs(pc[:, :, None] - v))
    part = s * jnp.sum(w * g[:, None, :], axis=2)

    @pl.when(vb == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    out_ref[0] += part


def _t_kernel(ob_ref, pc_ref, s_ref, gb_ref):
    # d kept whole per block: tiling d (accumulating gb across an inner d
    # axis) measured 6x SLOWER at 512^2 — the [tt, D, vt] temp (2 MB)
    # pipelines fine, unlike the forward kernel's untiled 8 MB one.
    vb = pl.program_id(2)
    ob = ob_ref[0]  # [tt, D]
    pc = pc_ref[0]  # [tt, D]
    s = s_ref[0]  # [tt, 1]
    vt = gb_ref.shape[-1]
    v0 = (vb * vt).astype(jnp.float32)
    v = v0 + jax.lax.broadcasted_iota(jnp.int32, (1, 1, vt), 2).astype(
        jnp.float32
    )
    w = jnp.maximum(0.0, 1.0 - jnp.abs(pc[:, :, None] - v))
    gb_ref[0] = jnp.sum(w * (s * ob)[:, :, None], axis=1)  # [tt, vt]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fwd_pallas(g, pc, s, interpret=False):
    P, T, D = pc.shape[0], pc.shape[1], pc.shape[-1]
    PB, _, Np = g.shape
    tt = _pick(T, 8)
    dt = _pick(D, 128, mult=128)
    vt = _pick(Np, 256, mult=128)
    grid = (PB, T // tt, D // dt, Np // vt)  # v innermost: accumulation
    g_spec = pl.BlockSpec((1, tt, vt), lambda p, tb, db, vb: (p, tb, vb),
                          memory_space=pltpu.VMEM)
    pc_spec = pl.BlockSpec((1, tt, dt), lambda p, tb, db, vb: (p % P, tb, db),
                           memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((1, tt, 1), lambda p, tb, db, vb: (p % P, tb, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, tt, dt), lambda p, tb, db, vb: (p, tb, db),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[g_spec, pc_spec, s_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((PB, T, D), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * PB * T * D * Np,
            bytes_accessed=(g.size + pc.size) * 4 * (D // dt) + PB * T * D * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(g, pc, s)


@functools.partial(jax.jit, static_argnames=("Np", "interpret"))
def _t_pallas(ob, pc, s, Np, interpret=False):
    P, T, D = pc.shape
    PB = ob.shape[0]
    tt = _pick(T, 8)
    vt = _pick(Np, 128, mult=128)
    grid = (PB, T // tt, Np // vt)
    ob_spec = pl.BlockSpec((1, tt, D), lambda p, tb, vb: (p, tb, 0),
                           memory_space=pltpu.VMEM)
    pc_spec = pl.BlockSpec((1, tt, D), lambda p, tb, vb: (p % P, tb, 0),
                           memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((1, tt, 1), lambda p, tb, vb: (p % P, tb, 0),
                          memory_space=pltpu.VMEM)
    gb_spec = pl.BlockSpec((1, tt, vt), lambda p, tb, vb: (p, tb, vb),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _t_kernel,
        grid=grid,
        in_specs=[ob_spec, pc_spec, s_spec],
        out_specs=gb_spec,
        out_shape=jax.ShapeDtypeStruct((PB, T, Np), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * PB * T * D * Np,
            bytes_accessed=(ob.size + pc.size) * 4 * (Np // vt)
            + PB * T * Np * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ob, pc, s)


def _interp() -> bool:
    return jax.default_backend() != "tpu"


@custom_batching.custom_vmap
def hat_eval(g, pc, s):
    """2-tap hat evaluation ``out[p,t,d] = s * sum_v hat(pc - v) g[p,t,v]``.
    g: [P, T, Np], pc: [P, T, D], s: [P, T, 1]. Adjoint:
    :func:`hat_eval_t`."""
    return _fwd_pallas(g, pc, s, interpret=_interp())


@hat_eval.def_vmap
def _hat_eval_vmap(axis_size, in_batched, g, pc, s):
    if not in_batched[0] or in_batched[1] or in_batched[2]:
        raise NotImplementedError(
            "hat_eval: vmap expects g batched, geometry unbatched"
        )
    gf = g.reshape((axis_size * g.shape[1],) + g.shape[2:])
    out = _fwd_pallas(gf, pc, s, interpret=_interp())
    return out.reshape((axis_size, -1) + out.shape[1:]), True


@custom_batching.custom_vmap
def hat_eval_t(ob, pc, s, np_marker):
    """Exact transpose of :func:`hat_eval` w.r.t. g: scatter detector
    cotangents back onto the profile grid. ``np_marker`` is any length-Np
    array carrying the (static) profile length. Output [P, T, Np]."""
    return _t_pallas(ob, pc, s, Np=np_marker.shape[-1], interpret=_interp())


@hat_eval_t.def_vmap
def _hat_eval_t_vmap(axis_size, in_batched, ob, pc, s, np_marker):
    if not in_batched[0] or in_batched[1] or in_batched[2]:
        raise NotImplementedError(
            "hat_eval_t: vmap expects the cotangent batched, geometry "
            "unbatched"
        )
    obf = ob.reshape((axis_size * ob.shape[1],) + ob.shape[2:])
    out = _t_pallas(obf, pc, s, Np=np_marker.shape[-1], interpret=_interp())
    return out.reshape((axis_size, -1) + out.shape[1:]), True


def hat_eval_reference(g, pc, s):
    """Plain-jnp reference (materializes w) for tests."""
    Np = g.shape[-1]
    v_idx = jnp.arange(Np, dtype=g.dtype)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(pc[..., None] - v_idx))
    return s * jnp.einsum("ptdv,ptv->ptd", w, g)
