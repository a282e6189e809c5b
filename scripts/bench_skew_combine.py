"""A/B microbench: fft_shear row-stage phase combine vs spatial skew-sum.

The shear row kernel (ops/pallas/shear_sum.py) computes, per
(angle-block, row-block):

    MXU : S[t,d,f] = sum_n Wt[t,d,n] * R[n,f]     (R = complex row spectra)
    VPU : g[t,f]   = E[t,f] * sum_d Phi[d,f] * S[t,d,f]

The VPU phase combine (~8 flops/(d,f)) was measured ~1.9 TFLOP/s at 512^2 —
the stage's wall (NEXT.md #1). The spatial alternative keeps the SAME tap
tables but applies them to raw zero-padded image rows:

    MXU : sigma[t,d,u] = sum_n Wt[t,d,n] * x[n,u]   (u < N + margin, REAL)
    ---  : z[t,v]      = sum_d sigma[t,d,v-d]        (anti-diagonal skew sum)
    MXU : g[t,f]       = E[t,f] * sum_v z[t,v] W^{fv} (DFT-back, [Wz,F] mat)

On paper this is a large win: the spatial matmul contracts ~N+D2 real
columns instead of 2F complex ones (~3.2x fewer MACs at 512^2: Np=2048,
F=1025, spatial width 640), the combine becomes pure adds, and the
DFT-back adds ~5%. The open question (NEXT.md: "wins iff Mosaic lowers the
lane-unaligned reshape well") is the cost of the skew's data movement.
This script measures three kernels at the production 512^2/8 block shapes
(tt=32, D2=144, nb=128, F=1025), each INCLUDING its producing matmul and
streaming the Wt blocks from HBM like the real kernel:

  control    : spectra matmul + phase combine + SE fma  (current algorithm)
  skew_slices: spatial matmul + per-d static shifted adds + DFT-back + fma
  skew_reshape: spatial matmul + the stride-(Wp-1) reshape trick + DFT-back

Usage: PYTHONPATH=. python scripts/bench_skew_combine.py [CHAIN]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 512^2/8 production shapes (plan tt=32; D2 = roundup(nb+2, 16)).
TT, D2, NB_ROWS, F, NP = 32, 144, 128, 1025, 2048
N_IMG = 512
WS = 640        # spatial matmul width: N + margin (>= N + dc headroom)
WZ = 896        # padded skew output width (>= WS + D2 - 1, mult of 128)
Q = 192         # blocks per apply at 512^2/8: P(8) * NB(4) * TB(6)
DC = 16         # d-chunk for the spatial sigma (bounds VMEM)


def _control_kernel(wt_ref, rre_ref, rim_ref, phre_ref, phim_ref,
                    sere_ref, seim_ref, gre_ref, gim_ref):
    W2 = wt_ref[0].reshape(TT * D2, NB_ROWS)
    for f0, fw in [(0, 256), (256, 256), (512, 256), (768, F - 768)]:
        rre = rre_ref[:, f0:f0 + fw].astype(jnp.bfloat16)
        rim = rim_ref[:, f0:f0 + fw].astype(jnp.bfloat16)
        Sre = jnp.dot(W2, rre, preferred_element_type=jnp.float32)
        Sim = jnp.dot(W2, rim, preferred_element_type=jnp.float32)
        Sre = Sre.reshape(TT, D2, fw)
        Sim = Sim.reshape(TT, D2, fw)
        phre = phre_ref[:, f0:f0 + fw][None]
        phim = phim_ref[:, f0:f0 + fw][None]
        Tre = jnp.sum(Sre * phre - Sim * phim, axis=1)
        Tim = jnp.sum(Sre * phim + Sim * phre, axis=1)
        ere = sere_ref[0, :, f0:f0 + fw]
        eim = seim_ref[0, :, f0:f0 + fw]
        gre_ref[0, :, f0:f0 + fw] = Tre * ere - Tim * eim
        gim_ref[0, :, f0:f0 + fw] = Tre * eim + Tim * ere


def _skew_core(wt_ref, x_ref, z_acc, *, reshape_trick: bool):
    """sigma = Wt @ x in d-chunks, skew-accumulated into z_acc [TT, WZ]."""
    z_acc[:] = jnp.zeros_like(z_acc)
    x = x_ref[:].astype(jnp.bfloat16)  # [nb, WS]
    for d0 in range(0, D2, DC):
        Wc = wt_ref[0, :, d0:d0 + DC, :].reshape(TT * DC, NB_ROWS)
        sig = jnp.dot(Wc, x, preferred_element_type=jnp.float32)
        sig = sig.reshape(TT, DC, WS)
        if reshape_trick:
            # view[t, j, v] = sig[t, j, v - j]: row stride WS read back at
            # stride WS-1 (garbage reads land in sigma's zero tail).
            flat = sig.reshape(TT, DC * WS)
            view = flat[:, : DC * (WS - 1)].reshape(TT, DC, WS - 1)
            part = jnp.sum(view, axis=1)  # [TT, WS-1]
            z_acc[:, d0:d0 + WS - 1] += part
        else:
            for j in range(DC):
                d = d0 + j
                z_acc[:, d:d + WS] += sig[:, j, :]


def _skew_kernel_factory(reshape_trick: bool):
    def kernel(wt_ref, x_ref, dre_ref, dim_ref, sere_ref, seim_ref,
               gre_ref, gim_ref, z_acc):
        _skew_core(wt_ref, x_ref, z_acc, reshape_trick=reshape_trick)
        zb = z_acc[:].astype(jnp.bfloat16)
        Tre = jnp.dot(zb, dre_ref[:], preferred_element_type=jnp.float32)
        Tim = jnp.dot(zb, dim_ref[:], preferred_element_type=jnp.float32)
        ere = sere_ref[0]
        eim = seim_ref[0]
        gre_ref[0] = Tre * ere - Tim * eim
        gim_ref[0] = Tre * eim + Tim * ere

    return kernel


def _mk_inputs(key):
    ks = jax.random.split(key, 8)
    wt = jax.random.normal(ks[0], (Q, TT, D2, NB_ROWS), jnp.bfloat16)
    rre = jax.random.normal(ks[1], (NB_ROWS, F), jnp.float32)
    rim = jax.random.normal(ks[2], (NB_ROWS, F), jnp.float32)
    phre = jax.random.normal(ks[3], (D2, F), jnp.float32)
    phim = jax.random.normal(ks[4], (D2, F), jnp.float32)
    se = jax.random.normal(ks[5], (Q, TT, F), jnp.float32)
    # Spatial rows: nonzero only in [0, N_IMG) — the zero tail absorbs the
    # reshape trick's wrapped reads.
    x = jax.random.normal(ks[6], (NB_ROWS, WS), jnp.float32)
    x = x * (jnp.arange(WS) < N_IMG)[None, :]
    dre = jax.random.normal(ks[7], (WZ, F), jnp.bfloat16)
    dim = jax.random.normal(ks[0], (WZ, F), jnp.bfloat16)
    return wt, rre, rim, phre, phim, se, x, dre, dim


def _control_call(wt, rre, rim, phre, phim, se_re, se_im):
    blk = lambda *shape: pl.BlockSpec(shape, lambda q: (q,) + (0,) * (len(shape) - 1), memory_space=pltpu.VMEM)  # noqa: E731
    full = lambda *shape: pl.BlockSpec(shape, lambda q: (0,) * len(shape), memory_space=pltpu.VMEM)  # noqa: E731
    return pl.pallas_call(
        _control_kernel,
        grid=(Q,),
        in_specs=[blk(1, TT, D2, NB_ROWS), full(NB_ROWS, F), full(NB_ROWS, F),
                  full(D2, F), full(D2, F), blk(1, TT, F), blk(1, TT, F)],
        out_specs=(blk(1, TT, F), blk(1, TT, F)),
        out_shape=(jax.ShapeDtypeStruct((Q, TT, F), jnp.float32),) * 2,
    )(wt, rre, rim, phre, phim, se_re, se_im)


def _skew_call(kernel, wt, x, dre, dim, se_re, se_im):
    blk = lambda *shape: pl.BlockSpec(shape, lambda q: (q,) + (0,) * (len(shape) - 1), memory_space=pltpu.VMEM)  # noqa: E731
    full = lambda *shape: pl.BlockSpec(shape, lambda q: (0,) * len(shape), memory_space=pltpu.VMEM)  # noqa: E731
    return pl.pallas_call(
        kernel,
        grid=(Q,),
        in_specs=[blk(1, TT, D2, NB_ROWS), full(NB_ROWS, WS),
                  full(WZ, F), full(WZ, F), blk(1, TT, F), blk(1, TT, F)],
        out_specs=(blk(1, TT, F), blk(1, TT, F)),
        out_shape=(jax.ShapeDtypeStruct((Q, TT, F), jnp.float32),) * 2,
        scratch_shapes=[pltpu.VMEM((TT, WZ), jnp.float32)],
    )(wt, x, dre, dim, se_re, se_im)


@functools.partial(jax.jit, static_argnames=("which", "chain"))
def _chain(which, chain, wt, rre, rim, phre, phim, se, x, dre, dim):
    acc = jnp.float32(0.0)
    for _ in range(chain):
        w = wt + acc.astype(wt.dtype) * 0
        if which == "control":
            a, b = _control_call(w, rre, rim, phre, phim, se, se)
        else:
            k = _skew_kernel_factory(which == "skew_reshape")
            a, b = _skew_call(k, w, x, dre, dim, se, se)
        acc = acc + jnp.sum(a[..., :1]) + jnp.sum(b[..., :1])
    return acc


def main():
    chain = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    args = _mk_inputs(jax.random.PRNGKey(0))
    for which in ("control", "skew_slices", "skew_reshape"):
        try:
            float(_chain(which, 2, *args))  # compile
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(_chain(which, chain, *args))
                best = min(best, (time.perf_counter() - t0) / chain)
            print(f"{which:13s}: {best * 1e3:8.3f} ms per {Q}-block sweep",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — report which variant fails
            print(f"{which:13s}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
