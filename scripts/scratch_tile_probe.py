"""Scratch: probe filter_sum_sel timing vs tile shape on the TPU.

Measures the sel kernel (fwd+transpose, the normal-op pattern) at 256^2/8
for a few (tt, tn) tile choices by monkeypatching _tiles.
"""

import sys
import time

import jax
import jax.numpy as jnp

import dip_admm_tpu.ops.pallas.filter_sum as fs

N, P = 256, 8
T, NN, F = 96, N, 257  # per-node angles at 256^2/8; F = Np//2+1 (Np=1024)

key = jax.random.PRNGKey(0)
k1, k2, k3, k4, k5 = jax.random.split(key, 5)
Hre = jax.random.normal(k1, (P, T, NN, F), jnp.bfloat16)
Him = jax.random.normal(k2, (P, T, NN, F), jnp.bfloat16)
rre2 = jax.random.normal(k3, (P, 2, NN, F), jnp.float32)
rim2 = jax.random.normal(k4, (P, 2, NN, F), jnp.float32)
sel = (jax.random.uniform(k5, (P, T, 1)) > 0.5).astype(jnp.float32)

CHAIN = 10


def bench(tt, tn):
    orig = fs._tiles
    fs._tiles = lambda *a: (tt, tn)
    try:
        def run(rre2, rim2):
            def body(_, carry):
                rre2, rim2 = carry
                g_re, g_im = fs._fwd_sel_pallas(rre2, rim2, Hre, Him, sel)
                rb_re, rb_im = fs._t_sel_pallas(g_re, g_im, Hre, Him, sel)
                nrm = jnp.maximum(jnp.linalg.norm(rb_re), 1e-30)
                return rb_re / nrm, rb_im / nrm

            o = jax.lax.fori_loop(0, CHAIN, body, (rre2, rim2))
            return jnp.sum(o[0])

        runj = jax.jit(run)
        float(runj(rre2, rim2))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(runj(rre2, rim2))
            best = min(best, (time.perf_counter() - t0) / CHAIN)
        gb = Hre.size * 2 * 2 * 2  # re+im, fwd+adj reads, bf16
        print(f"tt={tt:3d} tn={tn:3d}: {best*1e3:7.3f} ms/normal-pair "
              f"({gb/best/1e9:.0f} GB/s eff)")
    finally:
        fs._tiles = orig


if __name__ == "__main__":
    print("backend:", jax.devices()[0].platform)
    import os
    cfgs = [tuple(map(int, c.split('x'))) for c in os.environ['CFGS'].split(',')]
    for tt, tn in cfgs:
        try:
            bench(tt, tn)
        except Exception as e:
            print(f"tt={tt} tn={tn}: FAILED {type(e).__name__}: {str(e)[:120]}")
