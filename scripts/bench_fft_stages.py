"""Stage-level timing of the FFT-shear projector on TPU: rfft, filter-sum
(XLA einsum vs Pallas kernel, f32 vs bf16 tables), irfft, and the hat-weight
evaluation matmul (f32 vs bf16 operands). Chained in-jit, scalar-reduced.

Usage: python scripts/bench_fft_stages.py [N] [P] [CHAIN]
"""

import sys
import time

import jax
import jax.numpy as jnp

from dip_admm_tpu.config import GeometryConfig, ProblemConfig
from dip_admm_tpu.data.loader import build_fft_tables
from dip_admm_tpu.ops import radon
from dip_admm_tpu.ops.pallas import filter_sum as fs


def chain_time(fn, x, chain, *consts):
    # ``consts`` (tables etc.) are passed as jit ARGUMENTS — closing over
    # multi-GB device arrays bakes them into the compile payload (CLAUDE.md).
    def run(x, *cs):
        def body(_, xx):
            y = fn(xx, *cs)
            return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30)

        return jnp.sum(jax.lax.fori_loop(0, chain, body, x))

    runj = jax.jit(run)
    float(runj(x, *consts))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(runj(x, *consts))
        best = min(best, (time.perf_counter() - t0) / chain)
    return best


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    P = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    chain = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    print(f"backend: {jax.devices()[0]}")
    cfg = ProblemConfig(geometry=GeometryConfig(N=N, num_nodes=P))
    geo = cfg.geometry
    angles_np, valid_np, _ = radon.node_angles(geo)
    angles = jnp.asarray(angles_np, jnp.float32)
    valid = jnp.asarray(valid_np)
    tabs = build_fft_tables(cfg, angles, valid)
    Hre, Him = tabs["Hre_r"], tabs["Him_r"]
    Pn, T, Nn, F = Hre.shape
    Np = 2 * (F - 1)
    D = geo.n_det
    print(f"H [P={Pn},T={T},N={Nn},F={F}]  Np={Np}")
    key = jax.random.PRNGKey(0)
    imgs = jax.random.normal(key, (P, N, Np), jnp.float32)
    rre = jax.random.normal(key, (P, N, F), jnp.float32)
    g = jax.random.normal(key, (P, T, Np), jnp.float32)
    ghat = jax.random.normal(key, (P, T, F), jnp.complex64)
    p_r = tabs["p_r"]

    t = chain_time(
        lambda x: jnp.pad(
            jnp.fft.rfft(x, axis=2).real, ((0, 0), (0, 0), (0, Np - F))
        ),
        imgs, chain,
    )
    print(f"rfft   [P,N,{Np}]          : {t*1e3:7.3f} ms")
    t = chain_time(
        lambda x: jnp.fft.irfft(jax.lax.complex(x, x), n=Np, axis=2)[..., :F],
        jnp.real(ghat), chain,
    )
    print(f"irfft  [P,T,{Np}]          : {t*1e3:7.3f} ms")

    for name, HR, HI in (
        ("f32 ", Hre, Him),
        ("bf16", Hre.astype(jnp.bfloat16), Him.astype(jnp.bfloat16)),
    ):
        pad_t = lambda o: jnp.pad(o, ((0, 0), (0, Nn - T), (0, 0)))
        t = chain_time(
            lambda r, hr, hi: pad_t(fs.filter_sum_reference(r, r, hr, hi)[0]),
            rre, chain, HR, HI,
        )
        print(f"filter-sum XLA    {name}   : {t*1e3:7.3f} ms")
        t = chain_time(
            lambda r, hr, hi: pad_t(fs._fwd_pallas(r, r, hr, hi)[0]),
            rre, chain, HR, HI,
        )
        print(f"filter-sum Pallas {name}   : {t*1e3:7.3f} ms")
    v_idx = jnp.arange(Np, dtype=jnp.float32)

    def eval_f32(gg, pr):
        w = jnp.maximum(0.0, 1.0 - jnp.abs(pr[..., None] - v_idx))
        o = jnp.einsum("ptdv,ptv->ptd", w, gg)
        return jnp.pad(o, ((0, 0), (0, 0), (0, Np - D)))

    def eval_bf16(gg, pr):
        w = jnp.maximum(0.0, 1.0 - jnp.abs(pr[..., None] - v_idx)).astype(
            jnp.bfloat16
        )
        o = jnp.einsum(
            "ptdv,ptv->ptd", w, gg.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        return jnp.pad(o, ((0, 0), (0, 0), (0, Np - D)))

    t = chain_time(eval_f32, g, chain, p_r)
    print(f"eval einsum f32  [P,T,{D}] : {t*1e3:7.3f} ms")
    t = chain_time(eval_bf16, g, chain, p_r)
    print(f"eval einsum bf16 [P,T,{D}] : {t*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
