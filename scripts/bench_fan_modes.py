"""A/B the fan-beam projector modes (fft_grouped vs fft_skew) at scale:
chain-timed forward/adjoint apply pair (the per-inner-iteration operator
cost) plus table build time. VERDICT r3 #3: 512^2/32 fan <= 12 ms/inner
target (grouped measured 15.0 in round 3)."""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp

from dip_admm_tpu.config import GeometryConfig
from dip_admm_tpu.ops import radon, radon_fan


@functools.partial(jax.jit, static_argnames=("geo", "mode", "chain"))
def _pair_chain(geo, mode, chain, imgs, tables):
    fn_f = (radon_fan.project_nodes_fan_grouped if mode == "fft_grouped"
            else radon_fan.project_nodes_fan_skew)
    fn_a = (radon_fan.backproject_nodes_fan_grouped if mode == "fft_grouped"
            else radon_fan.backproject_nodes_fan_skew)
    acc = jnp.float32(0.0)
    x = imgs
    for _ in range(chain):
        s = fn_f(geo, x + acc * 1e-20, tables)
        y = fn_a(geo, s, tables)
        acc = acc + jnp.sum(y[..., :1].astype(jnp.float32))
        x = imgs
    return acc


def main(N=512, P=32, chain=20, reps=3):
    geo = GeometryConfig(
        N=N, num_nodes=P, fan_beam=True,
        det_width_factor=2.0, src_radius=4.0, det_radius=4.0,
    )
    angles_np, valid_np, _ = radon.node_angles(geo)
    beta = jnp.asarray(angles_np, jnp.float32)
    valid = jnp.asarray(valid_np)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (P, N, N), jnp.float32)
    float((jnp.ones((8, 8)) @ jnp.ones((8, 8))).sum())
    for mode in ("fft_grouped", "fft_skew"):
        t0 = time.perf_counter()
        if mode == "fft_grouped":
            tables = radon_fan.precompute_fan_grouped(
                geo, beta, valid, jnp.bfloat16)
        else:
            tables = radon_fan.precompute_fan_skew(
                geo, beta, valid, jnp.bfloat16)
        jax.block_until_ready(tables)
        build = time.perf_counter() - t0
        float(_pair_chain(geo, mode, chain, imgs, tables))  # compile
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(_pair_chain(geo, mode, chain, imgs, tables))
            best = min(best, time.perf_counter() - t0)
        print(f"{mode:12s} build={build:6.1f}s apply-pair="
              f"{best/chain*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    a = [int(v) for v in sys.argv[1:]]
    main(*a)
