"""Per-stage timing of the fft_shear projector pipeline on the TPU.

Times each stage of project_nodes_shear / backproject_nodes_shear by
chained in-jit loops (per-dispatch latency ~20 ms on this host, so the
chain must be long enough to amortize it). All device arrays enter the
jitted chain as ARGUMENTS — closing over them bakes multi-GB constants
into the compile request (HTTP 413 on the remote-compile relay).

Usage: PYTHONPATH=. python scripts/bench_shear_stages.py [N] [P] [CHAIN]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp

from dip_admm_tpu.config import GeometryConfig
from dip_admm_tpu.ops import radon, radon_fft
from dip_admm_tpu.ops.pallas.filter_mxu import permute_rows
from dip_admm_tpu.ops.pallas.shear_sum import (
    eval_shear, eval_shear_t, shear_sum, shear_sum_t,
    skew_sum_planes, skew_sum_planes_t,
)


@functools.partial(jax.jit, static_argnames=("fn", "chain"))
def _chain_run(fn, chain, args, tables):
    acc = jnp.float32(0.0)
    for _ in range(chain):
        # Serialize calls through a scalar token so XLA cannot elide them.
        tainted = tuple(a + acc * 1e-20 for a in args)
        out = fn(*tainted, tables)
        acc = acc + jax.tree.reduce(
            lambda s, x: s + jnp.sum(x[..., :1].astype(jnp.float32)),
            out, jnp.float32(0.0),
        )
    return acc


def time_chain(fn, args, tables, chain=50, reps=3):
    float(_chain_run(fn, chain, args, tables))  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(_chain_run(fn, chain, args, tables))
        best = min(best, time.perf_counter() - t0)
    return best / chain


# TPU v5e (the bench chip reports "TPU v5 lite") peaks, per the public
# "How to Scale Your Model" v5e tables: 197 TFLOP/s dense bf16 MXU,
# 819 GB/s HBM. The roofline columns report achieved fractions of both;
# f32 work runs below the bf16 MXU number, so MXU% is a lower bound there.
PEAK_BF16_FLOPS = 197e12
PEAK_HBM_BPS = 819e9


def stage_cost(fn, args, tables):
    """XLA-reported (flops, bytes accessed) for one stage application.

    Pallas stages carry explicit ``pl.CostEstimate``s (XLA cannot see into
    custom calls), so the totals include the kernels' analytic counts."""
    try:
        c = jax.jit(fn).lower(*args, tables).compile().cost_analysis()
        return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))
    except Exception:
        return 0.0, 0.0


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    P = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    chain = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    geo = GeometryConfig(N=N, num_nodes=P)
    angles_np, valid_np, _ = radon.node_angles(geo)
    angles = jnp.asarray(angles_np, jnp.float32)
    valid = jnp.asarray(valid_np)
    t = radon_fft.precompute_shear(geo, angles, valid, jnp.bfloat16)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (P, N, N))
    T = max(geo.angles_per_node())

    def spectra(im, t):
        return radon_fft._plane_spectra(im, t)

    def select(a, b, t):
        f = lambda r2: radon_fft._ein32("ponf,pto->ptnf", r2, t["onehot"])
        return f(a), f(b)

    def kernel(a, b, t):
        return shear_sum(a, b, t["Wt"], t["SEre"], t["SEim"],
                         t["shared"]["Phire"], t["shared"]["Phiim"])

    def tail(a, b, t):
        out = eval_shear(a, b, t["Wd"], t["TEre"], t["TEim"],
                         t["shared"]["PhiDre"], t["shared"]["PhiDim"])
        return (permute_rows(out, t["posfull"])[:, :T],)

    def full_fwd(im, t):
        return (radon_fft.project_nodes_shear(geo, im, t),)

    def tail_t(s, t):
        ob = radon_fft._pad_unpermute(s.astype(jnp.float32), t)
        return eval_shear_t(ob, t["Wd"], t["TEre"], t["TEim"],
                            t["shared"]["PhiDre"], t["shared"]["PhiDim"])

    def kernel_t(a, b, t):
        return shear_sum_t(a, b, t["Wt"], t["SEre"], t["SEim"],
                           t["shared"]["Phire"], t["shared"]["Phiim"], t["onehot"])

    def full_adj(s, t):
        return (radon_fft.backproject_nodes_shear(geo, s, t),)

    # Skew-path stages (mode "fft_skew", the production parallel-beam
    # default since round 3): the row kernel eats raw spatial rows.
    def skew_rows(im, t):
        im = im.astype(jnp.float32)
        return (jnp.stack([im, im.transpose(0, 2, 1)], axis=1),)

    def skew_row_stage(rows2, t):
        return skew_sum_planes(
            rows2, t["WtT"], t["SEre"], t["SEim"],
            t["shared"]["Dre"], t["shared"]["Dim"], t["plane"],
        )

    def skew_row_stage_t(a, b, t):
        return (skew_sum_planes_t(
            a, b, t["WtT"], t["SEre"], t["SEim"],
            t["shared"]["DreT"], t["shared"]["DimT"],
            t["plane"], t["pfirst"],
        ),)

    def full_fwd_skew(im, t):
        return (radon_fft.project_nodes_skew(geo, im, t),)

    def full_adj_skew(s, t):
        return (radon_fft.backproject_nodes_skew(geo, s, t),)

    rre2, rim2 = spectra(imgs, t)
    rre_s, rim_s = select(rre2, rim2, t)
    g_re, g_im = kernel(rre_s, rim_s, t)
    sino = full_fwd(imgs, t)[0]
    rows2 = skew_rows(imgs, t)[0]

    for name, fn, args in [
        ("plane_spectra", spectra, (imgs,)),
        ("onehot_select x2", select, (rre2, rim2)),
        ("shear_sum kernel", kernel, (rre_s, rim_s)),
        ("permute+eval_tail", tail, (g_re, g_im)),
        ("FULL forward", full_fwd, (imgs,)),
        ("eval_tail_t", tail_t, (sino,)),
        ("shear_sum_t", kernel_t, (g_re, g_im)),
        ("FULL adjoint", full_adj, (sino,)),
        ("skew row stage", skew_row_stage, (rows2,)),
        ("skew row stage T", skew_row_stage_t, (g_re, g_im)),
        ("FULL fwd (skew)", full_fwd_skew, (imgs,)),
        ("FULL adj (skew)", full_adj_skew, (sino,)),
    ]:
        ms = time_chain(fn, args, t, chain=chain) * 1e3
        flops, bbytes = stage_cost(fn, args, t)
        tf = flops / (ms * 1e-3) / 1e12
        gb = bbytes / (ms * 1e-3) / 1e9
        print(
            f"{name:22s}: {ms:8.3f} ms  {flops/1e9:8.2f} GFLOP "
            f"{bbytes/1e9:7.3f} GB  {tf:7.2f} TF/s ({100*tf*1e12/PEAK_BF16_FLOPS:4.1f}% MXU) "
            f"{gb:7.1f} GB/s ({100*gb*1e9/PEAK_HBM_BPS:4.1f}% HBM)",
            flush=True,
        )


if __name__ == "__main__":
    main()
