"""Headline benchmark: decentralized consensus-ADMM throughput.

Prints ONE JSON line:
  {"metric": "admm_iters_per_s_256x256_8nodes", "value": ..., "unit":
   "iters/s", "vs_baseline": ..., "extra": {...}}

Primary metric (BASELINE.json): outer ADMM iterations/s on the 8-node,
256x256 decentralized TV-LS problem (knn k=2 per-pixel graph, arithmetic
precision weights), with the reference-equivalent inner budget (<=200
first-order inner iterations per node solve, adaptive stationarity target —
matching SCS's <=200-iteration cap at
/root/reference/block_6_admm_loop_ver2.py:123).

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
baseline is a *measured CPU proxy* of the reference's per-iteration work: a
numpy (BLAS) implementation of one outer iteration's dominant cost — per node
200 inner iterations of dense A/A^T matvecs at 64x64 (where the reference's
dense representation fits), FLOP-scaled by (m*n)_256 / (m*n)_64 = 256x to the
256x256 problem size. numpy BLAS is strictly faster than the reference's
SCS+CVXPY path, so this proxy *overestimates* the reference and the reported
speedup is conservative.
"""

from __future__ import annotations

import dataclasses
import json
import time

import numpy as np


def measure_tpu_throughput(N=256, P=8, timed_iters=20, dtype="float32",
                           repeats=3):
    import jax

    from dip_admm_tpu.config import (
        AdmmConfig,
        GeometryConfig,
        GraphConfig,
        NodeSolverConfig,
        ProblemConfig,
    )
    from dip_admm_tpu.core import admm
    from dip_admm_tpu.data import loader

    cfg = ProblemConfig(
        geometry=GeometryConfig(N=N, num_nodes=P),
        graph=GraphConfig(strategy="knn", k=2, seed=123),
        admm=AdmmConfig(
            lam_tv=0.02,
            rho=2.0,
            max_iters=timed_iters,
            eps_pri=0.0,  # never stop early while timing
            eps_dual=0.0,
            node=NodeSolverConfig(max_inner=200, check_every=25),
        ),
        noise_level=0.005,
        phantom="shepp",
        dtype=dtype,
        # bf16 phase tables feed the Pallas filter-sum kernel with f32
        # accumulation (~0.2% operator perturbation; measured 2.3x over the
        # f32 XLA fft path at this size).
        fft_table_dtype="bfloat16",
    )
    # Touch the device once before timing: the relay's FIRST dispatch in a
    # process intermittently stalls for minutes (tunnel bring-up; measured
    # 0.5 s typical, 190-360 s outliers on an 8x8 matmul / small fetch).
    # build_s measures problem construction, not connection setup.
    import jax.numpy as jnp

    float((jnp.ones((8, 8)) @ jnp.ones((8, 8))).sum())

    build_start = time.perf_counter()
    # mode=None -> the loader's auto choice (dense at N<=128; above that
    # fft_skew for parallel beam) — keeping the headline on the same path
    # every default-mode user gets. fft_skew measured 4.55 outer it/s
    # end-to-end at 256^2/8 vs 4.00 (fft_shear) / ~2.1 (fft_grouped)
    # in the round-3 A/B (RESULTS.md).
    problem = loader.build_problem(cfg)
    jax.block_until_ready(problem.b)
    build_s = time.perf_counter() - build_start

    # Warmup / compile.
    warm_cfg = dataclasses.replace(cfg.admm, max_iters=2)
    admm.run_admm(problem, warm_cfg).x.block_until_ready()

    # The relay-attached chip shows large run-to-run variance; take the best
    # of ``repeats`` full runs (each timed by fetching a scalar, which the
    # socket relay cannot report early).
    elapsed = float("inf")
    res = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        res = admm.run_admm(problem)
        float(res.history["primal"][timed_iters - 1])
        elapsed = min(elapsed, time.perf_counter() - t0)
    iters = int(res.n_iters)
    pri = np.asarray(res.history["primal"])[:iters]
    inner = np.asarray(res.history["inner_iters"])[:iters]

    # Secondary datapoint: the RECOMMENDED operating point (circulant-metric
    # fcv inner solver, over-relaxation 1.8, 15-inner budget — with the
    # round-5 Lanczos-certified step the Fourier preconditioner converges
    # the node subproblems in ~15 iterations; measured BETTER reconstruction
    # than the 200-inner parity contract at a fraction of its wall clock
    # and the same PSNR as the round-4 25-inner budget at 20 and 100
    # outers, RESULTS.md round-5 operating points). Same problem/tables.
    rec_cfg = dataclasses.replace(
        cfg.admm,
        relax_alpha=1.8,
        node=dataclasses.replace(
            cfg.admm.node, max_inner=15, algorithm="fcv", check_every=15
        ),
    )
    admm.run_admm(problem, dataclasses.replace(rec_cfg, max_iters=2))
    rec_elapsed = float("inf")
    r2 = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        r2 = admm.run_admm(problem, rec_cfg)
        float(r2.history["primal"][timed_iters - 1])
        rec_elapsed = min(rec_elapsed, time.perf_counter() - t0)

    from dip_admm_tpu.utils.imaging import psnr

    x_true = np.asarray(problem.x_true)
    dr = float(x_true.max())

    def mean_psnr(r):
        x = np.asarray(r.x)
        return float(np.mean(
            [psnr(xi, x_true, data_range=dr) for xi in x]
        ))

    # Roofline datapoint in the headline artifact (VERDICT r4 #6): the
    # projector apply pair's wall clock and achieved MXU fraction (flops
    # from the kernels' CostEstimates via XLA cost analysis; v5e peak
    # 197 TFLOP/s dense bf16 per the public scaling-book tables).
    import functools

    import jax.numpy as jnp
    from dip_admm_tpu.data.loader import make_node_ops

    geo = cfg.geometry
    A_arg = problem.A
    tbl = problem.fft_tables

    def _pair(mode, geo, angles, valid, A, tables, x):
        fwd, adj = make_node_ops(mode, geo, angles, valid, A, tables)
        return adj(fwd(x))  # exactly one fwd + one adj

    @functools.partial(jax.jit, static_argnames=("mode", "geo", "chain"))
    def _chain_pair(mode, geo, chain, angles, valid, A, tables, x):
        fwd, adj = make_node_ops(mode, geo, angles, valid, A, tables)
        acc = jnp.float32(0.0)
        for _ in range(chain):
            g = adj(fwd(x + acc * 1e-20))
            acc = acc + jnp.sum(g[..., :1].astype(jnp.float32))
        return acc

    roofline = {}
    try:
        x0 = jnp.asarray(np.asarray(res.x))
        pair_args = (problem.mode, geo, problem.angles, problem.angle_valid,
                     A_arg, tbl)
        chain = 40
        float(_chain_pair(pair_args[0], pair_args[1], chain, *pair_args[2:],
                          x0))  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(_chain_pair(pair_args[0], pair_args[1], chain,
                              *pair_args[2:], x0))
            best = min(best, time.perf_counter() - t0)
        pair_ms = best / chain * 1e3
        c = (
            jax.jit(_pair, static_argnames=("mode", "geo"))
            .lower(*pair_args, x0).compile().cost_analysis()
        )
        flops_pair = float(c.get("flops", 0.0))
        tfs = flops_pair / (pair_ms * 1e-3) / 1e12
        roofline = {
            "apply_pair_ms": round(pair_ms, 3),
            "apply_pair_tflops": round(tfs, 2),
            "mxu_pct_pair": round(100.0 * tfs * 1e12 / 197e12, 1),
        }
    except Exception as e:  # noqa: BLE001 - roofline is best-effort extra
        roofline = {"roofline_error": f"{type(e).__name__}: {e}"}

    return {
        "iters_per_s": iters / elapsed,
        "elapsed_s": elapsed,
        "outer_iters": iters,
        "mean_inner_iters": float(np.nanmean(inner)),
        "final_primal_residual": float(pri[-1]),
        "parity_psnr": mean_psnr(res),
        "recommended_iters_per_s": timed_iters / rec_elapsed,
        "recommended_psnr": mean_psnr(r2),
        "build_s": build_s,
        "backend": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        **roofline,
    }


def measure_cpu_reference_proxy(P=8, inner_iters=200, reps=3):
    """Numpy proxy of the reference's per-outer-iteration cost (see module
    docstring). Returns proxied reference outer-iterations/s at 256x256."""
    N64 = 64
    n = N64 * N64
    m = (max(180, 3 * N64) // P) * N64  # rows per node at 64x64
    rng = np.random.default_rng(0)
    A = rng.normal(size=(m, n)).astype(np.float32)
    x = rng.normal(size=n).astype(np.float32)
    b = rng.normal(size=m).astype(np.float32)

    def one_outer():
        xx = x
        for _ in range(inner_iters):
            r = A @ xx - b  # forward
            g = A.T @ r  # adjoint
            xx = xx - 1e-6 * g  # stand-in for the cone/prox step
        return xx

    one_outer()  # warm BLAS
    t0 = time.perf_counter()
    for _ in range(reps):
        one_outer()
    per_node_s = (time.perf_counter() - t0) / reps
    outer_64_s = P * per_node_s  # the reference solves nodes sequentially
    flop_scale = 256.0  # (m*n) grows 16*16 from 64^2 -> 256^2
    outer_256_s = outer_64_s * flop_scale
    return {"ref_proxy_iters_per_s_256": 1.0 / outer_256_s,
            "ref_proxy_outer_64_s": outer_64_s}


def main():
    # Always emit the JSON line: if the TPU run fails (tunnel wedge, OOM),
    # fall back to a small CPU-backend measurement so the driver still gets
    # a datapoint, flagged in "extra".
    ref = measure_cpu_reference_proxy()
    try:
        tpu = measure_tpu_throughput()
        fallback = None
    except Exception as e:  # noqa: BLE001 - report, don't crash the driver
        import traceback

        traceback.print_exc()
        import jax

        jax.config.update("jax_platforms", "cpu")
        tpu = measure_tpu_throughput(N=64, P=5, timed_iters=5, repeats=1)
        # Scale the 64^2 CPU measurement to the 256^2 metric by FLOPs (the
        # same 256x factor used for the reference proxy) — a conservative
        # stand-in, clearly marked.
        tpu["iters_per_s"] = tpu["iters_per_s"] / 256.0
        fallback = f"TPU run failed ({type(e).__name__}); CPU 64^2 FLOP-scaled"
    value = tpu["iters_per_s"]
    vs = value / ref["ref_proxy_iters_per_s_256"]
    # A fallback measurement is NOT the headline metric: report it under a
    # distinct name so a failed TPU round can never masquerade as a real
    # 256^2 TPU datapoint.
    metric = (
        "admm_iters_per_s_256x256_8nodes"
        if fallback is None
        else "admm_iters_per_s_CPU_FALLBACK_flopscaled"
    )
    out = {
        "metric": metric,
        "value": round(value, 4),
        "unit": "iters/s",
        "vs_baseline": round(vs, 2),
        "extra": {**tpu, **ref, **({"fallback": fallback} if fallback else {})},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
