"""Compare the fft (XLA einsum) and fft_pallas (Pallas filter-sum) normal
operators on the attached TPU, f32 vs bf16 phase tables.

Per-dispatch round-trip on this host is ~20 ms, so each measurement chains
``CHAIN`` normal-op applications inside one jit (normalized between steps to
keep a data dependency without overflow) and divides.

Usage: python scripts/bench_filter_pallas.py [N] [P] [CHAIN]
"""

import sys
import time

import jax
import jax.numpy as jnp

from dip_admm_tpu.config import GeometryConfig, ProblemConfig
from dip_admm_tpu.data.loader import build_fft_tables, make_node_ops
from dip_admm_tpu.ops import radon


def bench(mode: str, table_dtype: str, N: int, P: int, chain: int) -> float:
    cfg = ProblemConfig(
        geometry=GeometryConfig(N=N, num_nodes=P), fft_table_dtype=table_dtype
    )
    geo = cfg.geometry
    angles_np, valid_np, _ = radon.node_angles(geo)
    angles = jnp.asarray(angles_np, jnp.float32)
    valid = jnp.asarray(valid_np)
    tables = build_fft_tables(cfg, angles, valid, mode)
    jax.block_until_ready(tables)

    def run(x, tabs):
        fwd, adj = make_node_ops(mode, geo, angles, valid, None, tabs)

        def body(_, xx):
            y = adj(fwd(xx))
            return y / jnp.maximum(jnp.linalg.norm(y), 1e-30)

        # Reduce to a scalar so timing can force the full device round trip
        # (block_until_ready through the socket relay returns early).
        return jnp.sum(jax.lax.fori_loop(0, chain, body, x))

    runj = jax.jit(run)
    x = jax.random.normal(jax.random.PRNGKey(0), (P, N * N), jnp.float32)
    float(runj(x, tables))  # compile + settle
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(runj(x, tables))
        best = min(best, (time.perf_counter() - t0) / chain)
    table_bytes = sum(
        v.size * v.dtype.itemsize
        for k, v in tables.items() if k.startswith("H")
    )
    print(
        f"{mode:11s} tables={table_dtype:8s} N={N} P={P}: "
        f"{best*1e3:8.3f} ms/normal-op   "
        f"(H tables {table_bytes/1e9:.2f} GB -> {2*table_bytes/best/1e9:.0f} GB/s eff)"
    )
    return best


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    P = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    chain = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    combos = (
        ("fft", "float32"),
        ("fft_pallas", "float32"),
        ("fft_pallas", "bfloat16"),
    )
    if len(sys.argv) > 4:  # e.g. "fft_mxu:bfloat16,fft_pallas:bfloat16"
        combos = tuple(
            tuple(c.split(":")) for c in sys.argv[4].split(",")
        )
    print(f"backend: {jax.devices()[0].platform} ({jax.devices()[0]})")
    for mode, tdt in combos:
        bench(mode, tdt, N, P, chain)


if __name__ == "__main__":
    main()
