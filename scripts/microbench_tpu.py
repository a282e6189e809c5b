"""Microbenchmarks of the hot kernels on the attached TPU.

Usage: python scripts/microbench_tpu.py
Prints per-kernel steady-state timings + achieved bandwidth/FLOPs estimates.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from dip_admm_tpu.config import GeometryConfig
from dip_admm_tpu.ops import radon, tv
from dip_admm_tpu.utils.profiling import time_fn


def bench_dense_matvec(N=64, P=5):
    cfg = GeometryConfig(N=N, num_nodes=P)
    angles, valid, _ = radon.node_angles(cfg)
    m = angles.shape[1] * cfg.n_det
    n = N * N
    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (P, m, n), jnp.float32)
    x = jax.random.normal(key, (P, n), jnp.float32)

    f = jax.jit(lambda A, x: jnp.einsum("pmn,pm->pn", A, jnp.einsum("pmn,pn->pm", A, x)))
    t = time_fn(f, A, x, iters=20)
    flops = 4 * P * m * n
    bytes_ = 2 * P * m * n * 4
    print(
        f"dense fwd+adj N={N} P={P} m={m}: {t['best_s']*1e3:.3f} ms  "
        f"{flops/t['best_s']/1e12:.2f} TFLOP/s  {bytes_/t['best_s']/1e9:.0f} GB/s"
    )
    return t["best_s"]


def bench_projector(N=256, P=8):
    cfg = GeometryConfig(N=N, num_nodes=P)
    angles_np, valid_np, _ = radon.node_angles(cfg)
    angles = jnp.asarray(angles_np, jnp.float32)
    valid = jnp.asarray(valid_np)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (P, N, N), jnp.float32)

    fwd = jax.jit(lambda im: radon.project_nodes(cfg, im, angles, valid))
    t = time_fn(fwd, imgs, iters=10)
    rays = P * angles.shape[1] * cfg.n_det
    print(
        f"matrix-free fwd N={N} P={P} rays={rays}: {t['best_s']*1e3:.3f} ms  "
        f"({rays*N/t['best_s']/1e9:.2f} Gsamples/s)"
    )

    sinos = fwd(imgs)
    adj = jax.jit(
        lambda s: radon.backproject_nodes(cfg, s, angles, valid)
    )
    t2 = time_fn(adj, sinos, iters=10)
    print(f"matrix-free adj N={N} P={P}: {t2['best_s']*1e3:.3f} ms")
    return t["best_s"], t2["best_s"]


def bench_tv(N=256, P=8):
    x = jax.random.normal(jax.random.PRNGKey(2), (P, N, N), jnp.float32)

    def cv_tv_part(x):
        gx, gy = tv.grad(x)
        px, py = tv.project_l2_ball(gx, gy, 0.02)
        return tv.grad_adjoint(px, py)

    t = time_fn(jax.jit(cv_tv_part), x, iters=20)
    print(f"tv grad+proj+adj N={N} P={P}: {t['best_s']*1e3:.3f} ms")


if __name__ == "__main__":
    print("devices:", jax.devices())
    bench_dense_matvec(64, 5)
    bench_dense_matvec(128, 8)
    bench_projector(256, 8)
    bench_projector(512, 8)
    bench_tv(256, 8)


def bench_fft_projector(N=256, P=8):
    from dip_admm_tpu.ops import radon_fft

    cfg = GeometryConfig(N=N, num_nodes=P)
    angles_np, valid_np, _ = radon.node_angles(cfg)
    angles = jnp.asarray(angles_np, jnp.float32)
    valid = jnp.asarray(valid_np)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (P, N, N), jnp.float32)

    fwd = jax.jit(
        lambda im: jax.vmap(lambda x, a, v: radon_fft.project(cfg, x, a, v))(
            im, angles, valid
        )
    )
    t = time_fn(fwd, imgs, iters=10)
    print(f"fft fwd N={N} P={P}: {t['best_s']*1e3:.3f} ms")
    sinos = fwd(imgs)
    adj = jax.jit(
        lambda s: jax.vmap(
            lambda ss, a, v: radon_fft.backproject(cfg, ss, a, v)
        )(s, angles, valid)
    )
    t2 = time_fn(adj, sinos, iters=10)
    print(f"fft adj N={N} P={P}: {t2['best_s']*1e3:.3f} ms")
