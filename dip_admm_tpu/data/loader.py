"""Problem construction: operators, phantoms, sinograms, weights, graphs.

TPU-native rebuild of the reference data layer
(``/root/reference/block_2_load_odl_data.py:99-253`` build-mode loader and
``block_2_test.py:15-167`` pickle-mode loader): instead of ODL operators and
pickled dense matrices, a ``Problem`` pytree carries padded per-node angle
sets for the batched Joseph projector, optionally a padded dense operator
stack ``A [P, m_max*D, n]`` (dense mode — the reference's native
representation, fastest for small N), per-pixel precision weights W/Q, the
per-pixel communication masks, and the noisy sinograms
``b_i = A_i x_true + sigma * eps`` (ref ``block_2_test.py:54-60``).

The measurement layout is angle-major like the reference's flattened
sinograms: row r = angle * n_det + det. Ragged per-node angle counts are
padded to ``m_max`` with zero rows (masked noise, zero operator rows), which
is exact — padded rows contribute nothing to A^T A or A^T b.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dip_admm_tpu.config import GeometryConfig, ProblemConfig
from dip_admm_tpu.graph import precisions, topology
from dip_admm_tpu.ops import linalg, phantoms, radon


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Problem:
    """All device-resident problem data (a pytree; ``cfg`` is static)."""

    cfg: ProblemConfig = dataclasses.field(metadata=dict(static=True))
    dense: bool = dataclasses.field(metadata=dict(static=True))
    angles: jnp.ndarray  # [P, m_max]
    angle_valid: jnp.ndarray  # [P, m_max] bool
    A: Optional[jnp.ndarray]  # [P, m_max * D, n] dense mode only
    b: jnp.ndarray  # [P, m_max * D] flattened noisy sinograms
    W: jnp.ndarray  # [P, n] column-norm weights
    Q: jnp.ndarray  # [P, P, n] per-pixel masked precisions
    keep: jnp.ndarray  # [P, P, n] bool per-pixel masks
    adj: jnp.ndarray  # [P, P] bool union adjacency
    x_true: jnp.ndarray  # [n]
    opnorm: jnp.ndarray  # [P] estimates of ||A_i^T A_i||_2

    @property
    def num_nodes(self) -> int:
        return self.cfg.geometry.num_nodes

    @property
    def N(self) -> int:
        return self.cfg.geometry.N

    @property
    def n(self) -> int:
        return self.cfg.geometry.n

    @property
    def m_flat(self) -> int:
        return self.b.shape[1]

    # -- batched forward / adjoint operators --------------------------------

    def forward(self, x: jnp.ndarray) -> jnp.ndarray:
        """[P, n] images -> [P, m_max * D] measurements."""
        if self.dense:
            return jnp.einsum("pmn,pn->pm", self.A, x)
        N = self.N
        sino = jax.vmap(
            lambda im, a, v: radon.project(self.cfg.geometry, im, a, v)
        )(x.reshape(-1, N, N), self.angles, self.angle_valid)
        return sino.reshape(x.shape[0], -1)

    def adjoint(self, r: jnp.ndarray) -> jnp.ndarray:
        """[P, m_max * D] residuals -> [P, n] backprojections."""
        if self.dense:
            return jnp.einsum("pmn,pm->pn", self.A, r)
        N, D = self.N, self.cfg.geometry.n_det
        img = jax.vmap(
            lambda s, a, v: radon.backproject(self.cfg.geometry, s, a, v)
        )(r.reshape(r.shape[0], -1, D), self.angles, self.angle_valid)
        return img.reshape(r.shape[0], -1)


def _node_colnorms(cfg: GeometryConfig, angles, valid, A=None) -> jnp.ndarray:
    """W[i, p] = ||A_i[:, p]||^2, dense or matrix-free
    (ref ``block_3_graph_and_precisions.py:21-24``)."""
    if A is not None:
        return precisions.weights_from_dense(A)
    W = jax.vmap(lambda a, v: radon.colnorms_sq(cfg, a, v))(angles, valid)
    return jnp.maximum(W.reshape(W.shape[0], -1), precisions.EPS)


def _estimate_opnorms(prob_fwd, prob_adj, P: int, n: int, iters: int = 30):
    """Batched power-method estimates of ||A_i^T A_i|| for solver steps."""

    def mv(x):
        return prob_adj(prob_fwd(x))

    v = jax.random.normal(jax.random.PRNGKey(7), (P, n), dtype=jnp.float32)
    v = v / jnp.linalg.norm(v, axis=1, keepdims=True)

    def body(_, carry):
        v, lam = carry
        w = mv(v)
        lam = jnp.linalg.norm(w, axis=1)
        v = w / jnp.maximum(lam[:, None], 1e-30)
        return v, lam

    _, lam = jax.lax.fori_loop(0, iters, body, (v, jnp.zeros(P)))
    return lam


def build_problem(
    cfg: ProblemConfig,
    dense: Optional[bool] = None,
    phantom_array: Optional[np.ndarray] = None,
) -> Problem:
    """Assemble a :class:`Problem` from configuration.

    ``dense`` defaults to True for N <= 128 (where the reference's dense
    representation fits easily and batched MXU matmuls are fastest) and False
    above (matrix-free Joseph projector).
    """
    geo = cfg.geometry
    N, P, D = geo.N, geo.num_nodes, geo.n_det
    n = geo.n
    if dense is None:
        dense = N <= 128
    dtype = jnp.dtype(cfg.dtype)

    angles_np, valid_np, _ = radon.node_angles(geo)
    angles = jnp.asarray(angles_np, dtype=dtype)
    valid = jnp.asarray(valid_np)

    # Phantom (one shared ground truth across nodes, like the flagship
    # pipeline: ``block_2_test.py:48-51``).
    if phantom_array is None:
        phantom_array = phantoms.make_phantom(cfg.phantom, N, seed=cfg.noise_seed)
    x_true = jnp.asarray(np.asarray(phantom_array), dtype=dtype).reshape(-1)

    # Dense operators if requested.
    A = None
    if dense:
        mats = [
            radon.dense_matrix(geo, angles[i], valid[i], dtype=dtype)
            for i in range(P)
        ]
        A = jnp.stack(mats)  # [P, m_max*D, n]

    # Clean sinograms via the projector (identical to dense A @ x).
    imgs = jnp.broadcast_to(x_true.reshape(1, N, N), (P, N, N))
    clean = radon.project_nodes(geo, imgs, angles, valid).reshape(P, -1)

    # Noise only on valid measurement rows (sigma * N(0,1),
    # ref ``block_2_test.py:54-60``).
    noise = jax.random.normal(jax.random.PRNGKey(cfg.noise_seed), clean.shape, dtype)
    row_valid = jnp.repeat(valid, D, axis=1)
    b = clean + cfg.noise_level * noise * row_valid

    # Precision weights and per-pixel graph.
    W = _node_colnorms(geo, angles, valid, A).astype(dtype)
    q_full = precisions.pairwise_q(W, cfg.graph.q_mode)
    keep = topology.build_pixel_masks(
        q_full, strategy=cfg.graph.strategy, k=cfg.graph.k, seed=cfg.graph.seed
    )
    Q = q_full * keep  # masked provider semantics
    adj = topology.union_adjacency(keep)

    prob = Problem(
        cfg=cfg, dense=dense, angles=angles, angle_valid=valid, A=A, b=b,
        W=W, Q=Q, keep=keep, adj=adj, x_true=x_true,
        opnorm=jnp.ones((P,), dtype),
    )
    opnorm = _estimate_opnorms(prob.forward, prob.adjoint, P, n)
    return dataclasses.replace(prob, opnorm=opnorm.astype(dtype))


def rebuild_graph(problem: Problem, graph_cfg) -> Problem:
    """New Problem with the same operators/data but a different per-pixel
    graph (the reference reruns block-3 per strategy on fixed pickled data,
    ``block_7_main_ver3.py:63-72``)."""
    cfg = dataclasses.replace(problem.cfg, graph=graph_cfg)
    q_full = precisions.pairwise_q(problem.W, graph_cfg.q_mode)
    keep = topology.build_pixel_masks(
        q_full, strategy=graph_cfg.strategy, k=graph_cfg.k, seed=graph_cfg.seed
    )
    return dataclasses.replace(
        problem,
        cfg=cfg,
        Q=q_full * keep,
        keep=keep,
        adj=topology.union_adjacency(keep),
    )
