"""Per-pixel communication-graph topologies (knn / mst / chain).

TPU-native rebuild of the reference per-pixel mask builder
(``/root/reference/block_3_graph_and_precisions.py:62-187``). The reference
constructs one networkx graph per pixel in a Python loop over all n = N^2
pixels (HOT LOOP #1 in SURVEY §3.1); here each strategy is a vectorized jnp
computation vmapped over the pixel axis:

- ``knn``  : top-k per node on the symmetrized weights, symmetrized by OR,
             then — exactly like the reference — if the pixel graph is
             disconnected, the *full* maximum-spanning-tree edge set of the
             complete graph is OR-ed in (``:92-103``).
- ``mst``  : maximum spanning tree of the complete weighted graph per pixel
             (Prim's algorithm in a fori_loop; P is small so the O(P^2) body
             vectorizes cleanly).
- ``chain``: a random-permutation path per pixel (``:134-146``).

Returned mask layout matches the reference: ``keep[i, j, p]`` boolean with
the pixel axis last, symmetric in (i, j), zero diagonal.

Determinism: ties in top-k/argmax break toward lower indices; the chain
permutations derive from a jax PRNG key folded per pixel. Exact edge sets can
therefore differ from networkx's tie-breaking — the invariants (symmetry,
connectivity, edge-count laws, weight bounds: mirrored from
``test_block3_structural.py`` / ``test_block_3_checker.py``) are the parity
contract, not bit-identical masks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG = -jnp.inf


def _connected_from_adj(adj: jnp.ndarray) -> jnp.ndarray:
    """Boolean connectivity of an undirected adjacency [P, P] (assumes
    symmetric). Reachability by repeated squaring of (adj | I)."""
    P = adj.shape[-1]
    reach = adj | jnp.eye(P, dtype=bool)
    n_steps = max(1, P.bit_length())  # repeated squaring reaches diameter P
    for _ in range(n_steps):
        reach = (reach.astype(jnp.float32) @ reach.astype(jnp.float32)) > 0
    return reach[0].all()


def _prim_max_tree(qp: jnp.ndarray) -> jnp.ndarray:
    """Maximum spanning tree of the complete graph with weights qp [P, P]
    (symmetric, zero diagonal). Returns symmetric adjacency [P, P]."""
    P = qp.shape[-1]
    in_tree = jnp.zeros(P, dtype=bool).at[0].set(True)
    adj = jnp.zeros((P, P), dtype=bool)

    def body(_, carry):
        in_tree, adj = carry
        score = jnp.where(in_tree[:, None] & ~in_tree[None, :], qp, NEG)
        flat = jnp.argmax(score)
        u, v = flat // P, flat % P
        adj = adj.at[u, v].set(True).at[v, u].set(True)
        in_tree = in_tree.at[v].set(True)
        return in_tree, adj

    _, adj = jax.lax.fori_loop(0, P - 1, body, (in_tree, adj))
    return adj


def _knn_adj(qp: jnp.ndarray, k: int) -> jnp.ndarray:
    """Top-k neighbor selection per node, OR-symmetrized. qp [P, P]."""
    P = qp.shape[-1]
    k_eff = min(k, P - 1)
    cand = jnp.where(jnp.eye(P, dtype=bool), NEG, qp)
    if k_eff <= 0:
        return jnp.zeros((P, P), dtype=bool)
    _, idx = jax.lax.top_k(cand, k_eff)  # [P, k]
    adj = jnp.zeros((P, P), dtype=bool)
    rows = jnp.broadcast_to(jnp.arange(P)[:, None], idx.shape)
    adj = adj.at[rows, idx].set(True)
    return adj | adj.T


def _knn_then_connect(qp: jnp.ndarray, k: int) -> jnp.ndarray:
    """Reference knn strategy (``block_3_graph_and_precisions.py:62-110``):
    knn edges, plus the full max-spanning-tree edge set if disconnected."""
    adj = _knn_adj(qp, k)
    tree = _prim_max_tree(qp)
    connected = _connected_from_adj(adj)
    return jnp.where(connected, adj, adj | tree)


def _chain_adj(order: jnp.ndarray) -> jnp.ndarray:
    """Path adjacency along a node permutation ``order`` [P]."""
    P = order.shape[0]
    E = jax.nn.one_hot(order, P, dtype=jnp.float32)  # [t, v]
    adj = (E[:-1].T @ E[1:]) > 0
    return adj | adj.T


@functools.partial(jax.jit, static_argnames=("strategy", "k", "seed"))
def build_pixel_masks(
    q: jnp.ndarray, strategy: str = "knn", k: int = 2, seed: int = 123
) -> jnp.ndarray:
    """keep[i, j, p] for every pixel, from weights q [P, P, n].

    The weights are symmetrized and diagonal-zeroed first (ref ``:169-172``),
    then the per-pixel strategy runs under vmap over the pixel axis.
    """
    P = q.shape[0]
    q_sym = 0.5 * (q + jnp.swapaxes(q, 0, 1))
    q_sym = q_sym * (~jnp.eye(P, dtype=bool))[:, :, None]
    qp = jnp.moveaxis(q_sym, -1, 0)  # [n, P, P]
    n = qp.shape[0]

    if strategy == "knn":
        masks = jax.vmap(lambda w: _knn_then_connect(w, k))(qp)
    elif strategy == "mst":
        masks = jax.vmap(_prim_max_tree)(qp)
    elif strategy == "chain":
        keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(seed), i))(
            jnp.arange(n)
        )
        orders = jax.vmap(lambda kk: jax.random.permutation(kk, P))(keys)
        masks = jax.vmap(_chain_adj)(orders)
    elif strategy == "complete":
        masks = jnp.broadcast_to(~jnp.eye(P, dtype=bool), (n, P, P))
    else:
        raise ValueError("strategy must be 'knn', 'mst', 'chain' or 'complete'")

    keep = jnp.moveaxis(masks, 0, -1)  # [P, P, n]
    return keep | jnp.swapaxes(keep, 0, 1)


def union_adjacency(keep: jnp.ndarray) -> jnp.ndarray:
    """Union node graph over pixels: adj[i, j] = any_p keep[i, j, p]
    (ref ``block_3_graph_and_precisions.py:201-206``)."""
    return jnp.any(keep, axis=-1)


def union_summary(keep: jnp.ndarray) -> dict:
    """Diagnostics matching ``_summarize_and_plot_union`` prints
    (``block_3_graph_and_precisions.py:191-217``)."""
    adj = union_adjacency(keep)
    P = adj.shape[0]
    degrees = jnp.sum(adj, axis=1)
    return {
        "num_nodes": P,
        "num_edges": int(jnp.sum(adj)) // 2,
        "connected": bool(_connected_from_adj(adj)),
        "degree_min": int(degrees.min()),
        "degree_mean": float(degrees.mean()),
        "degree_max": int(degrees.max()),
        "active_ratio": float(jnp.mean(keep.astype(jnp.float32))),
    }
