"""Per-pixel graph invariants.

Ports the reference block-3 test contracts to real pytest:
- connectivity of every pixel graph + mask symmetry + edge-count laws
  (``/root/reference/test_block3_structural.py:15-60``)
- aggregate edge-count bounds and masked-weight conservation
  (``/root/reference/test_block_3_checker.py:53-124``)
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dip_admm_tpu.graph import precisions, topology


P, n = 5, 60


@pytest.fixture(scope="module")
def q():
    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.uniform(0.1, 2.0, size=(P, n)).astype(np.float32))
    return precisions.pairwise_q(W, "arithmetic")


def _connected(adj_np):
    reach = adj_np | np.eye(P, dtype=bool)
    for _ in range(P):
        reach = reach @ reach
    return reach[0].all()


@pytest.mark.parametrize("strategy,k", [("knn", 2), ("mst", 0), ("chain", 0)])
def test_masks_symmetric_connected(q, strategy, k):
    keep = np.asarray(
        topology.build_pixel_masks(q, strategy=strategy, k=k, seed=123)
    )
    assert keep.shape == (P, P, n)
    # Symmetry in (i, j) and empty diagonal.
    assert (keep == keep.transpose(1, 0, 2)).all()
    assert not keep[np.arange(P), np.arange(P), :].any()
    # Every pixel graph connected (ref test_block3_structural.py:15-29).
    for p in range(n):
        assert _connected(keep[:, :, p]), f"pixel {p} disconnected ({strategy})"


@pytest.mark.parametrize("strategy", ["mst", "chain"])
def test_tree_edge_counts(q, strategy):
    # Trees/chains: exactly P-1 edges per pixel; total = n*(P-1)
    # (ref test_block_3_checker.py:53-58).
    keep = np.asarray(topology.build_pixel_masks(q, strategy=strategy, seed=1))
    per_pixel = keep.sum(axis=(0, 1)) // 2
    assert (per_pixel == P - 1).all()


def test_knn_edge_bounds(q):
    # n(P-1) <= total <= n * min(P*k, P(P-1)/2)
    # (ref test_block_3_checker.py:61-77).
    k = 2
    keep = np.asarray(topology.build_pixel_masks(q, strategy="knn", k=k, seed=1))
    per_pixel = keep.sum(axis=(0, 1)) // 2
    assert (per_pixel >= P - 1).all()
    assert (per_pixel <= min(P * k, P * (P - 1) // 2)).all()


def test_knn_contains_topk(q):
    # Each node's k strongest neighbors (on symmetrized weights) are present.
    k = 2
    keep = np.asarray(topology.build_pixel_masks(q, strategy="knn", k=k, seed=1))
    qs = np.asarray(precisions.symmetrize(q))
    for p in range(0, n, 7):
        for i in range(P):
            w = qs[i, :, p].copy()
            w[i] = -np.inf
            top = np.argsort(w)[-k:]
            assert keep[i, top, p].all()


def test_masked_weight_bound(q):
    # Masked weight sums never exceed unmasked sums
    # (spirit of test_block_3_checker.py:80-107).
    keep = topology.build_pixel_masks(q, strategy="knn", k=2, seed=1)
    masked = jnp.sum(q * keep, axis=-1)
    unmasked = jnp.sum(q, axis=-1)
    assert bool(jnp.all(masked <= unmasked + 1e-6))


def test_chain_is_path(q):
    # Chain: every pixel graph has exactly 2 nodes of degree 1 and the rest
    # degree 2 (a simple path).
    keep = np.asarray(topology.build_pixel_masks(q, strategy="chain", seed=5))
    deg = keep.sum(axis=1)  # [P, n]
    assert ((deg == 1).sum(axis=0) == 2).all()
    assert ((deg == 2).sum(axis=0) == P - 2).all()


def test_chain_seed_determinism(q):
    a = np.asarray(topology.build_pixel_masks(q, strategy="chain", seed=9))
    b = np.asarray(topology.build_pixel_masks(q, strategy="chain", seed=9))
    c = np.asarray(topology.build_pixel_masks(q, strategy="chain", seed=10))
    assert (a == b).all()
    assert (a != c).any()


def test_mst_maximizes_weight(q):
    # The MST mask's total weight per pixel must match a brute-force maximum
    # spanning tree (checked on a few pixels via Kruskal in numpy).
    keep = np.asarray(topology.build_pixel_masks(q, strategy="mst", seed=1))
    qs = np.asarray(precisions.symmetrize(q))
    for p in range(0, n, 13):
        w = qs[:, :, p]
        got = (w * keep[:, :, p]).sum() / 2
        best = _kruskal_max(w)
        np.testing.assert_allclose(got, best, rtol=1e-5)


def _kruskal_max(w):
    edges = sorted(
        ((w[i, j], i, j) for i in range(P) for j in range(i + 1, P)),
        reverse=True,
    )
    parent = list(range(P))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    total, used = 0.0, 0
    for wt, i, j in edges:
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[ri] = rj
            total += wt
            used += 1
            if used == P - 1:
                break
    return total


def test_union_summary(q):
    keep = topology.build_pixel_masks(q, strategy="knn", k=2, seed=1)
    s = topology.union_summary(keep)
    assert s["num_nodes"] == P
    assert s["connected"]
    assert 0.0 < s["active_ratio"] <= 1.0
    assert s["degree_min"] >= 1
