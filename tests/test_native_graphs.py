"""Native (C++) per-pixel graph builder vs the jnp builder: exact mask
equality for knn and mst (identical tie-breaking by construction)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dip_admm_tpu.graph import native, precisions, topology

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native builder unavailable (no g++)"
)


@pytest.mark.parametrize("strategy,k", [("knn", 2), ("knn", 1), ("mst", 0)])
def test_native_matches_jnp(strategy, k):
    rng = np.random.default_rng(0)
    P, n = 6, 300
    W = jnp.asarray(rng.uniform(0.1, 2.0, size=(P, n)).astype(np.float32))
    q = precisions.pairwise_q(W, "arithmetic")
    keep_jnp = np.asarray(
        topology.build_pixel_masks(q, strategy=strategy, k=k, seed=1)
    )
    keep_nat = native.build_pixel_masks_native(
        np.asarray(q), strategy=strategy, k=k
    )
    mismatch = (keep_jnp != keep_nat).sum()
    assert mismatch == 0, f"{mismatch} differing mask entries"


def test_native_structural_invariants():
    rng = np.random.default_rng(1)
    P, n = 5, 400
    W = jnp.asarray(rng.uniform(0.1, 2.0, size=(P, n)).astype(np.float32))
    q = np.asarray(precisions.pairwise_q(W, "harmonic"))
    keep = native.build_pixel_masks_native(q, strategy="mst")
    per_pixel = keep.sum(axis=(0, 1)) // 2
    assert (per_pixel == P - 1).all()
    assert (keep == keep.transpose(1, 0, 2)).all()
