"""Fused consensus Pallas kernel vs the jnp reference (interpreter mode on
CPU; the same kernel compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dip_admm_tpu.ops.pallas import consensus


def _data(P_loc=3, P=3, n=512, seed=0):
    k = jax.random.split(jax.random.PRNGKey(seed), 6)
    a = jax.random.normal(k[0], (P_loc, P, n))  # proposals a_ij
    y = jax.random.normal(k[1], (P_loc, P, n))
    z = jax.random.normal(k[2], (P_loc, P, n))
    a_t = jax.random.normal(k[3], (P_loc, P, n))
    adjm = (jax.random.uniform(k[4], (P_loc, P)) > 0.4).astype(jnp.float32)
    w_own = jax.random.uniform(k[5], (P_loc, n)) + 0.1
    w_all = jax.random.uniform(k[0], (P, n)) + 0.1
    return a, y, z, a_t, adjm, w_own, w_all


@pytest.mark.parametrize("fusion", ["midpoint", "weighted"])
def test_kernel_matches_reference(fusion):
    a, y, z, a_t, adjm, w_own, w_all = _data()
    got = consensus.consensus_update(
        a, y, z, a_t, adjm, w_own, w_all, fusion=fusion, tile=256,
        interpret=True,
    )
    want = consensus.consensus_update_reference(
        a, y, z, a_t, adjm, w_own, w_all, fusion=fusion
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-5,
                                   atol=1e-5)


def test_kernel_single_tile():
    a, y, z, a_t, adjm, w_own, w_all = _data(P_loc=2, P=4, n=256)
    got = consensus.consensus_update(
        a, y, z, a_t, adjm, fusion="midpoint", tile=256, interpret=True
    )
    want = consensus.consensus_update_reference(
        a, y, z, a_t, adjm, fusion="midpoint"
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-5,
                                   atol=1e-5)
