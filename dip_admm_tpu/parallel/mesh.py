"""Device-mesh construction.

The reference has no communication backend at all — its "distributed" nodes
are entries of Python dicts in one process (SURVEY §2.2). Here graph nodes
are sharded over a ``jax.sharding.Mesh`` axis ``"node"``; on multi-host
systems the same axis simply spans hosts (collectives ride ICI within a host
and DCN across hosts — XLA picks the transport from the mesh).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, PartitionSpec as PS

NODE_AXIS = "node"

def table_partition_specs(tables, num_nodes: int):
    """PartitionSpec pytree for a projector-table pytree: THE single source
    of truth for table placement, used by both the shard_map runtime
    (``admm_sharded`` in_specs) and host-side placement
    (``multihost.distribute_problem``), so the two can never disagree.

    Rule: every leaf under a ``"shared"`` subtree is node-shared geometry
    (fft_shear's Phi twiddles, the fan path's single-set parallel tables and
    rebin/DFT filters) and replicates; everything else is per-node and
    shards by its leading node axis. The subtree marker exists because a
    shared leaf's leading dim can coincide with the node count (e.g. Phi
    [16, F] on a 16-node graph) — a shape heuristic alone would shard it."""

    def spec(path, leaf):
        if any(getattr(p, "key", None) == "shared" for p in path):
            return PS()
        if getattr(leaf, "ndim", 0) > 0 and leaf.shape[0] == num_nodes:
            return PS(NODE_AXIS)
        return PS()

    return jax.tree_util.tree_map_with_path(spec, tables)


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} present"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (NODE_AXIS,))


def shards_for(num_nodes: int, mesh: Mesh) -> int:
    """Nodes per device; the node count must tile the mesh axis."""
    n_dev = mesh.shape[NODE_AXIS]
    if num_nodes % n_dev != 0:
        raise ValueError(
            f"num_nodes={num_nodes} must be divisible by mesh size {n_dev}"
        )
    return num_nodes // n_dev
