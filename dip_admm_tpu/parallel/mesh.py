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
from jax.sharding import Mesh

NODE_AXIS = "node"


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
