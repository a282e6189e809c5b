"""dip_admm_tpu — TPU-native decentralized consensus-ADMM framework for
TV-regularized least-squares tomographic inverse problems.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
prsinha1/Distributed-Inverse-Problem-Admm (see SURVEY.md):

- ``ops``      : Radon projectors (dense + matrix-free), TV operators/prox,
                 batched linear algebra (CG, power method), Pallas kernels.
- ``graph``    : per-pixel communication graphs (knn / mst / chain) and
                 precision weights W_i / Q_ij (harmonic & arithmetic means).
- ``core``     : the consensus ADMM runtime — vmapped inexact node solver
                 (Condat-Vu primal-dual) and the jitted edge-consensus loop.
- ``parallel`` : device mesh + shard_map collectives (all_to_all dual
                 exchange, psum residual reduction) for multi-chip/multi-host.
- ``solvers``  : alternative solver families — PDHG penalized-consensus,
                 centralized aggregate baseline, node/edge-objective graph API.
- ``data``     : problem construction (phantoms, operators, sinograms) and
                 serialization/checkpointing.
- ``runners``  : experiment orchestration + artifact writers (block-7 parity).

The reference executes its "distributed" graph sequentially in one Python
process; here the node axis is sharded over a ``jax.sharding.Mesh`` and edge
consensus is a masked pairwise-average collective over ICI.
"""

__version__ = "0.1.0"

from dip_admm_tpu.config import (  # noqa: F401
    GeometryConfig,
    GraphConfig,
    NodeSolverConfig,
    AdmmConfig,
    ProblemConfig,
)
