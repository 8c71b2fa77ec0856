"""Device-mesh parallelism: mesh construction, shardings, SPMD train step.

TPU-native replacement for the reference's NCCL DDP stack (SURVEY.md 2.10,
5.8): a 1-D `data` mesh over all chips (ICI within slice, DCN across),
parameters replicated, batch sharded; gradient/metric reductions become XLA
collectives inserted by pjit from sharding annotations.
"""

from .mesh import make_mesh, data_sharding, replicated, shard_batch

__all__ = ["make_mesh", "data_sharding", "replicated", "shard_batch"]
