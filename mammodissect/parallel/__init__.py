"""Distributed runtime (L1) — the TPU-native replacement for the reference's
torch.distributed/DDP/NCCL stack (`util/global_env.py`, `util/dist_autograd.py`,
DistributedSampler; SURVEY.md §2.8)."""

from mammodissect.parallel.mesh import GlobalEnv, make_mesh, mesh_shape_for
from mammodissect.parallel.sharding import (
    batch_sharding,
    param_shardings,
    replicated,
    shard_batch,
)
from mammodissect.parallel.collectives import all_gather_with_grad

__all__ = [
    "GlobalEnv",
    "make_mesh",
    "mesh_shape_for",
    "batch_sharding",
    "param_shardings",
    "replicated",
    "shard_batch",
    "all_gather_with_grad",
]
