"""Multi-host helpers.

TPU-native equivalents of the reference's cross-rank plumbing:
- `gather_predictions`: the reference all_gathers per-rank eval predictions and trims
  the DistributedSampler padding (`Classifiers/experiments.py:554-564`); here each
  process contributes its local slice and gets the full array back, trimmed to `total`.
- `global_batch_from_local`: per-host input sharding -> one global jax.Array
  (replaces DistributedSampler; pairs with DataModule._host_shard).
- `initialize()`: jax.distributed bootstrap (SLURM/env-driven, replaces NCCL init).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

import jax


def initialize(coordinator_address: Optional[str] = None, num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """Multi-process JAX runtime init.

    num_processes=1 is an explicit no-op. With num_processes=None the call is
    forwarded to `jax.distributed.initialize()`, whose env auto-detection (SLURM,
    TPU pod metadata) fills in the topology — silently skipping that case would
    leave every pod host believing it is the whole world (process_count()==1),
    which trains on one shard and reports wrong metrics with no error."""
    if num_processes == 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes, process_id=process_id)


def gather_predictions(local: np.ndarray, total: int) -> np.ndarray:
    """All-gather per-process prediction slices and trim to `total` rows."""
    if jax.process_count() == 1:
        return np.asarray(local)[:total]
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(np.asarray(local), tiled=True)
    return np.asarray(gathered)[:total]


def global_batch_from_local(mesh, local_batch):
    """Assemble a global device array from each host's local shard
    (jax.make_array_from_process_local_data over the 'data' axis)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        local_batch,
    )
