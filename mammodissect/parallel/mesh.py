"""Device mesh construction + process topology.

Replaces the reference's `GlobalEnv` singleton over torch.distributed
(`util/global_env.py:15-34`, populated from NCCL/RCCL ranks) with JAX process/device
topology. Axis convention:

  'data'   — batch (DP; the only parallelism in the reference, SURVEY.md §2.8)
  'model'  — tensor parallelism for the text tower / projections (beyond-parity)

Collectives ride ICI within a slice; `jax.distributed.initialize` + standard mesh
construction handles multi-host (DCN) — rank topology comes from the JAX runtime, not
SLURM env vars."""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def mesh_shape_for(n_devices: int, model_parallel: int = 1) -> Tuple[int, int]:
    if n_devices % model_parallel != 0:
        raise ValueError(f"{n_devices} devices not divisible by model_parallel={model_parallel}")
    return (n_devices // model_parallel, model_parallel)


def make_mesh(
    devices: Optional[Sequence] = None,
    model_parallel: int = 1,
    axis_names: Tuple[str, str] = (DATA_AXIS, MODEL_AXIS),
) -> Mesh:
    """Build a (data, model) mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    dp, mp = mesh_shape_for(len(devices), model_parallel)
    dev_array = np.asarray(devices).reshape(dp, mp)
    return Mesh(dev_array, axis_names)


def auto_data_mesh(min_devices: int = 2) -> Optional[Mesh]:
    """Data-only mesh over all local devices, or None on a single device.

    Used by the dissection engine to transparently shard the harvest batch axis
    (the TPU analogue of the reference's DistributedSampler DP over the probe,
    `Datasets/dataset_utils.py:236-251`) whenever >1 chip is visible."""
    devices = jax.local_devices()
    if len(devices) < min_devices:
        return None
    return make_mesh(devices, model_parallel=1)


def global_data_mesh(min_devices: int = 2) -> Optional[Mesh]:
    """Data-only mesh over ALL devices in the job, spanning processes.

    Real multi-host harvests need this: each process contributes its local slice
    of the global batch via `jax.make_array_from_process_local_data`, which only
    works when the sharding's mesh covers every process's devices. (A local-only
    mesh makes the 'global' array per-host and the global-batch program's input
    shape half-sized — a crash, not a silent wrong answer, but a crash.)"""
    devices = jax.devices()
    if len(devices) < min_devices:
        return None
    return make_mesh(devices, model_parallel=1)


def mesh_spans_processes(mesh: Optional[Mesh]) -> bool:
    """True when the mesh covers every process in the job."""
    if mesh is None:
        return jax.process_count() == 1
    return len({d.process_index for d in mesh.devices.flat}) == jax.process_count()


def data_parallel_size(mesh: Optional[Mesh]) -> int:
    return int(mesh.shape[DATA_AXIS]) if mesh is not None else 1


@dataclasses.dataclass(frozen=True)
class GlobalEnv:
    """Process-level env mirroring the reference namedtuple
    `(world_size, world_rank, local_rank, num_gpus, master, summary_writer)`
    (`util/global_env.py:15-34`); summary_writer lives in train/loggers."""

    world_size: int
    world_rank: int
    local_rank: int
    num_devices: int
    master: bool

    @classmethod
    def get(cls) -> "GlobalEnv":
        return cls(
            world_size=jax.process_count(),
            world_rank=jax.process_index(),
            local_rank=_local_rank(),
            num_devices=jax.local_device_count(),
            master=jax.process_index() == 0,
        )


def _local_rank() -> int:
    """Rank within the node, matching the reference's LOCAL_RANK semantics
    (`util/global_env.py:31` reads the env var torchrun/srun sets). JAX does not
    expose host grouping directly, so: the launcher-provided env var wins; otherwise
    infer rank-among-co-hosted-processes from which processes own this host's devices
    (single-process and one-process-per-host topologies both yield 0)."""
    import os

    for var in ("LOCAL_RANK", "SLURM_LOCALID"):
        if var in os.environ:
            return int(os.environ[var])
    if jax.process_count() == 1:
        return 0
    # One-process-per-host is the standard JAX topology: local rank is 0. For
    # multi-process-per-host launches the launcher must provide LOCAL_RANK /
    # SLURM_LOCALID (same contract as the reference's torchrun path).
    return 0
