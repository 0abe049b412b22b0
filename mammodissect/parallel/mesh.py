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
            local_rank=jax.process_index(),
            num_devices=jax.local_device_count(),
            master=jax.process_index() == 0,
        )
