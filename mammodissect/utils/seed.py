"""Deterministic seeding.

Replaces the reference's external `seed_all` (used at `Classifiers/experiments.py:46`) and
`util/utils.py:seed_everything`. In JAX, device randomness is carried explicitly through PRNG
keys, so this seeds only host-side RNGs (python / numpy) and returns a root `jax.random` key
for everything device-side."""
from __future__ import annotations

import os
import random

import numpy as np


def seed_all(seed: int = 10):
    """Seed python/numpy host RNGs and return a root JAX PRNG key.

    The reference's torch equivalent also sets cudnn determinism flags; on TPU, XLA
    compilation is deterministic by construction and all jax randomness flows from the
    returned key.
    """
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    import jax

    return jax.random.PRNGKey(seed)


# alias matching `util/utils.py` in the reference
seed_everything = seed_all


def convert_dictconfig_to_dict(cfg):
    """Recursively convert an omegaconf DictConfig (or any mapping) to plain dicts
    (`util/utils.py` parity); works without omegaconf installed."""
    try:
        from omegaconf import OmegaConf

        if OmegaConf.is_config(cfg):
            return OmegaConf.to_container(cfg, resolve=True)
    except ImportError:
        pass
    if isinstance(cfg, dict):
        return {k: convert_dictconfig_to_dict(v) for k, v in cfg.items()}
    if isinstance(cfg, (list, tuple)):
        return type(cfg)(convert_dictconfig_to_dict(v) for v in cfg)
    return cfg
