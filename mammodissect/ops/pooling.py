"""Activation pooling rules + GeM pooling.

Re-implements the reference's hook pooling contract (`concept_vit/utils.py:27-52`):
  4-D CNN feature map  -> spatial mean ('avg') or amax ('max')
  3-D ViT tokens       -> CLS token [:, 0] (both modes)
  2-D FC output        -> identity (both modes)

The reference is NCHW; this framework is NHWC (TPU-native conv layout), so 4-D pooling
reduces over axes (1, 2). `pool_activation` accepts either layout via `data_format`."""
from __future__ import annotations

import jax
import jax.numpy as jnp

PM_SUFFIX = {"max": "_max", "avg": ""}  # save-name suffix parity (`utils.py:16`)


def pool_activation(x: jax.Array, mode: str = "avg", data_format: str = "NHWC") -> jax.Array:
    """Pool a captured activation to [batch, features] per the reference's rules."""
    if mode not in ("avg", "max"):
        raise ValueError(f"pool mode must be 'avg' or 'max', got {mode!r}")
    if x.ndim == 4:
        axes = (1, 2) if data_format == "NHWC" else (2, 3)
        return jnp.mean(x, axis=axes) if mode == "avg" else jnp.max(x, axis=axes)
    if x.ndim == 3:  # ViT tokens [B, T, D] -> CLS
        return x[:, 0]
    if x.ndim == 2:  # FC
        return x
    raise ValueError(f"cannot pool activation of rank {x.ndim}")


def gem_pool(x: jax.Array, p: jax.Array | float = 3.0, eps: float = 1e-6) -> jax.Array:
    """Generalized-mean pooling over spatial dims of an NHWC feature map
    (reference `model/modules/image_encoder.py:55-97`): (mean(clip(x, eps)^p))^(1/p)."""
    x = jnp.clip(x, eps, None)
    pooled = jnp.mean(x**p, axis=(1, 2))
    return pooled ** (1.0 / p)
