"""Shared NN building blocks (TPU-first, NHWC).

Replaces the reference's vendored torch layer zoo (`model/modules/efficient_net_custom_utils.py`):
- TF-"SAME" padding Conv2d static/dynamic variants (:199-358) -> XLA's native 'SAME'
  padding on `flax.linen.Conv` (identical asymmetric-padding semantics, zero custom code).
- Swish / MemoryEfficientSwish custom autograd (:64-80) -> `jax.nn.silu` (XLA fuses it).
- drop_connect (:129) -> `drop_connect` below (row-wise stochastic depth).
- round_filters / round_repeats (:83-127) -> same arithmetic.
- GeM pooling (`model/modules/image_encoder.py:55-97`) -> `GeM` module over NHWC.
- Projection heads (`model/modules/projection.py`) -> `LinearProjectionHead`, `MLPProjectionHead`.
- LinearClassifier (`model/modules/image_classifier.py:4-10`).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn


def round_filters(filters: int, width_coefficient: float | None, depth_divisor: int = 8,
                  min_depth: int | None = None) -> int:
    """EfficientNet channel rounding (reference `efficient_net_custom_utils.py:83-110`)."""
    if not width_coefficient:
        return filters
    filters *= width_coefficient
    min_depth = min_depth or depth_divisor
    new_filters = max(min_depth, int(filters + depth_divisor / 2) // depth_divisor * depth_divisor)
    if new_filters < 0.9 * filters:  # prevent >10% reduction
        new_filters += depth_divisor
    return int(new_filters)


def round_repeats(repeats: int, depth_coefficient: float | None) -> int:
    """EfficientNet depth rounding (reference `efficient_net_custom_utils.py:112-127`)."""
    if not depth_coefficient:
        return repeats
    return int(math.ceil(depth_coefficient * repeats))


def drop_connect(x: jax.Array, rate: float, deterministic: bool, rng: jax.Array | None) -> jax.Array:
    """Stochastic depth on the residual branch (reference `efficient_net_custom_utils.py:129-150`):
    per-sample Bernoulli keep with rescaling."""
    if deterministic or rate == 0.0:
        return x
    keep_prob = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep_prob, shape=shape)
    return jnp.where(mask, x / keep_prob, 0.0)


class GeM(nn.Module):
    """Generalized-mean pooling over spatial dims of NHWC, with learnable exponent p
    (reference `model/modules/image_encoder.py:55-97`, p init 3.0, eps 1e-6)."""

    p_init: float = 3.0
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from mammodissect.ops.pooling import gem_pool

        p = self.param("p", lambda _: jnp.asarray(self.p_init, jnp.float32))
        # fp32: the power mean is numerically fragile in bf16 towers
        return gem_pool(x.astype(jnp.float32), p, self.eps)


class SqueezeExcite(nn.Module):
    """SE block: global-avg -> 1x1 reduce -> silu -> 1x1 expand -> sigmoid gate
    (reference `efficientnet_custom.py:84-96` MBConvBlock SE branch)."""

    num_squeezed: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.num_squeezed, (1, 1), name="se_reduce", dtype=self.dtype)(s)
        s = jax.nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), name="se_expand", dtype=self.dtype)(s)
        return x * jax.nn.sigmoid(s)


class LinearProjectionHead(nn.Module):
    """Single linear projection (reference `model/modules/projection.py:20-28`)."""

    embedding_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        return nn.Dense(self.embedding_dim, name="projection", dtype=self.dtype)(x)


class MLPProjectionHead(nn.Module):
    """linear -> GELU -> linear -> dropout -> residual -> LayerNorm
    (reference `model/modules/projection.py:4-19`)."""

    embedding_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        projected = nn.Dense(self.embedding_dim, name="projection", dtype=self.dtype)(x)
        h = jax.nn.gelu(projected, approximate=False)
        h = nn.Dense(self.embedding_dim, name="fc", dtype=self.dtype)(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(name="layer_norm")(h + projected)


class LinearClassifier(nn.Module):
    """Single dense head (reference `model/modules/image_classifier.py:4-10`)."""

    n_class: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Dense(self.n_class, name="fc", dtype=self.dtype)(x)
