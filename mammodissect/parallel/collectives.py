"""Collectives.

`all_gather_with_grad` is the shard_map-level equivalent of the reference's
`DistAutogradAllGatherFunction` (`util/dist_autograd.py:5-27`: forward all_gather,
backward reduce_scatter/slice) — in JAX, `jax.lax.all_gather` inside a differentiated
shard_map'd function gets its transpose (reduce-scatter) from autodiff automatically,
so the whole custom autograd class reduces to one primitive call.

Under global-view pjit (the default path in this framework) even this is unnecessary:
contrastive logits over the global batch are just a matmul on the global arrays and XLA
inserts the collectives. This module exists for explicit shard_map code paths and parity
documentation."""
from __future__ import annotations

import jax


def all_gather_with_grad(x: jax.Array, axis_name: str, tiled: bool = True) -> jax.Array:
    """Differentiable all-gather along a mapped mesh axis (use inside shard_map/pmap)."""
    return jax.lax.all_gather(x, axis_name, tiled=tiled)


def psum(x, axis_name: str):
    return jax.lax.psum(x, axis_name)


def pmean(x, axis_name: str):
    return jax.lax.pmean(x, axis_name)
