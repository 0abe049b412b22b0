"""Sharding plans.

The TPU analogue of the reference's DDP + DistributedSampler (SURVEY.md §2.8): under
global-view pjit, DP means the batch is sharded over the 'data' axis and params are
replicated — XLA inserts the gradient all-reduce the reference gets implicitly from
DDP's backward hooks (`Classifiers/experiments.py:140`).

Beyond parity, `param_shardings` also emits a tensor-parallel plan over 'model' for the
BERT tower (column-parallel intermediate / row-parallel output, Megatron-style) and the
projection heads — sharding annotations only; XLA's SPMD partitioner inserts the
collectives (scaling-book recipe: pick mesh, annotate, let XLA do the rest)."""
from __future__ import annotations

import re
from typing import Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mammodissect.parallel.mesh import DATA_AXIS, MODEL_AXIS


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch with every array's leading axis sharded over 'data'."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate_tree(mesh: Mesh, tree):
    """Device-put every leaf replicated over the mesh, with a DEFENSIVE COPY:
    donated train steps consume their inputs, and device_put may alias the
    caller's buffers (which would delete them out from under the caller)."""
    import jax.numpy as jnp
    import numpy as np

    rep = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.array(np.asarray(x), copy=True), rep), tree)


# Megatron-style TP rules for our BERT module names (bert.py) + projection heads.
# Matched against 'path/like/this'; first hit wins. kernel layout is [in, out]:
# column-parallel => shard out (last dim), row-parallel => shard in (first dim).
_TP_RULES = [
    # attention QKV: column-parallel
    (re.compile(r".*attention/(query|key|value)/kernel$"), P(None, MODEL_AXIS)),
    (re.compile(r".*attention/(query|key|value)/bias$"), P(MODEL_AXIS)),
    # attention output: row-parallel
    (re.compile(r".*attention_output/kernel$"), P(MODEL_AXIS, None)),
    # MLP in: column-parallel; MLP out: row-parallel
    (re.compile(r".*intermediate/kernel$"), P(None, MODEL_AXIS)),
    (re.compile(r".*intermediate/bias$"), P(MODEL_AXIS)),
    (re.compile(r".*layers_\d+/output/kernel$"), P(MODEL_AXIS, None)),
    # projection heads: column-parallel
    (re.compile(r".*(image_projection|text_projection)/projection/kernel$"), P(None, MODEL_AXIS)),
    # embeddings: shard vocab dim of the word embedding table
    (re.compile(r".*word_embeddings/embedding$"), P(MODEL_AXIS, None)),
]


def _spec_for(path: str, tensor_parallel: bool, shape=None, axis_sizes=None) -> P:
    if tensor_parallel:
        for rule, spec in _TP_RULES:
            if rule.match(path):
                if shape is not None and axis_sizes is not None:
                    # a dim that doesn't divide the axis cannot be sharded — replicate
                    for dim, axis in enumerate(spec):
                        if axis is not None and (
                            dim >= len(shape) or shape[dim] % axis_sizes.get(axis, 1) != 0
                        ):
                            return P()
                return spec
    return P()


def param_shardings(mesh: Mesh, variables: Dict, tensor_parallel: bool = False):
    """NamedSharding pytree matching `variables`. With tensor_parallel=False this is the
    pure-DP plan (everything replicated)."""

    flat = jax.tree_util.tree_flatten_with_path(variables)[0]

    def path_str(kp):
        parts = []
        for k in kp:
            if hasattr(k, "key"):
                parts.append(str(k.key))
            elif hasattr(k, "idx"):
                parts.append(str(k.idx))
            else:
                parts.append(str(k))
        return "/".join(parts)

    axis_sizes = dict(mesh.shape)
    specs = {
        path_str(kp): _spec_for(
            path_str(kp), tensor_parallel,
            shape=getattr(leaf, "shape", None), axis_sizes=axis_sizes,
        )
        for kp, leaf in flat
    }

    def to_sharding(kp, _leaf):
        return NamedSharding(mesh, specs[path_str(kp)])

    return jax.tree_util.tree_map_with_path(to_sharding, variables)
