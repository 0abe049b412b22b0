"""Orbax checkpointing (SURVEY.md §5 checkpoint/resume plan).

The reference saves `{'model': state_dict, 'predictions', 'epoch', 'accuracy'/'auroc',
'f1'}` on best-metric improvement only (`Classifiers/experiments.py:243-276`) and never
persists optimizer state. Here checkpoints carry params + batch_stats + opt_state +
step + metrics + predictions, so training is resumable mid-run — and `load_for_eval`
gives the reference-shaped view."""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def _to_host(tree):
    """device_get, EXCEPT for arrays spanning non-addressable devices (multi-host
    tensor-parallel shards): device_get raises on those, and orbax saves
    distributed jax.Arrays natively (each host writes its own shards), so they
    pass through untouched."""
    import jax

    def leaf(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return x
        return jax.device_get(x)

    return jax.tree_util.tree_map(leaf, tree)


def save_checkpoint(path: str, trainer_state, epoch: int, metrics: Dict[str, float],
                    predictions: Optional[np.ndarray] = None):
    from flax import serialization

    path = os.path.abspath(path)
    payload = {
        "params": _to_host(trainer_state.params),
        "batch_stats": _to_host(trainer_state.batch_stats),
        # to_state_dict: plain-dict form that from_state_dict can rebuild into the
        # optax NamedTuple structure on resume
        "opt_state": serialization.to_state_dict(_to_host(trainer_state.opt_state)),
        "step": np.asarray(trainer_state.step),
        "epoch": np.asarray(epoch),
        "metrics": {k: np.asarray(v) for k, v in metrics.items()},
    }
    if predictions is not None:
        payload["predictions"] = np.asarray(predictions)
    _checkpointer().save(path, payload, force=True)
    return path


def load_checkpoint(path: str, template: Optional[Dict] = None) -> Dict[str, Any]:
    """Restore; pass `template` (a matching pytree, e.g. the live trainer payload) to
    recover original container types (optax NamedTuple opt_states restore as plain
    dicts otherwise)."""
    ckptr = _checkpointer()
    path = os.path.abspath(path)
    if template is not None:
        try:
            return ckptr.restore(path, item=template)
        except TypeError:  # newer orbax arg spelling
            import orbax.checkpoint as ocp

            return ckptr.restore(path, args=ocp.args.PyTreeRestore(item=template))
    return ckptr.restore(path)


def load_for_eval(path: str) -> Dict[str, Any]:
    """{'variables': {params, batch_stats}, 'predictions', 'epoch', metrics...}."""
    ckpt = load_checkpoint(path)
    return {
        "variables": {"params": ckpt["params"], "batch_stats": ckpt.get("batch_stats", {})},
        "predictions": ckpt.get("predictions"),
        "epoch": int(ckpt.get("epoch", -1)),
        "metrics": ckpt.get("metrics", {}),
    }
