"""BreastClip contrastive pretraining step (capability surface of SURVEY.md §3.5).

The reference carries the loss config {label_smoothing, i2i_weight 1.0, t2t_weight 0.5}
through `concept_vit/utils.py:443` / `model/clip.py:21`; the loop itself lives in the
external Mammo-CLIP codebase. Here the step is a first-class pjit program:

- batch sharded over Mesh 'data' (DP): the contrastive logits are computed on the
  GLOBAL batch — under global-view SPMD, XLA inserts the all-gather that the
  reference's `DistAutogradAllGatherFunction` (`util/dist_autograd.py`) hand-rolls,
  and autodiff provides the reduce-scatter transpose.
- optional tensor parallelism over 'model' for the BERT tower + projections
  (parallel/sharding.param_shardings): annotation-only, collectives by XLA.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import optax

from mammodissect.parallel.sharding import batch_sharding, param_shardings, replicated
from mammodissect.train.losses import clip_contrastive_loss


def make_clip_train_step(module, tx, label_smoothing: float = 0.0,
                         i2i_weight: float = 1.0, t2t_weight: float = 0.5,
                         input_wire: str = "f32", norm_mean: float = 0.0,
                         norm_std: float = 1.0):
    """Returns step(params, batch_stats, opt_state, batch, rng) ->
    (params, batch_stats, opt_state, loss). Jit it with shardings from the caller.

    input_wire='u8': batch images/image_views arrive as post-transform uint8
    (4x fewer host->device bytes) and are min-max + mean/std normalized INSIDE
    the step (ops/normalize.u8_minmax_meanstd — the reference's own pre-normalize
    contract is uint8, so numerics are unchanged)."""

    def step(params, batch_stats, opt_state, batch, rng):
        if input_wire == "u8":
            from mammodissect.ops.normalize import u8_minmax_meanstd

            batch = dict(batch)
            for k in ("images", "image_views"):
                if k in batch:
                    batch[k] = u8_minmax_meanstd(batch[k], norm_mean, norm_std)

        def loss_fn(p):
            out, mutated = module.apply(
                {"params": p, "batch_stats": batch_stats},
                batch,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            loss = clip_contrastive_loss(
                out["image_embeddings"],
                out["text_embeddings"],
                out["logit_scale"],
                label_smoothing=label_smoothing,
                image_view_embeddings=out.get("image_view_embeddings"),
                text_embeddings2=out.get("text_embeddings2"),
                i2i_weight=i2i_weight,
                t2t_weight=t2t_weight,
            )
            return loss, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_stats, new_opt, loss

    return step


def jit_clip_train_step(module, tx, mesh, tensor_parallel: bool = False,
                        variables: Optional[Dict] = None, **loss_kw):
    """Jit the step with DP batch sharding (+ optional TP param shardings)."""
    step = make_clip_train_step(module, tx, **loss_kw)
    b = batch_sharding(mesh)
    rep = replicated(mesh)
    if tensor_parallel and variables is not None:
        p_shard = param_shardings(mesh, variables["params"], tensor_parallel=True)
        s_shard = param_shardings(mesh, variables.get("batch_stats", {}), tensor_parallel=True)
    else:
        p_shard = rep
        s_shard = rep
    return jax.jit(
        step,
        in_shardings=(p_shard, s_shard, None, b, None),
        out_shardings=(p_shard, s_shard, None, None),
        donate_argnums=(0, 1, 2),
    )
