"""Losses.

- `softmax_cross_entropy`: CE with optional label smoothing (reference uses
  `torch.nn.CrossEntropyLoss` for density/birads/cancer_birads, `experiments.py:164-166`).
- `bce_with_logits`: weighted binary CE (reference `BCEWithLogitsLoss(pos_weight=...)`,
  `experiments.py:167-172`; per-task pos-weights at `lumi_single_gpu_train_classifier.py:156-184`).
- `clip_contrastive_loss`: the Mammo-CLIP pretraining objective carried by the loss config
  `{label_smoothing, i2i_weight, t2t_weight}` (`concept_vit/utils.py:443`, `model/clip.py:21`;
  SURVEY.md §3.5). Under pjit global-view SPMD the logits are computed over the *global*
  batch automatically — XLA inserts the all-gather that the reference's
  `util/dist_autograd.py` DistAutogradAllGatherFunction implements by hand, and JAX autodiff
  provides the reduce-scatter transpose.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def softmax_cross_entropy(logits, labels, label_smoothing: float = 0.0, weights=None):
    """Mean CE over the batch. `labels` are integer class ids [B]; logits [B, C]."""
    n_class = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, n_class, dtype=logits.dtype)
    if label_smoothing > 0.0:
        onehot = onehot * (1.0 - label_smoothing) + label_smoothing / n_class
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.sum(onehot * logp, axis=-1)
    if weights is not None:
        loss = loss * weights
        return jnp.sum(loss) / jnp.maximum(jnp.sum(weights), 1e-12)
    return jnp.mean(loss)


def bce_with_logits(logits, labels, pos_weight: float | jax.Array | None = None,
                    weights=None):
    """Mean binary CE with optional positive-class weight (torch BCEWithLogitsLoss
    semantics: loss = -[w_p·y·log σ(x) + (1−y)·log(1−σ(x))], mean reduction).
    `weights` [B]: per-row mask/weight — a weighted mean, used to exclude the
    wrap-padded tail rows of a static-shape batch."""
    logits = logits.reshape(-1).astype(jnp.float32)
    labels = labels.reshape(-1).astype(jnp.float32)
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    w = 1.0 if pos_weight is None else pos_weight
    loss = -(w * labels * log_p + (1.0 - labels) * log_not_p)
    if weights is not None:
        weights = weights.reshape(-1).astype(jnp.float32)
        # multi-label logits [B, C] flattened to B*C elements: average per row
        # first so the row mask applies cleanly
        per_row = loss.reshape(weights.shape[0], -1).mean(axis=1)
        return jnp.sum(per_row * weights) / jnp.maximum(jnp.sum(weights), 1e-12)
    return jnp.mean(loss)


def clip_contrastive_loss(
    image_embeddings,
    text_embeddings,
    logit_scale,
    label_smoothing: float = 0.0,
    image_view_embeddings=None,
    text_embeddings2=None,
    i2i_weight: float = 0.0,
    t2t_weight: float = 0.0,
):
    """Symmetric InfoNCE over the (global) batch, plus optional image-image and text-text
    views mirroring BreastClip.forward's extra outputs (`model/clip.py:119-136`).

    Embeddings must be L2-normalized; `logit_scale` is exp(log 1/T) (T=0.07 default,
    `model/clip.py:37-41`). Labels are arange(B) as in `model/clip.py:117`."""
    b = image_embeddings.shape[0]
    labels = jnp.arange(b)
    logits = logit_scale * jnp.dot(
        image_embeddings, text_embeddings.T, preferred_element_type=jnp.float32
    )
    loss_i2t = softmax_cross_entropy(logits, labels, label_smoothing)
    loss_t2i = softmax_cross_entropy(logits.T, labels, label_smoothing)
    loss = 0.5 * (loss_i2t + loss_t2i)
    if image_view_embeddings is not None and i2i_weight > 0.0:
        logits_ii = logit_scale * jnp.dot(
            image_embeddings, image_view_embeddings.T, preferred_element_type=jnp.float32
        )
        loss = loss + i2i_weight * 0.5 * (
            softmax_cross_entropy(logits_ii, labels, label_smoothing)
            + softmax_cross_entropy(logits_ii.T, labels, label_smoothing)
        )
    if text_embeddings2 is not None and t2t_weight > 0.0:
        logits_tt = logit_scale * jnp.dot(
            text_embeddings, text_embeddings2.T, preferred_element_type=jnp.float32
        )
        loss = loss + t2t_weight * 0.5 * (
            softmax_cross_entropy(logits_tt, labels, label_smoothing)
            + softmax_cross_entropy(logits_tt.T, labels, label_smoothing)
        )
    return loss
