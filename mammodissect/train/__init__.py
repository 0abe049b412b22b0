"""Classifier fine-tune / eval engine (L5b of the reference layer map)."""

from mammodissect.train.schedule import linear_warmup_cosine_annealing
from mammodissect.train.losses import (
    bce_with_logits,
    clip_contrastive_loss,
    softmax_cross_entropy,
)

__all__ = [
    "linear_warmup_cosine_annealing",
    "bce_with_logits",
    "softmax_cross_entropy",
    "clip_contrastive_loss",
]
