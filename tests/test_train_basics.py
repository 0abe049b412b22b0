"""Schedule + loss unit tests (reference recipe: warmup-cosine, CE/weighted-BCE,
contrastive; `Classifiers/experiments.py:144-172`, `model/clip.py:103-137`)."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mammodissect.train import (
    bce_with_logits,
    clip_contrastive_loss,
    linear_warmup_cosine_annealing,
    softmax_cross_entropy,
)


def test_schedule_warmup_then_cosine():
    sched = linear_warmup_cosine_annealing(base_lr=1e-3, warmup_steps=10, total_steps=110)
    assert float(sched(0)) == pytest.approx(0.0)
    assert float(sched(5)) == pytest.approx(5e-4)
    assert float(sched(10)) == pytest.approx(1e-3)
    # cosine midpoint: halfway through decay -> base_lr/2
    assert float(sched(60)) == pytest.approx(5e-4, rel=1e-2)
    assert float(sched(110)) == pytest.approx(0.0, abs=1e-9)


def test_schedule_no_warmup():
    sched = linear_warmup_cosine_annealing(base_lr=2.0, warmup_steps=0, total_steps=100)
    assert float(sched(0)) == pytest.approx(2.0)


def test_ce_matches_manual():
    logits = jnp.array([[2.0, 0.0, -1.0], [0.0, 1.0, 0.0]])
    labels = jnp.array([0, 1])
    want = -np.mean(
        [
            np.log(np.exp(2.0) / (np.exp(2.0) + 1 + np.exp(-1.0))),
            np.log(np.exp(1.0) / (2 + np.exp(1.0))),
        ]
    )
    assert float(softmax_cross_entropy(logits, labels)) == pytest.approx(want, rel=1e-6)


def test_ce_label_smoothing_increases_loss_on_confident_preds():
    logits = jnp.array([[10.0, -10.0]])
    labels = jnp.array([0])
    plain = float(softmax_cross_entropy(logits, labels))
    smoothed = float(softmax_cross_entropy(logits, labels, label_smoothing=0.1))
    assert smoothed > plain


def test_bce_matches_torch_semantics():
    import torch

    logits = np.array([0.5, -1.2, 2.0, 0.0], dtype=np.float32)
    labels = np.array([1.0, 0.0, 1.0, 0.0], dtype=np.float32)
    for pw in (None, 15.57):
        got = float(bce_with_logits(jnp.array(logits), jnp.array(labels), pos_weight=pw))
        crit = torch.nn.BCEWithLogitsLoss(
            pos_weight=None if pw is None else torch.tensor([pw])
        )
        want = float(crit(torch.tensor(logits), torch.tensor(labels)))
        assert got == pytest.approx(want, rel=1e-5)


def test_contrastive_loss_perfect_alignment_is_low():
    d = 16
    emb = jax.nn.standardize(jax.random.normal(jax.random.PRNGKey(0), (8, d)), axis=-1)
    emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    aligned = float(clip_contrastive_loss(emb, emb, logit_scale=1 / 0.07))
    shuffled = float(clip_contrastive_loss(emb, emb[::-1], logit_scale=1 / 0.07))
    assert aligned < 0.01
    assert shuffled > aligned + 1.0


def test_contrastive_extra_views_add_weighted_terms():
    key = jax.random.PRNGKey(1)
    e = jax.random.normal(key, (6, 8))
    e = e / jnp.linalg.norm(e, axis=-1, keepdims=True)
    base = float(clip_contrastive_loss(e, e, 1.0))
    with_views = float(
        clip_contrastive_loss(
            e, e, 1.0, image_view_embeddings=e, text_embeddings2=e,
            i2i_weight=1.0, t2t_weight=0.5,
        )
    )
    assert with_views == pytest.approx(base * (1 + 1.0 + 0.5), rel=1e-5)
