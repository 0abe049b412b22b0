"""Classifier models for fine-tune / dissection of fine-tuned checkpoints.

- `BreastClipClassifierModule`: EfficientNet(-Mammo) encoder + linear head — the
  reference's `BreastClipClassifier` (`Classifiers/models/breast_clip_classifier.py:6-81`):
  built from a Mammo-CLIP ckpt's image encoder, frozen for `*_lp` linear-probe archs
  (`:41-49`), `encode_image` caches pooled features (`:58-68`), forward = encode→classify.
- `MammoClassificationModule`: encoder + head with optional frozen encoder whose
  BatchNorm stays in eval mode during training (`model/image_classification.py:50-61`).
- `MammoEfficientNetModule`: backbone + GeM + fc(1) (`model/mamo_efficient_net.py`).

Freezing is done the JAX way: `frozen_param_labels` returns an optax.multi_transform
label tree ('frozen' vs 'train') instead of requires_grad flags."""
from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from mammodissect.models.efficientnet import EfficientNetMammo
from mammodissect.models.layers import LinearClassifier


class BreastClipClassifierModule(nn.Module):
    variant: str = "efficientnet-b5"
    # the reference classifier rebuilds the '-detect' encoder from the clip ckpt config
    # (`breast_clip_classifier.py:9-39`) and feeds it PIL-RGB mammograms
    # (`dataset_concepts.py:168-227`): 3-channel. Grayscale input is broadcast on device.
    in_channels: int = 3
    n_class: int = 1
    freeze_encoder: bool = False  # True for '*_lp' linear-probe archs
    bn_momentum: float = 0.99
    pad_mode: str = "static"  # "same" for geometries far from the traced resolution
    remat: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.image_encoder = EfficientNetMammo(
            variant=self.variant, in_channels=self.in_channels,
            bn_momentum=self.bn_momentum, pad_mode=self.pad_mode,
            remat=self.remat, dtype=self.dtype,
        )
        self.classifier = LinearClassifier(self.n_class, dtype=self.dtype)

    def encode_image(self, images, train: bool = False, capture: Sequence[int] = (),
                     pool_mode: str = "avg"):
        # frozen (linear-probe) encoders run in eval mode even during training,
        # mirroring MammoClassification.train() keeping the encoder eval
        # (`model/image_classification.py:50-61`)
        enc_train = train and not self.freeze_encoder
        pooled, captured = self.image_encoder(
            images, train=enc_train, capture=capture, pool_mode=pool_mode
        )
        return pooled, captured

    def __call__(self, images, train: bool = False, capture: Sequence[int] = (),
                 pool_mode: str = "avg"):
        pooled, captured = self.encode_image(images, train=train, capture=capture,
                                             pool_mode=pool_mode)
        logits = self.classifier(pooled)
        if capture:
            return logits, captured
        return logits


def frozen_param_labels(params: Dict, freeze_encoder: bool) -> Dict:
    """optax.multi_transform label tree: encoder params 'frozen' when linear-probing,
    everything else 'train' (replaces requires_grad=False at
    `breast_clip_classifier.py:41-49`)."""

    def label(path, _leaf):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        return "frozen" if (freeze_encoder and top == "image_encoder") else "train"

    return jax.tree_util.tree_map_with_path(label, params)


def arch_is_linear_probe(arch: str) -> bool:
    """`*_lp` archs are linear probes (`breast_clip_classifier.py:41`,
    `describe_broad_neurons.py:45-48` arch naming)."""
    return arch.endswith("_lp")


def arch_variant(arch: str) -> str:
    """Map reference arch strings (upmc_breast_clip_det_b5_period_n_ft / ..._b2_...) to
    an EfficientNet variant (any bN tag is recognized; default b5)."""
    import re

    if "efficientnetv2" in arch or "_v2" in arch:
        return "efficientnetv2-s"
    if "_test_" in arch or arch.endswith("_test"):
        return "efficientnet-test"  # 7-block smoke-test variant
    m = re.search(r"_b([0-7])(_|$)", arch)
    if m:
        return f"efficientnet-b{m.group(1)}"
    return "efficientnet-b5"


class MammoEfficientNetModule(nn.Module):
    """timm-style backbone + GeM + single-logit fc (`model/mamo_efficient_net.py:16-91`)."""

    variant: str = "efficientnet-b5"
    in_channels: int = 1
    n_class: int = 1
    return_features: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pooled, _ = EfficientNetMammo(
            variant=self.variant, in_channels=self.in_channels, pooling="gem",
            dtype=self.dtype, name="encoder",
        )(x, train=train)
        logits = nn.Dense(self.n_class, name="fc", dtype=self.dtype)(pooled)
        if self.return_features:
            return pooled, logits
        return logits
