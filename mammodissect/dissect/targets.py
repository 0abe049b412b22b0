"""Target-model adapters: things that can be dissected.

Replaces the reference's `get_target_model(name, device, ...)`
(`concept_vit/data_utils.py:38-93`) — a registry instead of eval()'d torchvision lookups.

A target exposes:
  harvest(images_nhwc, layers, pool_mode) -> {canonical_layer: [B, C] float32}
where `layers` are canonical names (see capture.py) and the whole harvest of all
requested layers is ONE jitted forward (the reference already harvests all 39 layers in
a single pass via hooks, `utils.py:167-186`; XLA makes it a single compiled program)."""
from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mammodissect.dissect.capture import canonical_layer_name, layer_index
from mammodissect.models.efficientnet import EfficientNet, EfficientNetMammo
from mammodissect.utils.registry import Registry

TARGETS: Registry = Registry("target_model")


class EfficientNetTarget:
    """Dissect an EfficientNet(-Mammo) encoder's MBConv blocks ('blocks.i')."""

    def __init__(self, model, variables, dtype=jnp.float32):
        self.model = model
        self.variables = variables
        self._jitted = {}

    def _fn(self, capture: tuple, pool_mode: str):
        key = (capture, pool_mode)
        if key not in self._jitted:

            @jax.jit
            def fn(variables, x):
                _, captured = self.model.apply(
                    variables, x, train=False, capture=capture, pool_mode=pool_mode
                )
                return captured

            self._jitted[key] = fn
        return self._jitted[key]

    def harvest(self, images: np.ndarray, layers: Sequence[str], pool_mode: str = "avg"):
        canon = [canonical_layer_name(l) for l in layers]
        capture = tuple(sorted({layer_index(c) for c in canon}))
        out = self._fn(capture, pool_mode)(self.variables, jnp.asarray(images))
        return {k: np.asarray(v) for k, v in out.items()}


@TARGETS.register("tiny_cnn")
def _tiny_cnn(seed: int = 0, in_channels: int = 1, **_):
    """Small deterministic EfficientNet-B0 target for tests/CI (64x64 inputs)."""
    model = EfficientNet(variant="efficientnet-b0", in_channels=in_channels)
    variables = model.init(
        jax.random.PRNGKey(seed), jnp.ones((1, 64, 64, in_channels), jnp.float32)
    )
    return EfficientNetTarget(model, variables)


@TARGETS.register("breastclip")
def _breastclip_encoder(ckpt_path: str | None = None, variant: str = "efficientnet-b5",
                        image_shape=(1520, 912, 1), seed: int = 0, **_):
    """The Mammo-CLIP EfficientNet-B5 image encoder (`utils.py:434-446` hardcoded config);
    loads a converted torch checkpoint when given (`--Breast_clip_chkpt`)."""
    model = EfficientNetMammo(variant=variant, in_channels=image_shape[-1])
    h, w, c = image_shape
    variables = model.init(jax.random.PRNGKey(seed), jnp.ones((1, h, w, c), jnp.float32))
    if ckpt_path:
        from mammodissect.utils.torch_convert import load_breastclip_image_encoder

        variables = load_breastclip_image_encoder(ckpt_path, variables)
    return EfficientNetTarget(model, variables)


def get_target_model(name: str, **kw):
    return TARGETS.get(name)(**kw)
