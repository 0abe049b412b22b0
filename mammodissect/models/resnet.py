"""ResNet family in Flax (torchvision-compatible geometry), NHWC.

Covers the reference's ResNet surfaces:
- CLIP-Dissect targets: torchvision resnet18/34/50/101/152 + resnet18_places, hooked at
  conv1/layer1..layer4 (`describe_clip_neurons.py` defaults
  'conv1,layer1,layer2,layer3,layer4'; `concept_vit/data_utils.py:80-89`)
- BreastClip image-encoder options resnet101/152 (`model/modules/__init__.py:47-52`,
  stage-by-stage manual forward `model/modules/image_encoder.py:123-155`)

Capture: named points 'conv1' (the conv module's output, pre-BN/ReLU — the
reference hooks the `conv1` Conv2d, `utils.py:80`) and 'layerN' (post stage), pooled
spatially in-jit per the 4-D rule. Torch weights import via `resnet_torch_to_flax`
(torchvision state-dict names conv1/bn1/layerN.M.{conv1,bn1,...,downsample})."""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mammodissect.ops.pooling import pool_activation


class BasicBlock(nn.Module):
    filters: int
    stride: int = 1
    dtype: Any = jnp.float32
    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                       epsilon=1e-5, name=name, dtype=self.dtype)
        identity = x
        out = nn.Conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False, name="conv1",
                      dtype=self.dtype)(x)
        out = jax.nn.relu(bn("bn1")(out))
        out = nn.Conv(self.filters, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                      name="conv2", dtype=self.dtype)(out)
        out = bn("bn2")(out)
        if self.stride != 1 or x.shape[-1] != self.filters:
            identity = nn.Conv(self.filters, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, name="downsample_conv", dtype=self.dtype)(x)
            identity = bn("downsample_bn")(identity)
        return jax.nn.relu(out + identity)


class Bottleneck(nn.Module):
    filters: int
    stride: int = 1
    dtype: Any = jnp.float32
    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                       epsilon=1e-5, name=name, dtype=self.dtype)
        identity = x
        out_f = self.filters * 4
        out = nn.Conv(self.filters, (1, 1), use_bias=False, name="conv1",
                      dtype=self.dtype)(x)
        out = jax.nn.relu(bn("bn1")(out))
        out = nn.Conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False, name="conv2",
                      dtype=self.dtype)(out)
        out = jax.nn.relu(bn("bn2")(out))
        out = nn.Conv(out_f, (1, 1), use_bias=False, name="conv3", dtype=self.dtype)(out)
        out = bn("bn3")(out)
        if self.stride != 1 or x.shape[-1] != out_f:
            identity = nn.Conv(out_f, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, name="downsample_conv", dtype=self.dtype)(x)
            identity = bn("downsample_bn")(identity)
        return jax.nn.relu(out + identity)


RESNET_SPECS: Dict[str, Tuple[type, Tuple[int, ...]]] = {
    "resnet18": (BasicBlock, (2, 2, 2, 2)),
    "resnet34": (BasicBlock, (3, 4, 6, 3)),
    "resnet50": (Bottleneck, (3, 4, 6, 3)),
    "resnet101": (Bottleneck, (3, 4, 23, 3)),
    "resnet152": (Bottleneck, (3, 8, 36, 3)),
}


class ResNet(nn.Module):
    variant: str = "resnet50"
    num_classes: int = 1000
    in_channels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, capture: Sequence[str] = (),
                 pool_mode: str = "avg"):
        block_cls, stages = RESNET_SPECS[self.variant]
        captured: Dict[str, jax.Array] = {}

        if x.shape[-1] == 1:
            # grayscale probes broadcast to RGB (the reference's imagenet
            # preprocess PIL-converts to RGB before these towers; same rule as
            # the EfficientNet/Swin/ViT encoders here)
            x = jnp.repeat(x, 3, axis=-1)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, name="conv1", dtype=self.dtype)(x)
        if "conv1" in capture:
            # the reference hooks the `conv1` MODULE (`utils.py:80`), whose output
            # is pre-BatchNorm pre-ReLU — capture here, not after bn1/relu
            captured["conv1"] = pool_activation(x.astype(jnp.float32), pool_mode)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         name="bn1", dtype=self.dtype)(x)
        x = jax.nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))

        filters = 64
        for si, n_blocks in enumerate(stages):
            for bi in range(n_blocks):
                stride = 2 if (si > 0 and bi == 0) else 1
                x = block_cls(filters, stride=stride, dtype=self.dtype,
                              name=f"layer{si + 1}_{bi}")(x, train=train)
            if f"layer{si + 1}" in capture:
                captured[f"layer{si + 1}"] = pool_activation(
                    x.astype(jnp.float32), pool_mode)
            filters *= 2

        feats = jnp.mean(x, axis=(1, 2))
        logits = nn.Dense(self.num_classes, name="fc", dtype=self.dtype)(feats)
        return logits, captured


def resnet_torch_to_flax(sd: Dict[str, np.ndarray], variant: str):
    """torchvision state dict -> our param/batch_stats trees (strict=False style)."""
    from mammodissect.utils.torch_convert import conv_to_flax, linear_to_flax

    params: Dict = {}
    stats: Dict = {}

    def put(tree, path, val):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(val)

    def conv(src, dst):
        if src + ".weight" in sd:
            put(params, dst + ("kernel",), conv_to_flax(sd[src + ".weight"]))

    def bn(src, dst):
        if src + ".weight" in sd:
            put(params, dst + ("scale",), sd[src + ".weight"])
            put(params, dst + ("bias",), sd[src + ".bias"])
            put(stats, dst + ("mean",), sd[src + ".running_mean"])
            put(stats, dst + ("var",), sd[src + ".running_var"])

    conv("conv1", ("conv1",))
    bn("bn1", ("bn1",))
    _, stages = RESNET_SPECS[variant]
    for si, n_blocks in enumerate(stages):
        for bi in range(n_blocks):
            src = f"layer{si + 1}.{bi}"
            dst = (f"layer{si + 1}_{bi}",)
            for ci in (1, 2, 3):
                conv(f"{src}.conv{ci}", dst + (f"conv{ci}",))
                bn(f"{src}.bn{ci}", dst + (f"bn{ci}",))
            conv(f"{src}.downsample.0", dst + ("downsample_conv",))
            bn(f"{src}.downsample.1", dst + ("downsample_bn",))
    if "fc.weight" in sd:
        put(params, ("fc", "kernel"), linear_to_flax(sd["fc.weight"]))
        put(params, ("fc", "bias"), sd["fc.bias"])
    return params, stats


class ResNetTarget:
    """Dissection-target adapter for named-layer capture (conv1/layer1..4)."""

    def __init__(self, variant: str = "resnet50", num_classes: int = 1000,
                 ckpt_path: str | None = None, seed: int = 0, input_size: int = 224):
        self.model = ResNet(variant=variant, num_classes=num_classes)
        self.variables = jax.jit(self.model.init)(
            jax.random.PRNGKey(seed), jnp.ones((1, input_size, input_size, 3), jnp.float32)
        )
        if ckpt_path:
            import torch

            from mammodissect.utils.torch_convert import merge_into

            sd = torch.load(ckpt_path, map_location="cpu", weights_only=False)
            if isinstance(sd, dict) and "state_dict" in sd:
                sd = sd["state_dict"]  # places365 layout
            sd = {k.replace("module.", ""): v.detach().cpu().numpy()
                  for k, v in sd.items() if hasattr(v, "detach")}
            p, s = resnet_torch_to_flax(sd, variant)
            self.variables, mismatches = merge_into(
                self.variables, {"params": p, "batch_stats": s})
            if mismatches:
                print(f"[resnet] strict=False load: {len(mismatches)} unmatched")
        self._jit: Dict = {}

    def harvest(self, images, layers, pool_mode: str = "avg"):
        capture = tuple(sorted(set(layers)))
        key = (capture, pool_mode)
        if key not in self._jit:
            self._jit[key] = jax.jit(lambda v, x: self.model.apply(
                v, x, capture=capture, pool_mode=pool_mode)[1])
        out = self._jit[key](self.variables, jnp.asarray(images))
        return {k: np.asarray(v) for k, v in out.items()}


def _register():
    from mammodissect.dissect.targets import TARGETS

    from mammodissect.dissect.targets import take_kwargs

    _allowed = ("num_classes", "ckpt_path", "seed", "input_size")
    _alias = {"num_class": "num_classes"}  # the engine's spelling (engine.py)
    for name in RESNET_SPECS:
        if name not in TARGETS:
            TARGETS.register(
                name,
                lambda name=name, **kw: ResNetTarget(
                    variant=name, **take_kwargs(kw, _allowed, name, _alias)),
            )
    # reference MODELS spellings for microsoft/resnet-50 and its fine-tunes
    # (`data_utils.py:25,30,34`): same resnet50 stage layout; ckpt_path for weights
    for alias in ("resnet", "resnet-cub", "resnet-bloodmnist"):
        if alias not in TARGETS:
            TARGETS.register(
                alias,
                lambda alias=alias, **kw: ResNetTarget(
                    variant="resnet50", **take_kwargs(kw, _allowed, alias, _alias)),
            )
    if "resnet18_places" not in TARGETS:
        TARGETS.register(
            "resnet18_places",
            lambda **kw: ResNetTarget(variant="resnet18", num_classes=365,
                                      **{k: v for k, v in kw.items()
                                         if k in ("ckpt_path", "seed", "input_size")}),
        )


_register()
