"""HF-style ViT image encoder in Flax.

Covers two reference surfaces:
- BreastClip's ViT/Swin image-encoder option (`HuggingfaceImageEncoder`,
  `model/modules/image_encoder.py:14-52`: returns last_hidden_state, CLS pooled by
  BreastClip, `model/clip.py:49-52`; `interpolate_pos_encoding=True` for non-square
  mammography inputs).
- The HF dissection-target family ('vit', 'dino', 'mae', '-cub'/'-bloodmnist'
  fine-tunes, `concept_vit/data_utils.py:21-36` MODELS), hooked at
  `vision_model.encoder.layers[i]` — canonical 'layers.i' here, CLS pooling rule.

Geometry = ViT-B/16 defaults (patch 16, width 768, 12 layers, pre-LN, learned pos
embeddings with bilinear interpolation for arbitrary input sizes). Weight import maps
HF names (vit.embeddings.*, vit.encoder.layer.i.*) via `vit_torch_to_flax`."""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class ViTLayer(nn.Module):
    """Pre-LN transformer block (HF ViTLayer: ln -> MHA -> res; ln -> MLP(gelu) -> res)."""

    width: int
    heads: int
    mlp_ratio: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, d = x.shape
        h = nn.LayerNorm(epsilon=1e-12, name="ln_before")(x)
        qkv = [nn.Dense(d, dtype=self.dtype, name=n)(h) for n in ("query", "key", "value")]
        dh = d // self.heads
        q, k, v = (a.reshape(b, t, self.heads, dh) for a in qkv)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(dh).astype(x.dtype)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, d)
        x = x + nn.Dense(d, dtype=self.dtype, name="attn_out")(ctx)
        h = nn.LayerNorm(epsilon=1e-12, name="ln_after")(x)
        h = nn.Dense(d * self.mlp_ratio, dtype=self.dtype, name="mlp_in")(h)
        h = jax.nn.gelu(h, approximate=False)
        x = x + nn.Dense(d, dtype=self.dtype, name="mlp_out")(h)
        return x


class ViTImageEncoder(nn.Module):
    image_size: int = 224  # pos-embedding native grid; inputs may differ (interpolated)
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    in_channels: int = 3
    dtype: Any = jnp.float32

    @property
    def out_dim(self) -> int:
        return self.width

    @nn.compact
    def __call__(self, x, train: bool = False, capture: Sequence[int] = (),
                 pool_mode: str = "avg"):
        """x NHWC -> (last_hidden_state [B, 1+T, D], {layers.i: CLS [B, D]})."""
        if x.shape[-1] == 1 and self.in_channels > 1:
            # grayscale probes broadcast to the tower's channel count on device
            # (the reference's PIL convert('RGB'); same rule as the EfficientNet
            # tower) — otherwise a 1-channel trace builds a 1-channel patch
            # kernel and converted 3-channel weights silently fail to load
            x = jnp.repeat(x, self.in_channels, axis=-1)
        b, h, w, c = x.shape
        x = nn.Conv(self.width, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size), name="patch_embed",
                    dtype=self.dtype)(x)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(b, gh * gw, self.width)
        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, self.width), jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.width)).astype(x.dtype), x],
                            axis=1)
        native = self.image_size // self.patch_size
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, 1 + native * native, self.width), jnp.float32)
        x = x + _interp_pos(pos, native, gh, gw).astype(x.dtype)
        captured: Dict[str, jax.Array] = {}
        for i in range(self.layers):
            x = ViTLayer(self.width, self.heads, dtype=self.dtype, name=f"layers_{i}")(x)
            if i in capture:
                captured[f"layers.{i}"] = x[:, 0].astype(jnp.float32)  # 3-D CLS rule
        x = nn.LayerNorm(epsilon=1e-12, name="ln_final")(x)
        return x, captured


def _interp_pos(pos, native: int, gh: int, gw: int):
    """Bilinear pos-embedding interpolation (HF `interpolate_pos_encoding=True`,
    `model/modules/image_encoder.py:30-40` passes it for non-224 mammograms)."""
    if gh == native and gw == native:
        return pos
    cls_pos, grid_pos = pos[:, :1], pos[:, 1:]
    grid = grid_pos.reshape(1, native, native, -1)
    grid = jax.image.resize(grid, (1, gh, gw, grid.shape[-1]), method="bilinear")
    return jnp.concatenate([cls_pos, grid.reshape(1, gh * gw, -1)], axis=1)


def vit_torch_to_flax(sd: Dict[str, np.ndarray], prefix: str = "vit."):
    """HF ViTModel state dict -> our params (strict=False style)."""
    from mammodissect.utils.torch_convert import conv_to_flax, linear_to_flax

    p: Dict = {}

    def put(path, val):
        node = p
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = np.asarray(val)

    def grab(k):
        return sd.get(prefix + k)

    w = grab("embeddings.patch_embeddings.projection.weight")
    if w is not None:
        put(("patch_embed", "kernel"), conv_to_flax(w))
        put(("patch_embed", "bias"), grab("embeddings.patch_embeddings.projection.bias"))
    if grab("embeddings.cls_token") is not None:
        put(("cls_token",), grab("embeddings.cls_token"))
        put(("pos_embed",), grab("embeddings.position_embeddings"))
    i = 0
    while grab(f"encoder.layer.{i}.attention.attention.query.weight") is not None:
        L = (f"layers_{i}",)
        def dense(src, dst):
            put(L + (dst, "kernel"), linear_to_flax(grab(src + ".weight")))
            put(L + (dst, "bias"), grab(src + ".bias"))
        dense(f"encoder.layer.{i}.attention.attention.query", "query")
        dense(f"encoder.layer.{i}.attention.attention.key", "key")
        dense(f"encoder.layer.{i}.attention.attention.value", "value")
        dense(f"encoder.layer.{i}.attention.output.dense", "attn_out")
        dense(f"encoder.layer.{i}.intermediate.dense", "mlp_in")
        dense(f"encoder.layer.{i}.output.dense", "mlp_out")
        for src, dst in (("layernorm_before", "ln_before"), ("layernorm_after", "ln_after")):
            put(L + (dst, "scale"), grab(f"encoder.layer.{i}.{src}.weight"))
            put(L + (dst, "bias"), grab(f"encoder.layer.{i}.{src}.bias"))
        i += 1
    if grab("layernorm.weight") is not None:
        put(("ln_final", "scale"), grab("layernorm.weight"))
        put(("ln_final", "bias"), grab("layernorm.bias"))
    return p


class ViTTarget:
    """Dissection target for HF-style ViT models ('vit', 'dino', 'mae', ...)."""

    def __init__(self, ckpt_path: Optional[str] = None, input_size: int = 224,
                 seed: int = 0, **overrides):
        self.model = ViTImageEncoder(**overrides)
        self.variables = jax.jit(self.model.init)(
            jax.random.PRNGKey(seed),
            jnp.ones((1, input_size, input_size, self.model.in_channels), jnp.float32),
        )
        if ckpt_path:
            import torch

            from mammodissect.utils.torch_convert import merge_into

            raw = torch.load(ckpt_path, map_location="cpu", weights_only=False)
            sd = {k: v.detach().cpu().numpy() for k, v in
                  (raw.items() if isinstance(raw, dict) else raw.state_dict().items())
                  if hasattr(v, "detach")}
            prefix = "vit." if any(k.startswith("vit.") for k in sd) else ""
            converted = vit_torch_to_flax(sd, prefix=prefix)
            self.variables, mismatches = merge_into(self.variables, {"params": converted})
            if mismatches:
                print(f"[vit] strict=False load: {len(mismatches)} unmatched")
        self._jit: Dict = {}

    def harvest(self, images, layers, pool_mode: str = "avg"):
        from mammodissect.dissect.capture import canonical_layer_name, layer_index

        capture = tuple(sorted({layer_index(canonical_layer_name(l)) for l in layers}))
        if capture not in self._jit:
            self._jit[capture] = jax.jit(lambda v, x: self.model.apply(
                v, x, capture=capture)[1])
        out = self._jit[capture](self.variables, jnp.asarray(images))
        return {k: np.asarray(v) for k, v in out.items()}


def _register():
    from mammodissect.dissect.targets import TARGETS

    from mammodissect.dissect.targets import take_kwargs

    for name in ("vit", "dino", "mae", "vit-cub", "vit-bloodmnist", "dino-cub",
                 "dino-bloodmnist", "mae-cub", "mae-bloodmnist"):
        if name not in TARGETS:
            TARGETS.register(name, lambda name=name, **kw: ViTTarget(
                **take_kwargs(kw, ("ckpt_path", "input_size", "seed", "image_size",
                                   "patch_size", "width", "layers", "heads",
                                   "in_channels"), name)))


_register()
