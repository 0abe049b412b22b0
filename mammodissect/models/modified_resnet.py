"""CLIP's ModifiedResNet image tower (RN50/RN101/RN50x4... variants) in Flax.

Completes the OpenAI-CLIP model zoo surface (`concept_vit/clip/model.py:56-151`):
3-conv stem with avg-pool (no max-pool), anti-aliased rect-2 blur... the CLIP variant's
distinctive moves are: stem = conv3x3/2 -> conv3x3 -> conv3x3 + avgpool2, all
downsampling via avgpool-then-conv1x1 in the Bottleneck shortcut, and a final
QKV `AttentionPool2d` producing the embedding."""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mammodissect.ops.pooling import pool_activation


class ClipBottleneck(nn.Module):
    filters: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                       epsilon=1e-5, name=name, dtype=self.dtype)
        out_f = self.filters * 4
        identity = x
        out = jax.nn.relu(bn("bn1")(nn.Conv(self.filters, (1, 1), use_bias=False,
                                            name="conv1", dtype=self.dtype)(x)))
        out = jax.nn.relu(bn("bn2")(nn.Conv(self.filters, (3, 3),
                                            padding=((1, 1), (1, 1)), use_bias=False,
                                            name="conv2", dtype=self.dtype)(out)))
        if self.stride > 1:  # avgpool-then-conv downsampling (CLIP's anti-alias move)
            out = nn.avg_pool(out, (self.stride, self.stride),
                              strides=(self.stride, self.stride))
        out = bn("bn3")(nn.Conv(out_f, (1, 1), use_bias=False, name="conv3",
                                dtype=self.dtype)(out))
        if self.stride > 1 or x.shape[-1] != out_f:
            if self.stride > 1:
                identity = nn.avg_pool(identity, (self.stride, self.stride),
                                       strides=(self.stride, self.stride))
            identity = bn("downsample_bn")(
                nn.Conv(out_f, (1, 1), use_bias=False, name="downsample_conv",
                        dtype=self.dtype)(identity))
        return jax.nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    """QKV attention pooling with a learned positional embedding; the mean token
    attends over all spatial tokens (`clip/model.py:56-81` semantics)."""

    embed_dim: int
    num_heads: int
    output_dim: int
    spacial_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        mean_tok = tokens.mean(axis=1, keepdims=True)
        tokens = jnp.concatenate([mean_tok, tokens], axis=1)  # [B, 1+HW, C]
        pos = self.param("positional_embedding", nn.initializers.normal(0.02),
                         (self.spacial_dim * self.spacial_dim + 1, c), jnp.float32)
        if tokens.shape[1] != pos.shape[0]:
            # the torch reference errors on a grid mismatch; silently slicing the
            # row-major 7x7 table onto a smaller grid would misalign every row
            # after the first
            raise ValueError(
                f"AttentionPool2d: input grid {h}x{w} (+CLS = {tokens.shape[1]} "
                f"tokens) does not match spacial_dim {self.spacial_dim} "
                f"({pos.shape[0]} positions); resize inputs to the tower's "
                "native resolution")
        tokens = tokens + pos[None].astype(tokens.dtype)
        q = nn.Dense(self.embed_dim, name="q_proj", dtype=self.dtype)(tokens[:, :1])
        k = nn.Dense(self.embed_dim, name="k_proj", dtype=self.dtype)(tokens)
        v = nn.Dense(self.embed_dim, name="v_proj", dtype=self.dtype)(tokens)
        dh = self.embed_dim // self.num_heads
        q = q.reshape(b, 1, self.num_heads, dh)
        k = k.reshape(b, -1, self.num_heads, dh)
        v = v.reshape(b, -1, self.num_heads, dh)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(dh).astype(x.dtype)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, self.embed_dim)
        return nn.Dense(self.output_dim, name="c_proj", dtype=self.dtype)(ctx)


MODIFIED_RESNET_SPECS: Dict[str, Tuple[Tuple[int, ...], int, int]] = {
    # name: (stage block counts, width, embed output dim)
    "RN50": ((3, 4, 6, 3), 64, 1024),
    "RN101": ((3, 4, 23, 3), 64, 512),
    "RN50x4": ((4, 6, 10, 6), 80, 640),
}


class ModifiedResNet(nn.Module):
    variant: str = "RN50"
    input_size: int = 224
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, capture: Sequence[str] = (),
                 pool_mode: str = "avg"):
        stages, width, out_dim = MODIFIED_RESNET_SPECS[self.variant]
        bn = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                       epsilon=1e-5, name=name, dtype=self.dtype)
        captured: Dict[str, jax.Array] = {}
        if x.shape[-1] == 1:
            # grayscale -> RGB broadcast (CLIP preprocess converts to RGB)
            x = jnp.repeat(x, 3, axis=-1)
        # 3-conv stem (`clip/model.py:90-104`)
        x = jax.nn.relu(bn("bn1")(nn.Conv(width // 2, (3, 3), strides=(2, 2),
                                          padding=((1, 1), (1, 1)), use_bias=False,
                                          name="conv1", dtype=self.dtype)(x)))
        x = jax.nn.relu(bn("bn2")(nn.Conv(width // 2, (3, 3), padding=((1, 1), (1, 1)),
                                          use_bias=False, name="conv2",
                                          dtype=self.dtype)(x)))
        x = jax.nn.relu(bn("bn3")(nn.Conv(width, (3, 3), padding=((1, 1), (1, 1)),
                                          use_bias=False, name="conv3",
                                          dtype=self.dtype)(x)))
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        if "conv1" in capture:
            captured["conv1"] = pool_activation(x.astype(jnp.float32), pool_mode)

        filters = width
        for si, n_blocks in enumerate(stages):
            for bi in range(n_blocks):
                stride = 2 if (si > 0 and bi == 0) else 1
                x = ClipBottleneck(filters, stride=stride, dtype=self.dtype,
                                   name=f"layer{si + 1}_{bi}")(x, train=train)
            if f"layer{si + 1}" in capture:
                captured[f"layer{si + 1}"] = pool_activation(
                    x.astype(jnp.float32), pool_mode)
            filters *= 2

        heads = width * 32 // 64
        emb = AttentionPool2d(
            embed_dim=width * 32, num_heads=heads, output_dim=out_dim,
            spacial_dim=self.input_size // 32, dtype=self.dtype, name="attnpool",
        )(x)
        return emb, captured


def modified_resnet_torch_to_flax(sd: Dict[str, np.ndarray], prefix: str = "visual."):
    """OpenAI CLIP visual-RN state dict -> our ModifiedResNet params/batch_stats
    (conv1-3/bn1-3 stem, layerN.M bottlenecks with avgpool downsample at
    `.downsample.1`, attnpool q/k/v/c_proj + positional_embedding)."""
    from mammodissect.utils.torch_convert import conv_to_flax, linear_to_flax

    params: Dict = {}
    stats: Dict = {}

    def put(tree, path, val):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(val)

    def grab(k):
        return sd.get(prefix + k)

    def conv(src, dst):
        w = grab(src + ".weight")
        if w is not None:
            put(params, dst + ("kernel",), conv_to_flax(w))

    def bn(src, dst):
        w = grab(src + ".weight")
        if w is not None:
            put(params, dst + ("scale",), w)
            put(params, dst + ("bias",), grab(src + ".bias"))
            put(stats, dst + ("mean",), grab(src + ".running_mean"))
            put(stats, dst + ("var",), grab(src + ".running_var"))

    for i in (1, 2, 3):
        conv(f"conv{i}", (f"conv{i}",))
        bn(f"bn{i}", (f"bn{i}",))
    si = 0
    while grab(f"layer{si + 1}.0.conv1.weight") is not None:
        bi = 0
        while grab(f"layer{si + 1}.{bi}.conv1.weight") is not None:
            src = f"layer{si + 1}.{bi}"
            dst = (f"layer{si + 1}_{bi}",)
            for ci in (1, 2, 3):
                conv(f"{src}.conv{ci}", dst + (f"conv{ci}",))
                bn(f"{src}.bn{ci}", dst + (f"bn{ci}",))
            # CLIP downsample = (avgpool, conv1x1, bn) -> indices 0/1 are conv/bn
            conv(f"{src}.downsample.0", dst + ("downsample_conv",))
            bn(f"{src}.downsample.1", dst + ("downsample_bn",))
            bi += 1
        si += 1
    if grab("attnpool.positional_embedding") is not None:
        put(params, ("attnpool", "positional_embedding"),
            grab("attnpool.positional_embedding"))
        for side in ("q_proj", "k_proj", "v_proj", "c_proj"):
            put(params, ("attnpool", side, "kernel"),
                linear_to_flax(grab(f"attnpool.{side}.weight")))
            put(params, ("attnpool", side, "bias"), grab(f"attnpool.{side}.bias"))
    return params, stats


class ModifiedResNetTarget:
    def __init__(self, variant: str = "RN50", input_size: int = 224, seed: int = 0,
                 ckpt_path: str | None = None, **_):
        self.model = ModifiedResNet(variant=variant, input_size=input_size)
        self.variables = jax.jit(self.model.init)(
            jax.random.PRNGKey(seed),
            jnp.ones((1, input_size, input_size, 3), jnp.float32),
        )
        if ckpt_path:
            import torch

            from mammodissect.utils.torch_convert import merge_into

            raw = torch.load(ckpt_path, map_location="cpu", weights_only=False)
            if hasattr(raw, "state_dict"):
                raw = raw.state_dict()
            sd = {k: v.detach().cpu().numpy() for k, v in raw.items()
                  if hasattr(v, "detach")}
            p, s = modified_resnet_torch_to_flax(sd)
            self.variables, mm = merge_into(
                self.variables, {"params": p, "batch_stats": s})
            if mm:
                print(f"[clip-rn] strict=False load: {len(mm)} unmatched")
        self._jit: Dict = {}

    def harvest(self, images, layers, pool_mode: str = "avg"):
        capture = tuple(sorted(set(layers)))
        key = (capture, pool_mode)
        if key not in self._jit:
            self._jit[key] = jax.jit(lambda v, x: self.model.apply(
                v, x, capture=capture, pool_mode=pool_mode)[1])
        out = self._jit[key](self.variables, jnp.asarray(images))
        return {k: np.asarray(v) for k, v in out.items()}

    def embed_images(self, images):
        if "emb" not in self._jit:
            self._jit["emb"] = jax.jit(lambda v, x: self.model.apply(v, x)[0])
        e = np.asarray(self._jit["emb"](self.variables, jnp.asarray(images)))
        return e / np.clip(np.linalg.norm(e, axis=1, keepdims=True), 1e-12, None)


def _register():
    from mammodissect.dissect.targets import TARGETS

    for name in MODIFIED_RESNET_SPECS:
        key = f"clip_{name.lower()}"
        if key not in TARGETS:
            TARGETS.register(key, lambda name=name, **kw: ModifiedResNetTarget(
                variant=name, **{k: v for k, v in kw.items()
                                 if k in ("input_size", "seed", "ckpt_path")}))


_register()
