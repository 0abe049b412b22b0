"""Swin Transformer image encoder in Flax (NHWC, TPU-first).

Covers the reference's Swin option for the BreastClip image tower and classifiers
(`model/modules/image_encoder.py:14-52` HF 'swin' branch; classifier squeeze/permute
special-casing at `Classifiers/experiments.py:385-397` — unnecessary here because the
tower returns pooled features directly).

Swin-T geometry by default: patch 4, embed 96, depths (2,2,6,2), heads (3,6,12,24),
window 7, shifted windows with attention masks, relative position bias, patch merging.
All window bookkeeping (masks, relative-position index) is computed with numpy at
trace time — static shapes, no dynamic control flow in the compiled program.

Capture points: 'layers.i' = output of stage i (4-D [B,H,W,C] pooling rule applies)."""
from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mammodissect.ops.pooling import pool_activation


def _rel_pos_index(m: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(m), np.arange(m), indexing="ij"))  # [2,M,M]
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # [2, M2, M2]
    rel = rel.transpose(1, 2, 0) + (m - 1)
    return (rel[..., 0] * (2 * m - 1) + rel[..., 1]).astype(np.int32)  # [M2, M2]


def _shift_mask(hp: int, wp: int, m: int, shift: int) -> np.ndarray:
    """Attention mask for shifted windows: [nW, M2, M2] with 0 / -inf."""
    img = np.zeros((hp, wp), np.int32)
    cnt = 0
    slices = (slice(0, -m), slice(-m, -shift), slice(-shift, None))
    for hs in slices:
        for ws in slices:
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(hp // m, m, wp // m, m).transpose(0, 2, 1, 3).reshape(-1, m * m)
    mask = (win[:, :, None] != win[:, None, :]).astype(np.float32) * -1e9
    return mask  # [nW, M2, M2]


class WindowAttention(nn.Module):
    dim: int
    heads: int
    window: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        """x: [B*nW, M2, C]; mask: [nW, M2, M2] or None."""
        bnw, m2, c = x.shape
        qkv = nn.Dense(3 * c, name="qkv", dtype=self.dtype)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        dh = c // self.heads
        split = lambda a: a.reshape(bnw, m2, self.heads, dh)
        q, k, v = split(q), split(k), split(v)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(dh).astype(x.dtype)
        table = self.param("rel_pos_bias", nn.initializers.normal(0.02),
                           ((2 * self.window - 1) ** 2, self.heads), jnp.float32)
        idx = jnp.asarray(_rel_pos_index(self.window))
        bias = table[idx.reshape(-1)].reshape(m2, m2, self.heads).transpose(2, 0, 1)
        scores = scores + bias[None].astype(scores.dtype)
        if mask is not None:
            n_w = mask.shape[0]
            scores = scores.reshape(bnw // n_w, n_w, self.heads, m2, m2)
            scores = scores + mask[None, :, None].astype(scores.dtype)
            scores = scores.reshape(bnw, self.heads, m2, m2)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(bnw, m2, c)
        return nn.Dense(c, name="proj", dtype=self.dtype)(ctx)


class SwinBlock(nn.Module):
    dim: int
    heads: int
    window: int = 7
    shift: int = 0
    mlp_ratio: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        m = self.window
        hp = -(-h // m) * m
        wp = -(-w // m) * m
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-5, name="ln1")(x)
        y = jnp.pad(y, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
        shift = self.shift if min(hp, wp) > m else 0
        if shift:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_mask(hp, wp, m, shift))
        else:
            mask = None
        # window partition
        y = y.reshape(b, hp // m, m, wp // m, m, c).transpose(0, 1, 3, 2, 4, 5)
        y = y.reshape(b * (hp // m) * (wp // m), m * m, c)
        y = WindowAttention(self.dim, self.heads, m, dtype=self.dtype, name="attn")(
            y, mask)
        y = y.reshape(b, hp // m, wp // m, m, m, c).transpose(0, 1, 3, 2, 4, 5)
        y = y.reshape(b, hp, wp, c)
        if shift:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        y = y[:, :h, :w]
        x = shortcut + y
        z = nn.LayerNorm(epsilon=1e-5, name="ln2")(x)
        z = nn.Dense(c * self.mlp_ratio, name="mlp_in", dtype=self.dtype)(z)
        z = jax.nn.gelu(z, approximate=False)
        z = nn.Dense(c, name="mlp_out", dtype=self.dtype)(z)
        return x + z


class PatchMerging(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hp, wp = h - h % 2, w - w % 2
        x = x[:, :hp, :wp]
        # standard Swin 2x2 gather order: (0,0), (1,0), (0,1), (1,1)
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1,
        )
        x = nn.LayerNorm(epsilon=1e-5, name="ln")(x)
        return nn.Dense(2 * c, use_bias=False, name="reduction", dtype=self.dtype)(x)


SWIN_SPECS = {
    "swin-tiny": dict(embed=96, depths=(2, 2, 6, 2), heads=(3, 6, 12, 24)),
    "swin-small": dict(embed=96, depths=(2, 2, 18, 2), heads=(3, 6, 12, 24)),
    "swin-base": dict(embed=128, depths=(2, 2, 18, 2), heads=(4, 8, 16, 32)),
}


def swin_torch_to_flax(sd: Dict[str, np.ndarray], prefix: str = "swin."):
    """HF SwinModel state dict -> our SwinEncoder params (strict=False style).
    HF names: embeddings.patch_embeddings.projection, encoder.layers.i.blocks.j.*,
    encoder.layers.i.downsample.{reduction,norm}."""
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
    if grab("embeddings.norm.weight") is not None:
        put(("patch_norm", "scale"), grab("embeddings.norm.weight"))
        put(("patch_norm", "bias"), grab("embeddings.norm.bias"))

    si = 0
    while grab(f"encoder.layers.{si}.blocks.0.layernorm_before.weight") is not None:
        bi = 0
        while grab(f"encoder.layers.{si}.blocks.{bi}.layernorm_before.weight") is not None:
            src = f"encoder.layers.{si}.blocks.{bi}."
            dst = (f"stage{si}_block{bi}",)

            def ln(s, d):
                put(dst + (d, "scale"), grab(src + s + ".weight"))
                put(dst + (d, "bias"), grab(src + s + ".bias"))

            ln("layernorm_before", "ln1")
            ln("layernorm_after", "ln2")
            q = grab(src + "attention.self.query.weight")
            k = grab(src + "attention.self.key.weight")
            v = grab(src + "attention.self.value.weight")
            if q is not None:
                put(dst + ("attn", "qkv", "kernel"),
                    linear_to_flax(np.concatenate([q, k, v], axis=0)))
                put(dst + ("attn", "qkv", "bias"), np.concatenate([
                    grab(src + "attention.self.query.bias"),
                    grab(src + "attention.self.key.bias"),
                    grab(src + "attention.self.value.bias"),
                ]))
            put(dst + ("attn", "rel_pos_bias"),
                grab(src + "attention.self.relative_position_bias_table"))
            put(dst + ("attn", "proj", "kernel"),
                linear_to_flax(grab(src + "attention.output.dense.weight")))
            put(dst + ("attn", "proj", "bias"), grab(src + "attention.output.dense.bias"))
            put(dst + ("mlp_in", "kernel"), linear_to_flax(grab(src + "intermediate.dense.weight")))
            put(dst + ("mlp_in", "bias"), grab(src + "intermediate.dense.bias"))
            put(dst + ("mlp_out", "kernel"), linear_to_flax(grab(src + "output.dense.weight")))
            put(dst + ("mlp_out", "bias"), grab(src + "output.dense.bias"))
            bi += 1
        red = grab(f"encoder.layers.{si}.downsample.reduction.weight")
        if red is not None:
            put((f"merge{si}", "reduction", "kernel"), linear_to_flax(red))
            put((f"merge{si}", "ln", "scale"),
                grab(f"encoder.layers.{si}.downsample.norm.weight"))
            put((f"merge{si}", "ln", "bias"),
                grab(f"encoder.layers.{si}.downsample.norm.bias"))
        si += 1
    if grab("layernorm.weight") is not None:
        put(("ln_final", "scale"), grab("layernorm.weight"))
        put(("ln_final", "bias"), grab("layernorm.bias"))
    return p


class SwinEncoder(nn.Module):
    variant: str = "swin-tiny"
    patch_size: int = 4
    window: int = 7
    in_channels: int = 1
    dtype: Any = jnp.float32

    @property
    def out_dim(self) -> int:
        return SWIN_SPECS[self.variant]["embed"] * 8

    @nn.compact
    def __call__(self, x, train: bool = False, capture: Sequence[int] = (),
                 pool_mode: str = "avg"):
        spec = SWIN_SPECS[self.variant]
        if x.shape[-1] == 1 and self.in_channels > 1:
            # grayscale -> in_channels broadcast (PIL convert('RGB') parity; the
            # EfficientNet tower does the same) so converted 3-channel
            # patch-embed kernels match the traced shape
            x = jnp.repeat(x, self.in_channels, axis=-1)
        x = nn.Conv(spec["embed"], (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size), name="patch_embed",
                    dtype=self.dtype)(x)
        x = nn.LayerNorm(epsilon=1e-5, name="patch_norm")(x)
        captured: Dict[str, jax.Array] = {}
        for si, (depth, heads) in enumerate(zip(spec["depths"], spec["heads"])):
            dim = x.shape[-1]
            for bi in range(depth):
                x = SwinBlock(dim, heads, window=self.window,
                              shift=self.window // 2 if bi % 2 else 0,
                              dtype=self.dtype, name=f"stage{si}_block{bi}")(x)
            if si in capture:
                captured[f"layers.{si}"] = pool_activation(
                    x.astype(jnp.float32), pool_mode)
            if si < len(spec["depths"]) - 1:
                x = PatchMerging(dtype=self.dtype, name=f"merge{si}")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        pooled = jnp.mean(x, axis=(1, 2))
        return pooled, captured
