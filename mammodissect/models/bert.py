"""BERT text encoder in Flax (Bio_ClinicalBERT-compatible).

Re-implements the capability of the reference's `HuggingfaceTextEncoder` wrapping
`AutoModel.from_pretrained("emilyalsentzer/Bio_ClinicalBERT")`
(`model/modules/text_encoder.py:5-49`; selected by `load_text_encoder`,
`model/modules/__init__.py:59-75`): returns the last hidden state [B, T, D] for the
BreastClip text tower, whose eos/bos/mean pooling happens in BreastClip itself
(`model/clip.py:60-79`).

Standard BERT-base geometry (Bio_ClinicalBERT = bert-base-cased fine-tune): 12 layers,
hidden 768, 12 heads, intermediate 3072, vocab 28996, max_pos 512, post-LN.
Weights import from a torch state dict via `mammodissect/utils/torch_convert.py`.

TPU notes: attention uses one fused `jnp.einsum` per projection batch over heads; the
additive mask keeps shapes static; dtype policy via `dtype` (bf16 compute-safe, LN in
fp32)."""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class BertSelfAttention(nn.Module):
    hidden_size: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias, deterministic: bool = True):
        d_head = self.hidden_size // self.num_heads
        dense = lambda name: nn.Dense(self.hidden_size, dtype=self.dtype, name=name)
        q = dense("query")(x)
        k = dense("key")(x)
        v = dense("value")(x)
        b, t, _ = x.shape
        split = lambda a: a.reshape(b, t, self.num_heads, d_head)
        q, k, v = split(q), split(k), split(v)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(d_head).astype(x.dtype)
        scores = scores + attn_bias  # [B, 1, 1, T] additive mask
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, self.hidden_size)
        return ctx


class BertLayer(nn.Module):
    hidden_size: int
    num_heads: int
    intermediate_size: int
    layer_norm_eps: float = 1e-12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias, deterministic: bool = True):
        attn_out = BertSelfAttention(
            self.hidden_size, self.num_heads, dtype=self.dtype, name="attention"
        )(x, attn_bias, deterministic)
        attn_out = nn.Dense(self.hidden_size, dtype=self.dtype, name="attention_output")(attn_out)
        x = nn.LayerNorm(epsilon=self.layer_norm_eps, name="attention_norm")(x + attn_out)
        h = nn.Dense(self.intermediate_size, dtype=self.dtype, name="intermediate")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.hidden_size, dtype=self.dtype, name="output")(h)
        x = nn.LayerNorm(epsilon=self.layer_norm_eps, name="output_norm")(x + h)
        return x


class BertEncoder(nn.Module):
    """Embeddings + N transformer layers; returns last_hidden_state [B, T, D]."""

    vocab_size: int = 28996
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    dtype: Any = jnp.float32
    grad_checkpoint: bool = False  # reference's gradient_checkpointing switch
    # (`model/modules/text_encoder.py` enable flag); on TPU this is jax.checkpoint
    # rematerialization trading FLOPs for HBM.

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 deterministic: bool = True, capture: tuple = ()):
        b, t = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, t), jnp.int32)
        if token_type_ids is None:
            token_type_ids = jnp.zeros((b, t), jnp.int32)

        word = nn.Embed(self.vocab_size, self.hidden_size, dtype=self.dtype,
                        name="word_embeddings")(input_ids)
        pos_ids = jnp.arange(t)[None, :]
        pos = nn.Embed(self.max_position_embeddings, self.hidden_size, dtype=self.dtype,
                       name="position_embeddings")(pos_ids)
        typ = nn.Embed(self.type_vocab_size, self.hidden_size, dtype=self.dtype,
                       name="token_type_embeddings")(token_type_ids)
        x = nn.LayerNorm(epsilon=self.layer_norm_eps, name="embeddings_norm")(word + pos + typ)

        attn_bias = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * -1e9
        attn_bias = attn_bias.astype(x.dtype)

        captured = {}
        layer_cls = BertLayer
        if self.grad_checkpoint:
            layer_cls = nn.remat(BertLayer, static_argnums=(3,))
        for i in range(self.num_layers):
            x = layer_cls(
                self.hidden_size, self.num_heads, self.intermediate_size,
                self.layer_norm_eps, dtype=self.dtype, name=f"layers_{i}",
            )(x, attn_bias, deterministic)
            if i in capture:
                captured[f"layers.{i}"] = x[:, 0].astype(jnp.float32)  # CLS pooling rule
        if capture:
            return x, captured
        return x
