"""OpenAI CLIP (ViT image tower + causal text transformer) in Flax.

Re-implements the capability of the reference's vendored OpenAI CLIP
(`concept_vit/clip/model.py`: VisionTransformer `:202-237`, text Transformer with causal
mask `:239-384`, projections + logit_scale) for the G-/C-dissect modes
(`describe_og_neurons.py`, `describe_clip_neurons.py`) where the dissector is
`clip.load("ViT-B/16")` and CLIP's 12 ViT layers are themselves dissection targets
(`run_og_clip.sh:8`).

Weight import from the OpenAI state-dict layout via `clip_torch_to_flax` below
(in_proj_weight QKV-fused attention, quick-GELU MLP, pre-LN blocks).

Dissection capture: each residual block's token output [B, T, D] can be captured;
the 3-D CLS pooling rule (`concept_vit/utils.py:40-44`) is applied in-jit."""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    d_model: int
    n_head: int
    causal: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, d = x.shape
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        qkv = nn.Dense(3 * d, name="attn_in", dtype=self.dtype)(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        dh = d // self.n_head
        split = lambda a: a.reshape(b, t, self.n_head, dh)
        q, k, v = split(q), split(k), split(v)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(dh).astype(x.dtype)
        if self.causal:
            mask = jnp.triu(jnp.full((t, t), -jnp.inf, jnp.float32), k=1)
            scores = scores + mask.astype(scores.dtype)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, d)
        x = x + nn.Dense(d, name="attn_out", dtype=self.dtype)(ctx)
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(4 * d, name="mlp_fc", dtype=self.dtype)(h)
        h = quick_gelu(h)
        x = x + nn.Dense(d, name="mlp_proj", dtype=self.dtype)(h)
        return x


class ClipVisionTransformer(nn.Module):
    image_size: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, capture: Sequence[int] = ()):
        """x: [B, H, W, 3] -> (embedding [B, output_dim], {layers.i: [B, T, D]})."""
        b = x.shape[0]
        x = nn.Conv(self.width, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size), use_bias=False,
                    name="conv1", dtype=self.dtype)(x)
        x = x.reshape(b, -1, self.width)  # [B, grid*grid, width]
        cls = self.param("class_embedding",
                         nn.initializers.normal(0.02), (self.width,), jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.width)).astype(x.dtype), x], axis=1)
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (x.shape[1], self.width), jnp.float32)
        x = x + pos.astype(x.dtype)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(x)
        captured: Dict[str, jax.Array] = {}
        for i in range(self.layers):
            x = ResidualAttentionBlock(self.width, self.heads, name=f"resblocks_{i}",
                                       dtype=self.dtype)(x)
            if i in capture:
                captured[f"layers.{i}"] = x.astype(jnp.float32)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_post")(x[:, 0])
        proj = self.param("proj", nn.initializers.normal(0.02),
                          (self.width, self.output_dim), jnp.float32)
        return x @ proj.astype(x.dtype), captured


class ClipTextTransformer(nn.Module):
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    layers: int = 12
    heads: int = 8
    output_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        """tokens: int32 [B, 77] -> [B, output_dim] (eot-pooled, like
        `clip/model.py:354-364`: features at argmax(token id) = eot position)."""
        x = nn.Embed(self.vocab_size, self.width, name="token_embedding",
                     dtype=self.dtype)(tokens)
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (self.context_length, self.width), jnp.float32)
        x = x + pos[: x.shape[1]].astype(x.dtype)
        for i in range(self.layers):
            x = ResidualAttentionBlock(self.width, self.heads, causal=True,
                                       name=f"resblocks_{i}", dtype=self.dtype)(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        eot = jnp.argmax(tokens, axis=-1)
        x = x[jnp.arange(x.shape[0]), eot]
        proj = self.param("text_projection", nn.initializers.normal(0.02),
                          (self.width, self.output_dim), jnp.float32)
        return x @ proj.astype(x.dtype)


class ClipModule(nn.Module):
    """Both towers + logit_scale (OpenAI CLIP `clip/model.py:239-384`)."""

    image_size: int = 224
    patch_size: int = 16
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    text_width: int = 512
    text_layers: int = 12
    text_heads: int = 8
    vocab_size: int = 49408
    context_length: int = 77
    embed_dim: int = 512
    dtype: Any = jnp.float32

    def setup(self):
        self.visual = ClipVisionTransformer(
            image_size=self.image_size, patch_size=self.patch_size,
            width=self.vision_width, layers=self.vision_layers, heads=self.vision_heads,
            output_dim=self.embed_dim, dtype=self.dtype,
        )
        self.text = ClipTextTransformer(
            vocab_size=self.vocab_size, context_length=self.context_length,
            width=self.text_width, layers=self.text_layers, heads=self.text_heads,
            output_dim=self.embed_dim, dtype=self.dtype,
        )
        self.logit_scale = self.param(
            "logit_scale", lambda _: jnp.asarray(np.log(1 / 0.07), jnp.float32)
        )

    def encode_image(self, images, capture: Sequence[int] = ()):
        emb, captured = self.visual(images, capture=capture)
        if capture:
            return emb, captured
        return emb

    def encode_text(self, tokens):
        return self.text(tokens)

    def __call__(self, images, tokens):
        ie = self.encode_image(images)
        te = self.encode_text(tokens)
        ie = ie / jnp.linalg.norm(ie, axis=1, keepdims=True)
        te = te / jnp.linalg.norm(te, axis=1, keepdims=True)
        scale = jnp.exp(self.logit_scale)
        return scale * ie @ te.T, scale * te @ ie.T


VIT_CONFIGS = {
    "ViT-B/32": dict(patch_size=32, vision_width=768, vision_layers=12, vision_heads=12),
    "ViT-B/16": dict(patch_size=16, vision_width=768, vision_layers=12, vision_heads=12),
    "ViT-L/14": dict(patch_size=14, vision_width=1024, vision_layers=24, vision_heads=16,
                     embed_dim=768, text_width=768, text_layers=12, text_heads=12),
}


def clip_config_from_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """Infer ClipModule geometry from an OpenAI CLIP state dict — the capability of
    the reference's `build_model(state_dict)` (`concept_vit/clip/model.py:410-447`)."""
    cfg: Dict = {}
    if "visual.conv1.weight" in sd:
        w = sd["visual.conv1.weight"]  # [width, 3, patch, patch]
        cfg["vision_width"] = int(w.shape[0])
        cfg["patch_size"] = int(w.shape[-1])
        cfg["vision_layers"] = len({k.split(".")[3] for k in sd
                                    if k.startswith("visual.transformer.resblocks.")})
        cfg["vision_heads"] = cfg["vision_width"] // 64
        grid = int(round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5))
        cfg["image_size"] = grid * cfg["patch_size"]
        if "visual.proj" in sd:
            cfg["embed_dim"] = int(sd["visual.proj"].shape[1])
    # vision-only checkpoints (HF CLIPVisionModel / CLIPForImageClassification
    # fine-tunes) carry no text tower: keep the named arch's text defaults
    if "ln_final.weight" in sd:
        cfg["text_width"] = int(sd["ln_final.weight"].shape[0])
        cfg["text_layers"] = len({k.split(".")[2] for k in sd
                                  if k.startswith("transformer.resblocks.")})
        cfg["text_heads"] = cfg["text_width"] // 64
        cfg["vocab_size"] = int(sd["token_embedding.weight"].shape[0])
        cfg["context_length"] = int(sd["positional_embedding"].shape[0])
    return cfg


def hf_clip_to_openai_layout(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Rewrite an HF-transformers CLIP state dict (CLIPModel / CLIPVisionModel /
    CLIPForImageClassification — `vision_model.*`/`text_model.*` keys) into the
    OpenAI `visual.*`/`transformer.*` naming that `clip_torch_to_flax` consumes.

    The reference's clip-cub / clip-bloodmnist MODELS entries are HF-hub
    fine-tunes loaded with AutoModelForImageClassification
    (`concept_vit/data_utils.py:29,33,63-70`); a locally saved copy of one of
    those arrives in this layout. q/k/v projections concatenate into torch
    MultiheadAttention's fused in_proj [q;k;v] order; HF's separate
    visual_projection/text_projection Linear weights transpose into the OpenAI
    matmul-parameter convention. Classifier heads and buffer keys are dropped."""
    # strip an optional wrapper prefix ("clip.", "model.", ...) in front of the
    # tower names
    prefix = ""
    for k in sd:
        i = k.find("vision_model.")
        if i < 0:
            i = k.find("text_model.")
        if i > 0:
            prefix = k[:i]
            break
    out: Dict[str, np.ndarray] = {}

    def tower(src, dst_blocks, emb_map, ln_final_map):
        n = len({k.split(f"{src}.encoder.layers.")[1].split(".")[0]
                 for k in sd if f"{src}.encoder.layers." in k})
        for hf_key, oa_key in emb_map.items():
            k = prefix + f"{src}." + hf_key
            if k in sd:
                out[oa_key] = sd[k]
        for i in range(n):
            s = prefix + f"{src}.encoder.layers.{i}."
            d = dst_blocks.format(i)
            qw, kw, vw = (sd[s + f"self_attn.{t}_proj.weight"] for t in "qkv")
            qb, kb, vb = (sd[s + f"self_attn.{t}_proj.bias"] for t in "qkv")
            out[d + "attn.in_proj_weight"] = np.concatenate([qw, kw, vw], axis=0)
            out[d + "attn.in_proj_bias"] = np.concatenate([qb, kb, vb], axis=0)
            out[d + "attn.out_proj.weight"] = sd[s + "self_attn.out_proj.weight"]
            out[d + "attn.out_proj.bias"] = sd[s + "self_attn.out_proj.bias"]
            out[d + "mlp.c_fc.weight"] = sd[s + "mlp.fc1.weight"]
            out[d + "mlp.c_fc.bias"] = sd[s + "mlp.fc1.bias"]
            out[d + "mlp.c_proj.weight"] = sd[s + "mlp.fc2.weight"]
            out[d + "mlp.c_proj.bias"] = sd[s + "mlp.fc2.bias"]
            for hf_ln, oa_ln in (("layer_norm1", "ln_1"), ("layer_norm2", "ln_2")):
                out[d + oa_ln + ".weight"] = sd[s + hf_ln + ".weight"]
                out[d + oa_ln + ".bias"] = sd[s + hf_ln + ".bias"]
        for hf_key, oa_key in ln_final_map.items():
            k = prefix + f"{src}." + hf_key
            if k in sd:
                out[oa_key] = sd[k]

    if any("vision_model." in k for k in sd):
        tower(
            "vision_model", "visual.transformer.resblocks.{}.",
            {"embeddings.class_embedding": "visual.class_embedding",
             "embeddings.patch_embedding.weight": "visual.conv1.weight",
             "embeddings.position_embedding.weight": "visual.positional_embedding",
             # HF ships the misspelled attribute name
             "pre_layrnorm.weight": "visual.ln_pre.weight",
             "pre_layrnorm.bias": "visual.ln_pre.bias",
             "pre_layernorm.weight": "visual.ln_pre.weight",
             "pre_layernorm.bias": "visual.ln_pre.bias"},
            {"post_layernorm.weight": "visual.ln_post.weight",
             "post_layernorm.bias": "visual.ln_post.bias"},
        )
        vp = prefix + "visual_projection.weight"
        if vp in sd:
            out["visual.proj"] = sd[vp].T
    if any("text_model." in k for k in sd):
        tower(
            "text_model", "transformer.resblocks.{}.",
            {"embeddings.token_embedding.weight": "token_embedding.weight",
             "embeddings.position_embedding.weight": "positional_embedding"},
            {"final_layer_norm.weight": "ln_final.weight",
             "final_layer_norm.bias": "ln_final.bias"},
        )
        tp = prefix + "text_projection.weight"
        if tp in sd:
            out["text_projection"] = sd[tp].T
    ls = prefix + "logit_scale"
    if ls in sd:
        out["logit_scale"] = sd[ls]
    return out


def clip_torch_to_flax(sd: Dict[str, np.ndarray]):
    """Map the OpenAI CLIP state dict onto ClipModule params (strict=False style)."""
    from mammodissect.utils.torch_convert import conv_to_flax, linear_to_flax

    p: Dict = {}

    def put(path, val):
        node = p
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = np.asarray(val)

    def block(src_prefix, dst_prefix, n_layers):
        for i in range(n_layers):
            s = f"{src_prefix}.resblocks.{i}."
            d = dst_prefix + (f"resblocks_{i}",)
            if s + "attn.in_proj_weight" not in sd:
                break
            put(d + ("attn_in", "kernel"), linear_to_flax(sd[s + "attn.in_proj_weight"]))
            put(d + ("attn_in", "bias"), sd[s + "attn.in_proj_bias"])
            put(d + ("attn_out", "kernel"), linear_to_flax(sd[s + "attn.out_proj.weight"]))
            put(d + ("attn_out", "bias"), sd[s + "attn.out_proj.bias"])
            put(d + ("mlp_fc", "kernel"), linear_to_flax(sd[s + "mlp.c_fc.weight"]))
            put(d + ("mlp_fc", "bias"), sd[s + "mlp.c_fc.bias"])
            put(d + ("mlp_proj", "kernel"), linear_to_flax(sd[s + "mlp.c_proj.weight"]))
            put(d + ("mlp_proj", "bias"), sd[s + "mlp.c_proj.bias"])
            for ln in ("ln_1", "ln_2"):
                put(d + (ln, "scale"), sd[s + ln + ".weight"])
                put(d + (ln, "bias"), sd[s + ln + ".bias"])

    if "visual.conv1.weight" in sd:
        put(("visual", "conv1", "kernel"), conv_to_flax(sd["visual.conv1.weight"]))
        put(("visual", "class_embedding"), sd["visual.class_embedding"])
        put(("visual", "positional_embedding"), sd["visual.positional_embedding"])
        if "visual.proj" in sd:  # absent from HF CLIPVisionModel-only checkpoints
            put(("visual", "proj"), sd["visual.proj"])
        for ln in ("ln_pre", "ln_post"):
            put(("visual", ln, "scale"), sd[f"visual.{ln}.weight"])
            put(("visual", ln, "bias"), sd[f"visual.{ln}.bias"])
        block("visual.transformer", ("visual",), 48)
    if "token_embedding.weight" not in sd:  # vision-only checkpoint
        if "logit_scale" in sd:
            put(("logit_scale",), sd["logit_scale"])
        return p
    put(("text", "token_embedding", "embedding"), sd["token_embedding.weight"])
    put(("text", "positional_embedding"), sd["positional_embedding"])
    put(("text", "text_projection"), sd["text_projection"])
    put(("text", "ln_final", "scale"), sd["ln_final.weight"])
    put(("text", "ln_final", "bias"), sd["ln_final.bias"])
    block("transformer", ("text",), 48)
    if "logit_scale" in sd:
        put(("logit_scale",), sd["logit_scale"])
    return p


class OpenAIClip:
    """User-facing wrapper with the `clip.load` surface: encode_image / encode_text /
    tokenize; also the dissector + target interfaces for G-dissect."""

    def __init__(self, name: str = "ViT-B/16", tokenizer=None, seed: int = 0,
                 ckpt_path: Optional[str] = None, dtype=jnp.float32, **overrides):
        cfg = dict(VIT_CONFIGS.get(name, VIT_CONFIGS["ViT-B/16"]))
        sd_np = None
        if ckpt_path:
            # geometry comes from the checkpoint itself (build_model parity);
            # load + numpy-convert ONCE and reuse below (a ViT-L/14 checkpoint is
            # ~900 MB — a second deserialization doubles load time and peak RAM)
            import torch

            sd_probe = torch.load(ckpt_path, map_location="cpu", weights_only=False)
            if hasattr(sd_probe, "state_dict"):
                sd_probe = sd_probe.state_dict()
            sd_np = {k: v.detach().cpu().numpy() for k, v in sd_probe.items()
                     if hasattr(v, "detach")}
            del sd_probe
            if any("vision_model." in k or "text_model." in k for k in sd_np):
                # HF-transformers layout (the clip-cub / clip-bloodmnist hub
                # fine-tunes saved locally) -> OpenAI naming
                sd_np = hf_clip_to_openai_layout(sd_np)
            cfg.update(clip_config_from_state_dict(sd_np))
        cfg.update(overrides)
        self.module = ClipModule(dtype=dtype, **cfg)
        self.tokenizer = tokenizer
        size = self.module.image_size
        self.variables = jax.jit(self.module.init)(
            jax.random.PRNGKey(seed),
            jnp.ones((1, size, size, 3), jnp.float32),
            jnp.ones((1, self.module.context_length), jnp.int32),
        )
        if sd_np is not None:
            from mammodissect.utils.torch_convert import merge_into

            converted = clip_torch_to_flax(sd_np)
            self.variables, mismatches = merge_into(self.variables, {"params": converted})
            if mismatches:
                print(f"[clip] strict=False load: {len(mismatches)} unmatched")
        self._jit: Dict = {}

    def _jitted(self, key, fn, **jit_kw):
        if key not in self._jit:
            self._jit[key] = jax.jit(fn, **jit_kw)
        return self._jit[key]

    def tokenize(self, texts):
        if self.tokenizer is None:
            # canonical CLIP BPE from the vendored merges vocab — token-for-token the
            # reference's `clip.tokenize` (`clip/clip.py:196-232`)
            from mammodissect.models.tokenizers import ClipBPETokenizer

            self.tokenizer = ClipBPETokenizer.default()
        return self.tokenizer(texts)

    def embed_images(self, images) -> np.ndarray:
        fn = self._jitted("img", lambda v, x: self.module.apply(
            v, x, method=ClipModule.encode_image))
        emb = np.asarray(fn(self.variables, jnp.asarray(images)))
        return emb / np.clip(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12, None)

    def embed_texts(self, texts) -> np.ndarray:
        toks = self.tokenize(list(texts))
        fn = self._jitted("txt", lambda v, t: self.module.apply(
            v, t, method=ClipModule.encode_text))
        emb = np.asarray(fn(self.variables, jnp.asarray(toks)))
        return emb / np.clip(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12, None)

    # --------------------------------------------------- dissection-target interface
    def harvest(self, images, layers, pool_mode: str = "avg"):
        from mammodissect.dissect.capture import canonical_layer_name, layer_index
        from mammodissect.ops.pooling import pool_activation

        canon = [canonical_layer_name(l) for l in layers]
        capture = tuple(sorted({layer_index(c) for c in canon}))
        fn = self._jitted(("harvest", capture), lambda v, x: self.module.apply(
            v, x, capture, method=ClipModule.encode_image)[1])
        out = fn(self.variables, jnp.asarray(images))
        # 3-D ViT rule: CLS token (`concept_vit/utils.py:40-44`)
        return {k: np.asarray(pool_activation(v, pool_mode)) for k, v in out.items()}


def _register():
    from mammodissect.dissect.dissectors import DISSECTORS
    from mammodissect.dissect.targets import TARGETS

    # "clip"/"clip-cub"/"clip-bloodmnist" are the reference MODELS spellings for the
    # openai/clip-vit-base-patch16 tower and its fine-tunes (`data_utils.py:24,29,32`)
    # — same ViT-B/16 architecture; pass ckpt_path for fine-tuned weights
    for name in ("ViT-B/32", "ViT-B/16", "ViT-L/14", "clip", "clip-cub",
                 "clip-bloodmnist"):
        arch = "ViT-B/16" if name.startswith("clip") else name
        if name not in DISSECTORS:
            DISSECTORS.register(name, lambda arch=arch, **kw: OpenAIClip(arch, **kw))
        if name not in TARGETS:

            def _make(arch=arch, name=name, **kw):
                # OpenAIClip forwards **overrides into the module config, so only
                # the two engine-injected args the factory cannot consume are
                # dropped — loudly, since a user's --finetuned_ckpt would
                # otherwise silently dissect hub/ckpt_path weights instead
                dropped = sorted(k for k in ("finetuned_ckpt", "num_class")
                                 if kw.get(k) is not None)
                if dropped:
                    import warnings

                    warnings.warn(
                        f"target {name!r} ignores {dropped} — weights come only "
                        "from ckpt_path (the reference's HF-zoo loader likewise "
                        "takes hub weights)")
                kw = {k: v for k, v in kw.items()
                      if k not in ("finetuned_ckpt", "num_class")}
                return OpenAIClip(arch, **kw)

            TARGETS.register(name, _make)


_register()
