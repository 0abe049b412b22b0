"""BreastClip (Mammo-CLIP) dual encoder in Flax.

Re-implements the reference's `BreastClip` (`model/clip.py:12-137`) with the canonical
config the dissection engine hardcodes (`concept_vit/utils.py:434-446`):
EfficientNet-B5 'tf_efficientnet_b5_ns-detect' image tower (3-channel RGB copies of the
grayscale mammograms, avg-pooled, 2048-d — the vendored EfficientNet's
AdaptiveAvgPool2d path, `efficientnet_custom.py:287-313`)
+ Bio_ClinicalBERT text tower (768-d, eos pooling) + linear projection heads to
512 + temperature 0.07 → logit_scale param = log(1/T).

Contract parity:
- encode_image: pooled CNN features (ViT towers would take CLS, `model/clip.py:44-52`)
- encode_text: eos/bos/mean pooling over last hidden states (`model/clip.py:60-79`)
- forward(batch): normalized embeddings + labels + exp(logit_scale), optional second
  text view + image view (`model/clip.py:103-137`)
- tokenize: WordPiece, max_length 256 (`model/clip.py:81-101`)
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mammodissect.models.bert import BertEncoder
from mammodissect.models.efficientnet import EfficientNetMammo
from mammodissect.models.layers import LinearProjectionHead, MLPProjectionHead
from mammodissect.dissect.dissectors import DISSECTORS


def default_model_config() -> Dict:
    """The hardcoded Mammo-CLIP dissector config (`concept_vit/utils.py:434-443`)."""
    return {
        "name": "clip_custom",
        "temperature": 0.07,
        "image_encoder": {
            "source": "cnn",
            "name": "tf_efficientnet_b5_ns-detect",
            "model_type": "cnn",
            "variant": "efficientnet-b5",
            # '-detect' towers keep from_pretrained's default 3 input channels
            # (`model/modules/__init__.py:41-46`); grayscale probes are broadcast.
            "in_channels": 3,
        },
        "text_encoder": {
            "source": "huggingface",
            "name": "emilyalsentzer/Bio_ClinicalBERT",
            "pooling": "eos",
            "gradient_checkpointing": False,
        },
        "projection_head": {"name": "linear", "dropout": 0.1, "proj_dim": 512},
    }


class BreastClipModule(nn.Module):
    """Flax module holding both towers + projections + logit_scale."""

    image_variant: str = "efficientnet-b5"
    image_tower: str = "cnn"  # cnn | swin | vit (`model_config["image_encoder"]["model_type"]`)
    in_channels: int = 3
    image_pooling: str = "avg"  # '-detect' avg-pool; "gem" for timm-style encoders
    s2d_stem: bool = False  # space-to-depth stem fast path (models/efficientnet.py)
    text_pooling: str = "eos"
    proj_dim: int = 512
    proj_head: str = "linear"
    proj_dropout: float = 0.1
    temperature: float = 0.07
    vocab_size: int = 28996
    bert_layers: int = 12
    bert_hidden: int = 768
    bert_heads: int = 12
    bert_intermediate: int = 3072
    grad_checkpoint: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        if self.image_tower == "swin":
            from mammodissect.models.swin import SwinEncoder

            self.image_encoder = SwinEncoder(
                variant=self.image_variant if self.image_variant.startswith("swin")
                else "swin-tiny",
                in_channels=self.in_channels, dtype=self.dtype,
            )
        elif self.image_tower == "vit":
            from mammodissect.models.vit_encoder import ViTImageEncoder

            self.image_encoder = ViTImageEncoder(
                in_channels=self.in_channels, dtype=self.dtype
            )
        else:
            self.image_encoder = EfficientNetMammo(
                variant=self.image_variant, in_channels=self.in_channels,
                pooling=self.image_pooling, s2d_stem=self.s2d_stem, dtype=self.dtype,
            )
        self.text_encoder = BertEncoder(
            vocab_size=self.vocab_size,
            hidden_size=self.bert_hidden,
            num_layers=self.bert_layers,
            num_heads=self.bert_heads,
            intermediate_size=self.bert_intermediate,
            grad_checkpoint=self.grad_checkpoint,
            dtype=self.dtype,
        )
        head = MLPProjectionHead if self.proj_head == "mlp" else LinearProjectionHead
        self.image_projection = head(self.proj_dim, dtype=self.dtype)
        self.text_projection = head(self.proj_dim, dtype=self.dtype)
        self.logit_scale = self.param(
            "logit_scale", lambda _: jnp.asarray(np.log(1.0 / self.temperature), jnp.float32)
        )

    # ------------------------------------------------------------------ encoders
    def encode_image(self, images, train: bool = False, capture: Sequence[int] = (),
                     pool_mode: str = "avg"):
        feats, captured = self.image_encoder(images, train=train, capture=capture,
                                             pool_mode=pool_mode)
        # ViT towers return token sequences; CLS pooling per `model/clip.py:49-52`
        pooled = feats[:, 0] if feats.ndim == 3 else feats
        if capture:
            return pooled, captured
        return pooled

    def encode_text(self, input_ids, attention_mask, train: bool = False):
        hidden = self.text_encoder(input_ids, attention_mask, deterministic=not train)
        if self.text_pooling == "eos":
            eos_idx = jnp.sum(attention_mask, axis=-1) - 1
            return hidden[jnp.arange(hidden.shape[0]), eos_idx]
        if self.text_pooling == "bos":
            return hidden[:, 0]
        if self.text_pooling == "mean":
            mask = attention_mask[..., None].astype(hidden.dtype)
            return jnp.sum(hidden * mask, axis=1) / jnp.clip(jnp.sum(mask, axis=1), 1e-9)
        raise NotImplementedError(f"pooling {self.text_pooling!r}")

    def project_image(self, feats, train: bool = False):
        emb = self.image_projection(feats, deterministic=not train)
        return emb / jnp.linalg.norm(emb, axis=1, keepdims=True)

    def project_text(self, feats, train: bool = False):
        emb = self.text_projection(feats, deterministic=not train)
        return emb / jnp.linalg.norm(emb, axis=1, keepdims=True)

    # ------------------------------------------------------------------- forward
    def __call__(self, batch: Dict, train: bool = False):
        """`BreastClip.forward` contract (`model/clip.py:103-137`)."""
        image_emb = self.project_image(self.encode_image(batch["images"], train=train), train)
        text_emb = self.project_text(
            self.encode_text(batch["input_ids"], batch["attention_mask"], train=train), train
        )
        out = {
            "image_embeddings": image_emb,
            "text_embeddings": text_emb,
            "labels": jnp.arange(image_emb.shape[0]),
            "logit_scale": jnp.exp(self.logit_scale),
        }
        if "input_ids2" in batch and "image_views" in batch:
            out["text_embeddings2"] = self.project_text(
                self.encode_text(batch["input_ids2"], batch["attention_mask2"], train=train),
                train,
            )
            out["image_view_embeddings"] = self.project_image(
                self.encode_image(batch["image_views"], train=train), train
            )
        return out


@dataclass
class BreastClip:
    """User-facing wrapper: module + params + tokenizer (mirrors the torch class surface:
    encode_image / encode_text / tokenize / forward / image_projection / text_projection)."""

    module: BreastClipModule
    variables: Dict
    tokenizer: Any = None
    max_length: int = 256
    mesh: Any = None  # optional Mesh('data', ...): shards harvest/embed batch axis (DP)

    _jit_cache: Dict = field(default_factory=dict, repr=False)

    def set_mesh(self, mesh):
        """Attach/replace the device mesh for DP image harvest/embed (clears jit cache)."""
        if mesh is not self.mesh:
            self.mesh = mesh
            self._jit_cache = {}

    def _batch_shardings(self):
        """(replicated_params, batch_sharding) or (None, None) without a mesh."""
        if self.mesh is None:
            return None, None
        from jax.sharding import NamedSharding, PartitionSpec as P

        from mammodissect.parallel.mesh import DATA_AXIS

        return NamedSharding(self.mesh, P()), NamedSharding(self.mesh, P(DATA_AXIS))

    @classmethod
    def create(cls, model_config: Optional[Dict] = None, tokenizer=None, seed: int = 0,
               image_shape=(1520, 912, 1), ckpt_path: Optional[str] = None,
               dtype=jnp.float32, bert_layers: int = 12, vocab_size: int = 28996):
        cfg = model_config or default_model_config()
        ie, te, ph = cfg["image_encoder"], cfg["text_encoder"], cfg.get("projection_head", {})
        name = ie.get("name", "tf_efficientnet_b5_ns-detect")
        module = BreastClipModule(
            image_variant=ie.get("variant", "efficientnet-b5"),
            image_tower=ie.get("model_type", "cnn"),
            in_channels=ie.get("in_channels", 3),
            image_pooling=ie.get("pooling", "avg" if name.endswith("-detect") else "gem"),
            s2d_stem=bool(ie.get("s2d_stem", False)),
            text_pooling=te.get("pooling", "eos"),
            proj_dim=ph.get("proj_dim", 512),
            proj_head=ph.get("name", "linear"),
            proj_dropout=ph.get("dropout", 0.1),
            temperature=cfg.get("temperature", 0.07),
            grad_checkpoint=te.get("gradient_checkpointing", False),
            dtype=dtype,
            bert_layers=bert_layers,
            vocab_size=vocab_size,
        )
        h, w, c = image_shape
        init_batch = {
            "images": jnp.ones((1, h, w, c), jnp.float32),
            "input_ids": jnp.ones((1, 8), jnp.int32),
            "attention_mask": jnp.ones((1, 8), jnp.int32),
        }
        variables = jax.jit(module.init)(jax.random.PRNGKey(seed), init_batch)
        if ckpt_path:
            from mammodissect.utils.torch_convert import load_breastclip_checkpoint

            variables = load_breastclip_checkpoint(ckpt_path, variables)
        return cls(module=module, variables=variables, tokenizer=tokenizer)

    def _jitted(self, name, fn):
        if name not in self._jit_cache:
            self._jit_cache[name] = jax.jit(fn)
        return self._jit_cache[name]

    def tokenize(self, texts, max_length: Optional[int] = None):
        if self.tokenizer is None:
            raise ValueError("BreastClip was created without a tokenizer")
        return self.tokenizer(texts, max_length=max_length or self.max_length)

    def encode_image(self, images) -> np.ndarray:
        fn = self._jitted(
            "enc_img",
            lambda v, x: self.module.apply(v, x, method=BreastClipModule.encode_image),
        )
        return np.asarray(fn(self.variables, jnp.asarray(images)))

    def encode_text(self, input_ids, attention_mask) -> np.ndarray:
        fn = self._jitted(
            "enc_txt",
            lambda v, i, m: self.module.apply(v, i, m, method=BreastClipModule.encode_text),
        )
        return np.asarray(fn(self.variables, jnp.asarray(input_ids), jnp.asarray(attention_mask)))

    def embed_images(self, images) -> np.ndarray:
        """Dissector interface: projected + L2-normalized image embeddings
        (`utils.py:19-26` encode_image + image_projection + norm)."""
        fn = self._jitted(
            "embed_img",
            lambda v, x: self.module.apply(
                v, self.module.apply(v, x, method=BreastClipModule.encode_image),
                method=BreastClipModule.project_image,
            ),
        )
        return np.asarray(fn(self.variables, jnp.asarray(images)))

    def embed_images_u8(self, images_u8, mean: float, std: float) -> np.ndarray:
        """uint8-wire fast path: flat bytes over the relay, minmax+meanstd on device
        (same rationale as EfficientNetTarget.harvest_u8_dispatch)."""
        shape = tuple(images_u8.shape)
        key = ("embed_img_u8", shape, float(mean), float(std))
        if key not in self._jit_cache:

            def fn(v, u8_flat):
                u8 = u8_flat.reshape(shape)
                x = u8.astype(jnp.float32) / 255.0
                lo = jnp.min(x, axis=(1, 2, 3), keepdims=True)
                hi = jnp.max(x, axis=(1, 2, 3), keepdims=True)
                x = jnp.where(hi > lo, (x - lo) / (hi - lo), 0.0)
                x = (x - mean) / std
                feats = self.module.apply(v, x, method=BreastClipModule.encode_image)
                return self.module.apply(v, feats, method=BreastClipModule.project_image)

            rep, dat = self._batch_shardings()
            self._jit_cache[key] = (
                jax.jit(fn) if rep is None
                else jax.jit(fn, in_shardings=(rep, dat), out_shardings=dat)
            )
        _, dat = self._batch_shardings()
        flat = np.ascontiguousarray(images_u8).reshape(-1)
        return np.asarray(self._jit_cache[key](self.variables, jax.device_put(flat, dat)))

    def harvest_and_embed_u8_dispatch(self, images_u8, layers, pool_mode: str,
                                      mean: float, std: float):
        """Fused M-dissect fast path: when the dissection target IS this model's image
        tower (the M-Mammo-CLIP case — `describe_broad_neurons.py` dissecting
        `image_encoder._blocks` of the same BreastClip), ONE forward yields both the
        pooled per-block activations and the projected probe embedding: half the
        compute and half the host->device traffic of running the two stages separately.
        Returns (device_packed_activations, device_embeddings, names, widths)."""
        from mammodissect.dissect.capture import canonical_layer_name, layer_index

        canon = [canonical_layer_name(l) for l in layers]
        capture = tuple(sorted({layer_index(c) for c in canon}))
        shape = tuple(images_u8.shape)
        key = ("harvest_embed_u8", capture, pool_mode, shape, float(mean), float(std))
        if key not in self._jit_cache:

            def raw(v, u8_flat):
                u8 = u8_flat.reshape(shape)
                x = u8.astype(jnp.float32) / 255.0
                lo = jnp.min(x, axis=(1, 2, 3), keepdims=True)
                hi = jnp.max(x, axis=(1, 2, 3), keepdims=True)
                x = jnp.where(hi > lo, (x - lo) / (hi - lo), 0.0)
                x = (x - mean) / std
                pooled, captured = self.module.apply(
                    v, x, train=False, capture=capture, pool_mode=pool_mode,
                    method=BreastClipModule.encode_image,
                )
                emb = self.module.apply(v, pooled, method=BreastClipModule.project_image)
                return captured, emb

            flat_spec = jax.ShapeDtypeStruct((int(np.prod(shape)),), jnp.uint8)
            shapes, _ = jax.eval_shape(raw, self.variables, flat_spec)
            names = sorted(shapes, key=lambda k: int(k.split(".")[-1]))
            widths = tuple(int(shapes[k].shape[-1]) for k in names)

            def fn(v, u8_flat):
                captured, emb = raw(v, u8_flat)
                return jnp.concatenate([captured[k] for k in names], axis=-1), emb

            rep, dat = self._batch_shardings()
            jfn = (
                jax.jit(fn) if rep is None
                else jax.jit(fn, in_shardings=(rep, dat), out_shardings=(dat, dat))
            )
            self._jit_cache[key] = (jfn, names, widths)
        fn, names, widths = self._jit_cache[key]
        _, dat = self._batch_shardings()
        flat = np.ascontiguousarray(images_u8).reshape(-1)
        packed, emb = fn(self.variables, jax.device_put(flat, dat))
        return packed, emb, names, widths

    def _build_resident_step(self, key, shape, capture, pool_mode: str,
                             mean: float, std: float, decode, wire_specs,
                             wire_shardings):
        """Shared resident-step builder for the unpacked and packed wires.

        `decode(*wire) -> [B, H, W, C] uint8 canvas` is the only thing the two
        wire formats differ in; everything downstream — min-max + mean/std
        normalization, the captured forward, the projection, and the
        dynamic_update_slice accumulate — is built once here so the
        packed==unpacked bit-identity contract cannot drift one-sided.

        Returns (step, names, widths) where
          step(variables, acc_acts, acc_emb, *wire, offset) -> (acc_acts, acc_emb)."""
        if key in self._jit_cache:
            return self._jit_cache[key]

        def raw(v, *wire):
            from mammodissect.ops.normalize import u8_minmax_meanstd

            u8 = decode(*wire)
            # trace-time sanity: the wire decode must reconstruct exactly the
            # batch canvas this step was built for (a mismatched decode closure
            # would otherwise surface as a shape error deep in the conv tower)
            assert tuple(u8.shape) == tuple(shape), (u8.shape, shape)
            x = u8_minmax_meanstd(u8, mean, std)
            pooled, captured = self.module.apply(
                v, x, train=False, capture=capture, pool_mode=pool_mode,
                method=BreastClipModule.encode_image,
            )
            emb = self.module.apply(v, pooled, method=BreastClipModule.project_image)
            return captured, emb

        shapes, _ = jax.eval_shape(raw, self.variables, *wire_specs)
        names = sorted(shapes, key=lambda k: int(k.split(".")[-1]))
        widths = tuple(int(shapes[k].shape[-1]) for k in names)

        def step(v, acc_acts, acc_emb, *wire_and_offset):
            *wire, offset = wire_and_offset
            captured, emb = raw(v, *wire)
            packed = jnp.concatenate(
                [captured[k].astype(jnp.float32) for k in names], axis=-1
            )
            acc_acts = jax.lax.dynamic_update_slice(acc_acts, packed, (offset, 0))
            acc_emb = jax.lax.dynamic_update_slice(
                acc_emb, emb.astype(jnp.float32), (offset, 0)
            )
            return acc_acts, acc_emb

        rep, _dat = self._batch_shardings()
        if rep is None:
            jstep = jax.jit(step, donate_argnums=(1, 2))
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from mammodissect.parallel.mesh import DATA_AXIS

            rows = NamedSharding(self.mesh, P(DATA_AXIS, None))
            jstep = jax.jit(
                step,
                in_shardings=(rep, rows, rows, *wire_shardings, rep),
                out_shardings=(rows, rows),
                donate_argnums=(1, 2),
            )
        self._jit_cache[key] = (jstep, names, widths)
        return self._jit_cache[key]

    def fused_resident_step(self, sample_shape, layers, pool_mode: str,
                            mean: float, std: float):
        """Device-RESIDENT fused M-dissect step.

        Returns (step, names, widths) where
          step(variables, acc_acts, acc_emb, u8_flat, offset) -> (acc_acts, acc_emb)
        forwards one uint8 batch and writes its pooled per-block activations and
        projected embeddings into the donated accumulators at row `offset`
        (a traced int32 — no recompile per batch). Rationale: this runtime's
        device->host fetch path is ~8x slower than upload, so the round-1 per-batch
        activation fetches dominated harvest wall-clock; resident mode keeps the
        [N, U_total] matrix on device end-to-end and scoring (`engine.score_resident`)
        fetches only CSV-sized results.

        With a mesh attached (`set_mesh`), the step is one SPMD program over
        Mesh('data'): the uint8 batch and both accumulators are row-sharded
        P('data'[, None]) and params are replicated, so the resident path composes
        with multi-chip DP (the reference's DistributedSampler shape,
        `Classifiers/experiments.py:554-564`, applied to resident dissection). Row
        order stays sequential, so scoring and resume are layout-identical to the
        single-device path. The per-batch dynamic_update_slice into the row-sharded
        accumulator costs one small all-gather of the [B, U_total] update (~2 MB at
        the canonical geometry) — negligible next to the B5 forward."""
        from mammodissect.dissect.capture import canonical_layer_name, layer_index

        canon = [canonical_layer_name(l) for l in layers]
        capture = tuple(sorted({layer_index(c) for c in canon}))
        shape = tuple(sample_shape)
        key = ("resident_step", capture, pool_mode, shape, float(mean), float(std))
        _, dat = self._batch_shardings()
        return self._build_resident_step(
            key, shape, capture, pool_mode, mean, std,
            decode=lambda u8_flat: u8_flat.reshape(shape),
            wire_specs=(jax.ShapeDtypeStruct((int(np.prod(shape)),), jnp.uint8),),
            wire_shardings=(dat,),
        )

    def fused_resident_step_packed(self, sample_shape, flat_len: int, layers,
                                   pool_mode: str, mean: float, std: float):
        """Packed-wire variant of `fused_resident_step` (see dissect/packing.py).

        The harvest is >=98% wire on the measured e2e path and mammography probes
        are ~40-60% exactly-black background, so the uint8 batch crosses the relay
        as (per-shard flat row-span payloads [D, flat_len] u8, span metadata
        [B, H, 2] i32) and is reconstructed to the bit-identical [B, H, W, C]
        canvas by one in-jit gather before the same normalize + forward +
        accumulate as the unpacked step. `flat_len` is a static PER-SHARD bucket
        size (one compile per bucket); D is the mesh's data-axis size (1 without
        a mesh).

        Under a mesh the payload shards P('data', None) — each chip receives only
        its own shard group's packed bytes (pack_batch_groups' row blocks match
        the P('data') batch layout) and the unpack runs inside shard_map, fully
        local, no collectives. A replicated payload would make every chip pay the
        whole batch's wire, erasing packing's per-chip win on real multi-chip.

        Returns (step, names, widths) where
          step(variables, acc_acts, acc_emb, flat_u8, meta, offset)."""
        from jax.sharding import PartitionSpec as P

        from mammodissect.dissect.capture import canonical_layer_name, layer_index
        from mammodissect.dissect.packing import unpack_canvas
        from mammodissect.parallel.mesh import DATA_AXIS, data_parallel_size

        canon = [canonical_layer_name(l) for l in layers]
        capture = tuple(sorted({layer_index(c) for c in canon}))
        shape = tuple(sample_shape)
        d = data_parallel_size(self.mesh)
        if shape[0] % d:
            raise ValueError(
                f"packed wire needs batch {shape[0]} divisible by the mesh's "
                f"data axis ({d})")
        key = ("resident_step_packed", capture, pool_mode, shape, int(flat_len),
               d, float(mean), float(std))
        local_shape = (shape[0] // d,) + tuple(shape[1:])

        def decode(flat_u8, meta):
            if self.mesh is None or d == 1:
                return unpack_canvas(flat_u8[0], meta, shape)
            out = jax.shard_map(
                lambda f, m: unpack_canvas(f[0], m, local_shape),
                mesh=self.mesh,
                in_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None, None)),
                out_specs=P(DATA_AXIS, None, None, None),
            )(flat_u8, meta)
            return out

        flat_sh, meta_sh = self.resident_packed_put_shardings()
        return self._build_resident_step(
            key, shape, capture, pool_mode, mean, std,
            decode=decode,
            wire_specs=(jax.ShapeDtypeStruct((d, int(flat_len)), jnp.uint8),
                        jax.ShapeDtypeStruct((shape[0], shape[1], 2), jnp.int32)),
            wire_shardings=(flat_sh, meta_sh),
        )

    def resident_data_shards(self) -> int:
        """Data-axis size D of the attached mesh (1 without one): the packed wire
        packs per shard group and ships [D, L]."""
        from mammodissect.parallel.mesh import data_parallel_size

        return data_parallel_size(self.mesh)

    def resident_packed_put_shardings(self):
        """(flat_sharding, meta_sharding) for packed-wire device_puts under this
        model's mesh, or (None, None) single-device. The flat payload shards by
        data — each device uploads/holds only its own shard group's bytes."""
        rep, _dat = self._batch_shardings()
        if rep is None:
            return None, None
        from jax.sharding import NamedSharding, PartitionSpec as P

        from mammodissect.parallel.mesh import DATA_AXIS

        return (NamedSharding(self.mesh, P(DATA_AXIS, None)),
                NamedSharding(self.mesh, P(DATA_AXIS, None, None)))

    def resident_accumulator_shardings(self):
        """(row_sharding, u8_sharding) for resident accumulators under this model's
        mesh, or (None, None) single-device."""
        rep, dat = self._batch_shardings()
        if rep is None:
            return None, None
        from jax.sharding import NamedSharding, PartitionSpec as P

        from mammodissect.parallel.mesh import DATA_AXIS

        return NamedSharding(self.mesh, P(DATA_AXIS, None)), dat

    def embed_tokens(self, input_ids, attention_mask) -> np.ndarray:
        """Projected + L2-normalized text embeddings from pre-tokenized ids
        (the text half of `utils.py:390-414` without the tokenizer)."""
        fn = self._jitted(
            "embed_txt",
            lambda v, i, m: self.module.apply(
                v, self.module.apply(v, i, m, method=BreastClipModule.encode_text),
                method=BreastClipModule.project_text,
            ),
        )
        return np.asarray(
            fn(self.variables, jnp.asarray(input_ids), jnp.asarray(attention_mask))
        )

    def embed_texts(self, texts) -> np.ndarray:
        """Dissector interface: tokenized + eos-pooled + projected + normalized
        (`utils.py:390-414` save_clip_vindr_text_features)."""
        toks = self.tokenize(list(texts))
        fn = self._jitted(
            "embed_txt",
            lambda v, i, m: self.module.apply(
                v, self.module.apply(v, i, m, method=BreastClipModule.encode_text),
                method=BreastClipModule.project_text,
            ),
        )
        return np.asarray(
            fn(self.variables, jnp.asarray(toks["input_ids"]), jnp.asarray(toks["attention_mask"]))
        )

    def forward(self, batch: Dict) -> Dict:
        fn = self._jitted("forward", lambda v, b: self.module.apply(v, b))
        return fn(self.variables, {k: jnp.asarray(v) for k, v in batch.items()})


@DISSECTORS.register("breastclip")
def _breastclip_dissector(ckpt_path=None, vocab_file=None, image_shape=(1520, 912, 1),
                          max_length: int = 256, **kw):
    from mammodissect.models.tokenizers import WordPieceTokenizer

    if vocab_file:
        tok = WordPieceTokenizer(vocab_file=vocab_file)
        vocab_size = len(tok.vocab)
    else:
        # zero-egress: the real Bio_ClinicalBERT WordPiece vocab can't be fetched, so
        # the fallback is a chars-only toy vocab — loudly, so a canonical M-dissect
        # can't run with unfaithful text embeddings silently (the reference tokenizes
        # with the HF Bio_ClinicalBERT tokenizer, `model/clip.py:81-101`)
        import warnings

        warnings.warn(
            "breastclip dissector built WITHOUT vocab_file: falling back to a "
            "chars-only toy WordPiece vocab — concept tokenization will NOT match "
            "Bio_ClinicalBERT. Pass vocab_file=<path to vocab.txt> for "
            "reference-faithful text embeddings.",
            stacklevel=2,
        )
        tok = WordPieceTokenizer.toy()
        vocab_size = len(tok.vocab)
    return BreastClip.create(
        tokenizer=tok, image_shape=image_shape, ckpt_path=ckpt_path,
        vocab_size=vocab_size, **kw,
    )
