"""Target-model adapters: things that can be dissected.

Replaces the reference's `get_target_model(name, device, ...)`
(`concept_vit/data_utils.py:38-93`) — a registry instead of eval()'d torchvision lookups.

A target exposes:
  harvest(images_nhwc, layers, pool_mode) -> {canonical_layer: [B, C] float32}
where `layers` are canonical names (see capture.py) and the whole harvest of all
requested layers is ONE jitted forward (the reference already harvests all 39 layers in
a single pass via hooks, `utils.py:167-186`; XLA makes it a single compiled program)."""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mammodissect.dissect.capture import canonical_layer_name, layer_index
from mammodissect.models.efficientnet import EfficientNet, EfficientNetMammo
from mammodissect.utils.registry import Registry

TARGETS: Registry = Registry("target_model")


def take_kwargs(kw: dict, allowed: Sequence[str], target_name: str,
                aliases: dict | None = None) -> dict:
    """Filter engine-supplied kwargs for a factory that consumes only `allowed`,
    WARNING about dropped non-empty values. The engine always forwards
    `finetuned_ckpt`/`num_class` (`engine.py` -> get_target_model); the reference's
    HF-zoo branch (`data_utils.py:63-70`) loads hub weights and ignores those args
    too — but silently ignoring a user's --finetuned_ckpt would dissect different
    weights than they asked for, so the drop must be loud. `aliases` maps accepted
    alternate spellings onto factory argument names (e.g. num_class->num_classes)."""
    kw = dict(kw)
    for alt, canon in (aliases or {}).items():
        if alt in kw and canon not in kw:
            kw[canon] = kw.pop(alt)
    dropped = sorted(k for k, v in kw.items()
                     if k not in allowed and v not in (None, {}, ()))
    if dropped:
        import warnings

        warnings.warn(
            f"target {target_name!r} ignores {dropped} — like the reference's "
            "HF-zoo loader it takes weights only via ckpt_path/hub; the model "
            "dissected will NOT reflect these arguments")
    return {k: v for k, v in kw.items() if k in allowed}


class EfficientNetTarget:
    """Dissect an EfficientNet(-Mammo) encoder's MBConv blocks ('blocks.i').

    When `mesh` is set (a Mesh with a 'data' axis — see `parallel.mesh.auto_data_mesh`)
    the harvest batch axis is sharded over it: per-device probe shards, replicated
    params, one SPMD program — the dissection-side analogue of the reference's
    DistributedSampler DP (`Datasets/dataset_utils.py:236-251`). The batch size must
    then be a multiple of the data-axis size (the engine rounds it up)."""

    def __init__(self, model, variables, dtype=jnp.float32, mesh=None):
        self.model = model
        self.variables = variables
        self.mesh = mesh
        self._jitted = {}

    def set_mesh(self, mesh):
        """Attach/replace the device mesh (clears compiled-program cache)."""
        if mesh is not self.mesh:
            self.mesh = mesh
            self._jitted = {}

    def _shardings(self):
        """(param_sharding, batch_sharding) or (None, None) without a mesh."""
        if self.mesh is None:
            return None, None
        from jax.sharding import NamedSharding, PartitionSpec as P

        from mammodissect.parallel.mesh import DATA_AXIS

        return NamedSharding(self.mesh, P()), NamedSharding(self.mesh, P(DATA_AXIS))

    def _jit(self, fn):
        rep, dat = self._shardings()
        if rep is None:
            return jax.jit(fn)
        return jax.jit(fn, in_shardings=(rep, dat), out_shardings=dat)

    def _put_batch(self, flat_or_batch):
        _, dat = self._shardings()
        if dat is not None and jax.process_count() > 1:
            # real multi-host: each process contributes its local slice of the global
            # batch (device_put cannot target non-addressable devices) — the
            # DistributedSampler-upload analogue (`Datasets/dataset_utils.py:236-251`)
            return jax.make_array_from_process_local_data(
                dat, np.asarray(flat_or_batch))
        return jax.device_put(flat_or_batch, dat)  # dat=None -> default device

    def _fn(self, capture: tuple, pool_mode: str, sample_shape: tuple):
        key = (capture, pool_mode)
        if key not in self._jitted:

            def raw(variables, x):
                _, captured = self.model.apply(
                    variables, x, train=False, capture=capture, pool_mode=pool_mode
                )
                return captured

            # layer order/widths via abstract eval (no device work)
            shapes = jax.eval_shape(
                raw, self.variables, jax.ShapeDtypeStruct(sample_shape, jnp.float32)
            )
            names = sorted(shapes, key=lambda k: int(k.split(".")[-1]))
            widths = tuple(int(shapes[k].shape[-1]) for k in names)

            def fn(variables, x):
                captured = raw(variables, x)
                # ONE output buffer: each device->host fetch costs ~30ms on the
                # remote TPU runtime, so 39 separate per-layer fetches would
                # quadruple harvest wall-clock; concat once, split on host.
                return jnp.concatenate([captured[k] for k in names], axis=-1)

            self._jitted[key] = (self._jit(fn), names, widths)
        return self._jitted[key]

    def harvest(self, images: np.ndarray, layers: Sequence[str], pool_mode: str = "avg"):
        canon = [canonical_layer_name(l) for l in layers]
        capture = tuple(sorted({layer_index(c) for c in canon}))
        fn, names, widths = self._fn(capture, pool_mode, tuple(images.shape))
        packed = np.asarray(fn(self.variables, self._put_batch(np.asarray(images))))
        return self._split(packed, names, widths)

    @staticmethod
    def _split(packed, names, widths):
        out = {}
        off = 0
        for name, w in zip(names, widths):
            out[name] = packed[:, off : off + w]
            off += w
        return out

    # ------------------------------------------------------------ u8 fast path
    def _fn_u8(self, capture: tuple, pool_mode: str, sample_shape: tuple,
               mean: float, std: float):
        """uint8-input variant: images cross host->device as uint8 (4x less wire
        traffic through this runtime's ~40 MB/s relay) and the min-max + mean/std
        normalization (`Datasets/dataset_concepts.py:212-215` contract) runs on-device
        inside the harvest program."""
        key = ("u8", capture, pool_mode, mean, std, sample_shape)
        if key not in self._jitted:

            def raw(variables, u8_flat):
                # flat-bytes wire format: transferring the 4-D array directly pays a
                # ~4x layout-transform penalty on this runtime; reshape on device.
                u8 = u8_flat.reshape(sample_shape)
                x = u8.astype(jnp.float32) / 255.0
                lo = jnp.min(x, axis=(1, 2, 3), keepdims=True)
                hi = jnp.max(x, axis=(1, 2, 3), keepdims=True)
                x = jnp.where(hi > lo, (x - lo) / (hi - lo), 0.0)
                x = (x - mean) / std
                _, captured = self.model.apply(
                    variables, x, train=False, capture=capture, pool_mode=pool_mode
                )
                return captured

            flat = jax.ShapeDtypeStruct((int(np.prod(sample_shape)),), jnp.uint8)
            shapes = jax.eval_shape(raw, self.variables, flat)
            names = sorted(shapes, key=lambda k: int(k.split(".")[-1]))
            widths = tuple(int(shapes[k].shape[-1]) for k in names)

            def fn(variables, u8_flat):
                captured = raw(variables, u8_flat)
                return jnp.concatenate([captured[k] for k in names], axis=-1)

            self._jitted[key] = (self._jit(fn), names, widths)
        return self._jitted[key]

    def harvest_u8_dispatch(self, images_u8: np.ndarray, layers: Sequence[str],
                            pool_mode: str, mean: float, std: float):
        """Dispatch (async) the u8-input harvest; returns (device_result, names,
        widths). The caller fetches with np.asarray later — enabling a double-buffered
        upload/compute/fetch pipeline in the engine."""
        canon = [canonical_layer_name(l) for l in layers]
        capture = tuple(sorted({layer_index(c) for c in canon}))
        # multi-host: `images_u8` is this process's local slice of a global batch —
        # the compiled program's shape is the GLOBAL batch
        shape = (images_u8.shape[0] * jax.process_count(),) + tuple(images_u8.shape[1:])
        fn, names, widths = self._fn_u8(capture, pool_mode, shape,
                                        float(mean), float(std))
        flat = np.ascontiguousarray(images_u8).reshape(-1)
        return fn(self.variables, self._put_batch(flat)), names, widths


@TARGETS.register("tiny_cnn")
def _tiny_cnn(seed: int = 0, in_channels: int = 1, **_):
    """Small deterministic EfficientNet-B0 target for tests/CI (64x64 inputs)."""
    model = EfficientNet(variant="efficientnet-b0", in_channels=in_channels)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(seed), jnp.ones((1, 64, 64, in_channels), jnp.float32)
    )
    return EfficientNetTarget(model, variables)


@TARGETS.register("breastclip")
def _breastclip_encoder(ckpt_path: str | None = None, variant: str = "efficientnet-b5",
                        image_shape=(1520, 912, 1), seed: int = 0, dtype="bfloat16",
                        in_channels: int = 3, **_):
    """The Mammo-CLIP EfficientNet-B5 image encoder (`utils.py:434-446` hardcoded config,
    the 3-channel '-detect' tower; grayscale probes broadcast on device); loads a
    converted torch checkpoint when given (`--Breast_clip_chkpt`). Compute dtype
    bf16 by default (BN stats and captured activations stay fp32)."""
    model = EfficientNetMammo(variant=variant, in_channels=in_channels,
                              dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32)
    h, w, c = image_shape
    variables = jax.jit(model.init)(jax.random.PRNGKey(seed), jnp.ones((1, h, w, c), jnp.float32))
    if ckpt_path:
        from mammodissect.utils.torch_convert import load_breastclip_image_encoder

        variables = load_breastclip_image_encoder(ckpt_path, variables)
    return EfficientNetTarget(model, variables)


class SwinTarget:
    """Dissect a Swin-towered Mammo-CLIP image encoder's stages ('layers.i') — the
    reference's `load_image_encoder` swin option (`model/modules/__init__.py:14-33`);
    3-D stage outputs pool by the CLS-free token-mean rule (`utils.py:27-52`)."""

    def __init__(self, variant: str = "swin-tiny", in_channels: int = 3,
                 patch_size: int = 4, window: int = 7, input_size: int = 224,
                 seed: int = 0, hf_ckpt: str | None = None, spec: dict | None = None,
                 ckpt_path: str | None = None, **_):
        hf_ckpt = hf_ckpt or ckpt_path
        from mammodissect.models.swin import SWIN_SPECS, SwinEncoder, swin_torch_to_flax

        if spec:  # custom geometry (tests / small drives)
            SWIN_SPECS.setdefault(variant, dict(spec))
        self.model = SwinEncoder(variant=variant, patch_size=patch_size,
                                 window=window, in_channels=in_channels)
        self.variables = jax.jit(self.model.init)(
            jax.random.PRNGKey(seed),
            jnp.ones((1, input_size, input_size, in_channels), jnp.float32),
        )
        if hf_ckpt:
            import torch

            from mammodissect.utils.torch_convert import merge_into

            raw = torch.load(hf_ckpt, map_location="cpu", weights_only=False)
            if hasattr(raw, "state_dict"):
                raw = raw.state_dict()
            sd = {k: v.detach().cpu().numpy() for k, v in raw.items()
                  if hasattr(v, "detach")}
            prefix = "swin." if any(k.startswith("swin.") for k in sd) else ""
            converted = swin_torch_to_flax(sd, prefix=prefix)
            params, mm = merge_into(self.variables["params"], converted)
            self.variables = {**self.variables, "params": params}
            mm = [m for m in mm if m[0] == "shape"]
            if mm:
                print(f"[swin] strict=False load: {len(mm)} shape-mismatched")
        self._jit = {}

    def harvest(self, images: np.ndarray, layers, pool_mode: str = "avg"):
        capture = tuple(sorted({int(str(l).split(".")[-1]) for l in layers}))
        key = (capture, pool_mode)
        if key not in self._jit:
            self._jit[key] = jax.jit(lambda v, x: self.model.apply(
                v, x, capture=capture, pool_mode=pool_mode)[1])
        out = self._jit[key](self.variables, jnp.asarray(images))
        return {k: np.asarray(v) for k, v in out.items()}


TARGETS.register("breastclip_swin", SwinTarget)


@TARGETS.register("breastclip_classifier")
def _breastclip_classifier(ckpt_path: str | None = None, finetuned_ckpt: str | None = None,
                           num_class: int = 1, arch: str = "upmc_breast_clip_det_b5_period_n_ft",
                           image_shape=(1520, 912, 1), seed: int = 0, **_):
    """Fine-tuned classifier target for C-Mammo-CLIP Dissect
    (`Classifiers/models/breast_clip_classifier.py:6-81`; hooks still target the encoder's
    `_blocks`, `run_clipdissect.sh:12-36`). Loads the Mammo-CLIP encoder from `ckpt_path`
    then overrides with the fine-tuned `.pth` / orbax checkpoint when given."""
    from mammodissect.models.classifier import (
        BreastClipClassifierModule,
        arch_is_linear_probe,
        arch_variant,
    )

    module = BreastClipClassifierModule(
        variant=arch_variant(arch), n_class=num_class,
        freeze_encoder=arch_is_linear_probe(arch),
    )
    h, w, c = image_shape
    variables = jax.jit(module.init)(
        jax.random.PRNGKey(seed), jnp.ones((1, h, w, c), jnp.float32)
    )
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}
    if ckpt_path:
        from mammodissect.utils.torch_convert import (
            efficientnet_torch_to_flax,
            merge_into,
            torch_load_state_dict,
        )

        sd, _cfg = torch_load_state_dict(ckpt_path)
        enc_params, enc_stats, _ = efficientnet_torch_to_flax(sd, prefix="image_encoder.")
        variables, _mm = merge_into(variables, {
            "params": {"image_encoder": {"backbone": enc_params}},
            "batch_stats": {"image_encoder": {"backbone": enc_stats}},
        })
    if finetuned_ckpt:
        if os_path_is_orbax(finetuned_ckpt):
            from mammodissect.train.checkpoints import load_for_eval

            variables = load_for_eval(finetuned_ckpt)["variables"]
        else:
            from mammodissect.utils.torch_convert import (
                efficientnet_torch_to_flax,
                merge_into,
                torch_load_state_dict,
            )

            sd, _cfg = torch_load_state_dict(finetuned_ckpt)
            enc_params, enc_stats, _ = efficientnet_torch_to_flax(
                sd, prefix="image_encoder.")
            updates = {
                "params": {"image_encoder": {"backbone": enc_params}},
                "batch_stats": {"image_encoder": {"backbone": enc_stats}},
            }
            # linear head: torch 'classifier.fc.{weight,bias}'
            if "classifier.fc.weight" in sd:
                from mammodissect.utils.torch_convert import linear_to_flax

                updates["params"]["classifier"] = {"fc": {
                    "kernel": linear_to_flax(sd["classifier.fc.weight"]),
                    "bias": sd["classifier.fc.bias"],
                }}
            variables, _mm = merge_into(variables, updates)
    return EfficientNetTarget(module, variables)


def os_path_is_orbax(path: str) -> bool:
    import os

    return os.path.isdir(path)


def get_target_model(name: str, **kw):
    if name not in TARGETS:
        # model-backed targets register on import
        if name.startswith("resnet"):
            import mammodissect.models.resnet  # noqa: F401
        elif name.lower().startswith(("vit-b", "vit-l", "rn", "clip")):
            import mammodissect.models.clip_vit  # noqa: F401
        elif name.lower().startswith(("vit", "dino", "mae")):
            import mammodissect.models.vit_encoder  # noqa: F401
    return TARGETS.get(name)(**kw)
