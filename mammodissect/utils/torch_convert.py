"""Torch→Flax checkpoint conversion (pure-numpy layout mapping; torch-cpu used only to
deserialize the pickle/zip artifact).

Real artifacts this must read (SURVEY.md §5 checkpoint/resume):
- Mammo-CLIP pretraining ckpt `.tar`: {"model": state_dict, "config": {...}}
  (`concept_vit/utils.py:451-454`, `Classifiers/models/breast_clip_classifier.py:9-28`)
- fine-tuned classifier `.pth`: {"model": state_dict, "predictions", "epoch", ...}
  (`Classifiers/experiments.py:243-251`)

Layout rules:
  torch Conv2d  OIHW  -> flax HWIO   (transpose 2,3,1,0; depthwise [C,1,k,k] likewise)
  torch Linear  [o,i] -> flax [i,o]
  torch BatchNorm weight/bias/running_mean/running_var
      -> flax params scale/bias + batch_stats mean/var
  embeddings unchanged.

All loads are `strict=False`-style (reference `utils.py:454`): keys that match by name
and shape are converted; the rest are reported, not fatal."""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _np(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def torch_load_state_dict(path: str) -> Tuple[Dict[str, np.ndarray], Dict]:
    """Load a torch checkpoint file; returns (flat state_dict of numpy arrays, config)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt:
        sd, config = ckpt["model"], ckpt.get("config", {})
    else:
        sd, config = ckpt, {}
    flat = {k: _np(v) for k, v in sd.items() if hasattr(v, "shape") or hasattr(v, "detach")}
    # DDP checkpoints carry a 'module.' prefix (`experiments.py:140` DDP wrap)
    if flat and all(k.startswith("module.") for k in flat):
        flat = {k[len("module."):]: v for k, v in flat.items()}
    return flat, config


def conv_to_flax(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def linear_to_flax(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


# ------------------------------------------------------------------- EfficientNet
def efficientnet_torch_to_flax(sd: Dict[str, np.ndarray], prefix: str = ""):
    """Map a lukemelas-layout EfficientNet state dict (the reference's vendored
    `efficientnet_custom.py` module names: _conv_stem/_bn0/_blocks.i._{expand_conv,
    _depthwise_conv,_se_reduce,_se_expand,_project_conv}/_conv_head/_bn1) onto our
    module names (stem_conv/stem_bn/blocks_i.{...}/head_conv/head_bn).

    Returns (params, batch_stats, unused_keys)."""
    params: Dict = {}
    stats: Dict = {}
    used = set()

    def grab(key):
        k = prefix + key
        if k in sd:
            used.add(k)
            return sd[k]
        return None

    def put(tree, path, val):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = val

    def conv(src, dst_path):
        w = grab(src + ".weight")
        if w is not None:
            put(params, dst_path + ("kernel",), conv_to_flax(w))
        b = grab(src + ".bias")
        if b is not None:
            put(params, dst_path + ("bias",), b)

    def bn(src, dst):
        w, b = grab(src + ".weight"), grab(src + ".bias")
        m, v = grab(src + ".running_mean"), grab(src + ".running_var")
        if w is not None:
            put(params, dst + ("scale",), w)
            put(params, dst + ("bias",), b)
            put(stats, dst + ("mean",), m)
            put(stats, dst + ("var",), v)

    conv("_conv_stem", ("stem_conv",))
    bn("_bn0", ("stem_bn",))
    i = 0
    while prefix + f"_blocks.{i}._depthwise_conv.weight" in sd:
        blk = ("blocks_%d" % i,)
        conv(f"_blocks.{i}._expand_conv", blk + ("expand_conv",))
        bn(f"_blocks.{i}._bn0", blk + ("bn0",))
        conv(f"_blocks.{i}._depthwise_conv", blk + ("depthwise_conv",))
        bn(f"_blocks.{i}._bn1", blk + ("bn1",))
        conv(f"_blocks.{i}._se_reduce", blk + ("se", "se_reduce"))
        conv(f"_blocks.{i}._se_expand", blk + ("se", "se_expand"))
        conv(f"_blocks.{i}._project_conv", blk + ("project_conv",))
        bn(f"_blocks.{i}._bn2", blk + ("bn2",))
        i += 1
    conv("_conv_head", ("head_conv",))
    bn("_bn1", ("head_bn",))
    unused = [k for k in sd if k.startswith(prefix) and k not in used]
    return params, stats, unused


# --------------------------------------------------------------------------- BERT
def bert_torch_to_flax(sd: Dict[str, np.ndarray], prefix: str = ""):
    """Map HF BertModel names (embeddings.*, encoder.layer.i.*) onto our BertEncoder."""
    params: Dict = {}
    used = set()

    def grab(key):
        k = prefix + key
        if k in sd:
            used.add(k)
            return sd[k]
        return None

    def put(path, val):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = val

    def dense(src, dst):
        w = grab(src + ".weight")
        if w is not None:
            put(dst + ("kernel",), linear_to_flax(w))
            b = grab(src + ".bias")
            if b is not None:
                put(dst + ("bias",), b)

    def ln(src, dst):
        w = grab(src + ".weight")
        if w is not None:
            put(dst + ("scale",), w)
            put(dst + ("bias",), grab(src + ".bias"))

    for name in ("word_embeddings", "position_embeddings", "token_type_embeddings"):
        w = grab(f"embeddings.{name}.weight")
        if w is not None:
            put((name, "embedding"), w)
    ln("embeddings.LayerNorm", ("embeddings_norm",))

    i = 0
    while prefix + f"encoder.layer.{i}.attention.self.query.weight" in sd:
        L = ("layers_%d" % i,)
        dense(f"encoder.layer.{i}.attention.self.query", L + ("attention", "query"))
        dense(f"encoder.layer.{i}.attention.self.key", L + ("attention", "key"))
        dense(f"encoder.layer.{i}.attention.self.value", L + ("attention", "value"))
        dense(f"encoder.layer.{i}.attention.output.dense", L + ("attention_output",))
        ln(f"encoder.layer.{i}.attention.output.LayerNorm", L + ("attention_norm",))
        dense(f"encoder.layer.{i}.intermediate.dense", L + ("intermediate",))
        dense(f"encoder.layer.{i}.output.dense", L + ("output",))
        ln(f"encoder.layer.{i}.output.LayerNorm", L + ("output_norm",))
        i += 1
    unused = [k for k in sd if k.startswith(prefix) and k not in used]
    return params, unused


# ----------------------------------------------------------------- tree utilities
def merge_into(variables: Dict, updates: Dict, path=()) -> tuple:
    """Recursively copy `updates` leaves into a copy of `variables` when name+shape
    match; returns (new_variables, list of mismatches). strict=False semantics."""
    mismatches = []

    def rec(dst, src, p):
        out = dict(dst)
        for k, v in src.items():
            if k not in dst:
                mismatches.append(("missing", "/".join(p + (k,))))
                continue
            if isinstance(v, dict):
                if not isinstance(dst[k], dict):
                    mismatches.append(("structure", "/".join(p + (k,)) + " dict vs leaf"))
                    continue
                out[k] = rec(dst[k], v, p + (k,))
            else:
                tgt = np.asarray(dst[k])
                if tuple(tgt.shape) != tuple(np.asarray(v).shape):
                    mismatches.append(
                        ("shape", "/".join(p + (k,)) + f" {np.asarray(v).shape} vs {tgt.shape}")
                    )
                else:
                    out[k] = np.asarray(v, dtype=tgt.dtype)
        return out

    return rec(variables, updates, path), mismatches


# ------------------------------------------------------------ high-level loaders
def load_breastclip_checkpoint(path: str, variables: Dict, log=print) -> Dict:
    """Load a Mammo-CLIP `.tar` checkpoint into BreastClipModule variables
    (image tower + text tower + projections + logit_scale)."""
    sd, _config = torch_load_state_dict(path)

    enc_params, enc_stats, _ = efficientnet_torch_to_flax(sd, prefix="image_encoder.")
    bert_params, _ = bert_torch_to_flax(sd, prefix="text_encoder.bert.")
    if not bert_params:
        bert_params, _ = bert_torch_to_flax(sd, prefix="text_encoder.model.")

    updates = {
        "params": {
            "image_encoder": {"backbone": enc_params},
            "text_encoder": bert_params,
        },
        "batch_stats": {"image_encoder": {"backbone": enc_stats}},
    }
    for side in ("image_projection", "text_projection"):
        w = sd.get(f"{side}.projection.weight")
        if w is not None:
            proj = {"projection": {"kernel": linear_to_flax(w)}}
            b = sd.get(f"{side}.projection.bias")
            if b is not None:
                proj["projection"]["bias"] = b
            updates["params"][side] = proj
    if "logit_scale" in sd:
        updates["params"]["logit_scale"] = sd["logit_scale"]

    new_vars, mismatches = merge_into(variables, updates)
    if mismatches:
        log(f"[torch_convert] {len(mismatches)} unmatched entries (strict=False): "
            f"{mismatches[:5]}...")
    return new_vars


def load_breastclip_image_encoder(path: str, variables: Dict, log=print) -> Dict:
    """Load only the image tower (for EfficientNetMammo targets)."""
    sd, _config = torch_load_state_dict(path)
    enc_params, enc_stats, unused = efficientnet_torch_to_flax(sd, prefix="image_encoder.")
    updates = {
        "params": {"backbone": enc_params},
        "batch_stats": {"backbone": enc_stats},
    }
    new_vars, mismatches = merge_into(variables, updates)
    if mismatches:
        log(f"[torch_convert] {len(mismatches)} unmatched entries (strict=False)")
    return new_vars
