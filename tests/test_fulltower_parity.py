"""Full-tower parity against the reference's OWN torch EfficientNet.

The round-1 converter tests were single-layer; this file closes the gap the north-star
claim rests on (BASELINE.md: >=99% per-neuron top-concept agreement): it imports the
reference's vendored `model/modules/efficientnet_custom.py` from the read-only mount as
an external TEST ORACLE (not vendored), randomly initializes it (weights AND BatchNorm
running stats), converts the state dict with `efficientnet_torch_to_flax`, and asserts

  1. full-tower `extract_features` parity at a NON-SQUARE size whose intermediate-size
     parity differs from the 456-traced static-padding chain (the exact place SAME-pad
     drift hides — `efficient_net_custom_utils.py:248-277`),
  2. per-block pooled activation parity (torch forward hooks vs our in-jit capture),
  3. avg-pooled `forward` parity (the '-detect' encode_image path,
     `efficientnet_custom.py:287-313`),
  4. END-TO-END dissection agreement: the same uint8 probe through (a) the torch
     pipeline — minmax+meanstd normalize, hooks, spatial mean, reference `soft_wpmi` —
     and (b) our engine's harvest + scoring; per-neuron top-1 concepts must agree >=99%.

Runs on CPU JAX (conftest forces the 8-device CPU platform)."""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF_MODULES = "/root/reference/model/modules"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_MODULES), reason="reference mount not available"
)


@pytest.fixture(scope="module")
def ref_effnet():
    """Load the reference's efficientnet_custom as a package (its relative import of
    efficient_net_custom_utils needs a parent package) without executing the heavier
    model/__init__.py (timm etc.)."""
    pkg = types.ModuleType("_ref_effnet_pkg")
    pkg.__path__ = [REF_MODULES]
    sys.modules["_ref_effnet_pkg"] = pkg
    for name in ("efficient_net_custom_utils", "efficientnet_custom"):
        spec = importlib.util.spec_from_file_location(
            f"_ref_effnet_pkg.{name}", os.path.join(REF_MODULES, name + ".py")
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"_ref_effnet_pkg.{name}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["_ref_effnet_pkg.efficientnet_custom"]


def _random_torch_b5(ref_effnet, seed=0, variant="efficientnet-b5"):
    """Reference tower exactly as `load_image_encoder` builds it for
    'tf_efficientnet_b5_ns-detect' (`model/modules/__init__.py:41-46`), but randomly
    initialized (weights + BN running stats) instead of downloaded."""
    import torch

    torch.manual_seed(seed)
    model = ref_effnet.EfficientNet.from_name(variant, num_classes=1)
    with torch.no_grad():
        for k, v in model.state_dict().items():
            if k.endswith("running_var"):
                v.copy_(torch.rand_like(v) * 0.5 + 0.5)
            elif k.endswith("num_batches_tracked"):
                continue
            else:
                v.copy_(torch.randn_like(v) * 0.05)
    model.eval()
    model.set_swish(memory_efficient=False)
    return model


@pytest.fixture(scope="module")
def towers(ref_effnet):
    """(torch_model, flax_model, flax_variables) with converted weights."""
    from mammodissect.models.efficientnet import EfficientNet
    from mammodissect.utils.torch_convert import efficientnet_torch_to_flax, merge_into

    tm = _random_torch_b5(ref_effnet)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, stats, unused = efficientnet_torch_to_flax(sd)
    unused = [k for k in unused if not k.endswith("num_batches_tracked")]
    assert not unused, f"converter left reference keys unmapped: {unused[:8]}"

    fm = EfficientNet(variant="efficientnet-b5", in_channels=3)
    variables = jax.eval_shape(
        fm.init, jax.random.PRNGKey(0), jnp.ones((1, 64, 64, 3), jnp.float32)
    )
    variables = jax.tree_util.tree_map(lambda s: np.zeros(s.shape, s.dtype), variables)
    merged_p, mm_p = merge_into(variables["params"], params)
    merged_s, mm_s = merge_into(variables["batch_stats"], stats)
    assert not mm_p and not mm_s, (mm_p[:5], mm_s[:5])
    return tm, fm, {"params": merged_p, "batch_stats": merged_s}


# non-square, even sizes: at 96x64 the stage-4 strided depthwise sees an even input
# where the 456-traced chain saw odd (57) -> static pad (1,1) vs true-SAME (0,1);
# this size exercises exactly the drift the static pad_mode exists to reproduce.
H, W = 96, 64


def test_static_padding_matches_reference_chain():
    """B5 static chain traced at 456: stem pad (0,1); stage-4 first depthwise (block 13,
    k3 s2 at size 57) pads (1,1) — the value that differs from true SAME at even
    intermediate sizes like 1520x912's 190x114."""
    from mammodissect.models.efficientnet import EfficientNet

    stem_pad, block_pads = EfficientNet(variant="efficientnet-b5", in_channels=3)._paddings()
    assert stem_pad == ((0, 1), (0, 1))
    assert block_pads[13] == ((1, 1), (1, 1))  # true SAME at 190/114 would be (0,1)
    assert block_pads[27] == ((2, 2), (2, 2))  # k5 at 29 (odd) — equals SAME at 95/57


def test_full_tower_extract_features(towers):
    import torch

    tm, fm, variables = towers
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, H, W, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm.extract_features(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    got, _ = fm.apply(variables, jnp.asarray(x), train=False)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_per_block_pooled_capture(towers):
    import torch

    tm, fm, variables = towers
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, H, W, 3)).astype(np.float32)

    # torch side: the reference's hook + spatial-mean rule (`utils.py:27-52,170-172`)
    feats = {}
    hooks = []
    for i, blk in enumerate(tm._blocks):
        def hook(_m, _i, out, i=i):
            feats[i] = out.mean(dim=[2, 3]).detach().numpy()
        hooks.append(blk.register_forward_hook(hook))
    with torch.no_grad():
        tm.extract_features(torch.tensor(x.transpose(0, 3, 1, 2)))
    for h in hooks:
        h.remove()

    capture = tuple(range(39))
    _, captured = fm.apply(variables, jnp.asarray(x), train=False, capture=capture)
    assert len(captured) == 39
    for i in capture:
        np.testing.assert_allclose(
            np.asarray(captured[f"blocks.{i}"]), feats[i], atol=2e-4, rtol=1e-4,
            err_msg=f"block {i}",
        )


def test_detect_forward_pooled(towers):
    """The '-detect' encode_image path: avg-pool + flatten (+eval-mode dropout)."""
    import torch

    tm, _fm, variables = towers
    from mammodissect.models.efficientnet import EfficientNetMammo

    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, H, W, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    fm = EfficientNetMammo(variant="efficientnet-b5", in_channels=3, pooling="avg")
    pooled, _ = fm.apply(
        {"params": {"backbone": variables["params"]},
         "batch_stats": {"backbone": variables["batch_stats"]}},
        jnp.asarray(x), train=False,
    )
    assert pooled.shape == (2, 2048)
    np.testing.assert_allclose(np.asarray(pooled), want, atol=2e-4, rtol=1e-4)


def test_end_to_end_dissection_agreement(towers, tmp_path):
    """Same uint8 probe + same clip_feats through both dissection pipelines:
    per-neuron top-1 concept agreement >= 99% over all 39 layers (north star)."""
    import torch

    tm, fm, variables = towers
    sys.path.insert(0, "/root/reference/concept_vit")
    try:
        ref_similarity = __import__("similarity")
    finally:
        sys.path.remove("/root/reference/concept_vit")

    n_images, n_concepts = 200, 60
    mean, std = 0.3089279, 0.25053
    rng = np.random.default_rng(3)
    probe_u8 = rng.integers(0, 256, size=(n_images, H, W, 1), dtype=np.uint8)
    img_emb = rng.normal(size=(n_images, 16)).astype(np.float32)
    txt_emb = rng.normal(size=(n_concepts, 16)).astype(np.float32)
    img_emb /= np.linalg.norm(img_emb, axis=1, keepdims=True)
    txt_emb /= np.linalg.norm(txt_emb, axis=1, keepdims=True)
    clip_feats = img_emb @ txt_emb.T

    # ---- torch pipeline: normalize (minmax+meanstd), hooks, spatial mean ----
    x = probe_u8.astype(np.float32)[..., 0]  # [N, H, W] grayscale
    x -= x.min(axis=(1, 2), keepdims=True)
    x /= x.max(axis=(1, 2), keepdims=True)
    x = (x - mean) / std
    x3 = np.repeat(x[:, None, :, :], 3, axis=1)  # PIL convert('RGB') equivalent

    feats = {i: [] for i in range(39)}
    hooks = []
    for i, blk in enumerate(tm._blocks):
        def hook(_m, _i, out, i=i):
            feats[i].append(out.mean(dim=[2, 3]).detach().numpy())
        hooks.append(blk.register_forward_hook(hook))
    with torch.no_grad():
        for s in range(0, n_images, 50):
            tm.extract_features(torch.tensor(x3[s : s + 50]))
    for h in hooks:
        h.remove()
    torch_top1 = {}
    for i in range(39):
        tf = np.concatenate(feats[i])
        sim = ref_similarity.soft_wpmi(
            torch.tensor(clip_feats), torch.tensor(tf), device="cpu"
        ).numpy()
        torch_top1[i] = sim.argmax(axis=1)

    # ---- our pipeline: engine harvest (u8 wire + on-device normalize) + scoring ----
    from mammodissect.dissect.engine import harvest_probe
    from mammodissect.dissect.targets import EfficientNetTarget
    from mammodissect.data.probes import ArrayProbe
    from mammodissect.ops.similarity import soft_wpmi

    target = EfficientNetTarget(fm, variables)
    probe = ArrayProbe(images=probe_u8, mean=mean, std=std)
    layers = [f"blocks.{i}" for i in range(39)]
    acts, n_seen = harvest_probe(target, probe, layers, "avg", batch_size=50)
    assert n_seen == n_images

    agree = total = 0
    for i in range(39):
        ours = np.asarray(soft_wpmi(clip_feats, acts[f"blocks.{i}"])).argmax(axis=1)
        agree += int((ours == torch_top1[i]).sum())
        total += ours.shape[0]
    agreement = agree / total
    assert agreement >= 0.99, f"end-to-end top-1 agreement {agreement:.4f} < 0.99"
