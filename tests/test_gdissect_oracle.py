"""G-dissect END-TO-END agreement oracle (VERDICT r3 missing #3): the OpenAI-CLIP
dissector + CLIP target mode (`describe_og_neurons.py` with `run_og_clip.sh:8`'s
`vision_model.encoder.layers[k]` layers) gets the same treatment as the M-dissect
pipeline's full-tower oracle (test_fulltower_parity.py):

  torch oracle side (built from the reference's OWN code/layouts, random weights):
    * dissector = the vendored OpenAI CLIP (`/root/reference/concept_vit/clip/
      model.py:202-384`), randomly initialized — encode_image/encode_text +
      L2-normalize exactly as `og_utils.py:21-28` / `get_clip_text_features`
    * target   = transformers CLIPModel (the `MODELS["clip"]` HF tower,
      `data_utils.py:25`), hooks on `vision_model.encoder.layers[k]` with the
      reference's tuple-then-CLS pooling rule (`og_utils.py:31-44`)
    * scoring  = the reference's own `concept_vit/similarity.py` soft_wpmi

  our side: both torch checkpoints converted (`clip_torch_to_flax`,
  `hf_clip_to_openai_layout`), harvest through the engine's capture, our soft_wpmi.

  Assertion: per-neuron top-1 concept agreement >= 99% over every dissected layer.

Runs on CPU JAX (conftest forces the CPU platform)."""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

REF_CLIP = "/root/reference/concept_vit/clip"
REF_SIM = "/root/reference/concept_vit"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_CLIP), reason="reference mount not available"
)


@pytest.fixture(scope="module")
def ref_clip_model_module():
    """Load the reference's vendored `clip/model.py` standalone (no package exec)."""
    spec = importlib.util.spec_from_file_location(
        "_ref_clip_model", os.path.join(REF_CLIP, "model.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_ref_clip_model"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_similarity():
    sys.path.insert(0, REF_SIM)
    try:
        return __import__("similarity")
    finally:
        sys.path.remove(REF_SIM)


H = W = 32  # patch 8 -> 4x4 grid; widths 128 so heads = width//64 = 2 (the geometry
# clip_config_from_state_dict infers, `clip/model.py:419` parity)


@pytest.fixture(scope="module")
def dissector_pair(ref_clip_model_module, tmp_path_factory):
    """(torch vendored CLIP, our converted OpenAIClip) with identical weights."""
    import torch

    from mammodissect.models.clip_vit import OpenAIClip

    torch.manual_seed(0)
    tm = ref_clip_model_module.CLIP(
        embed_dim=32, image_resolution=H, vision_layers=3, vision_width=128,
        vision_patch_size=8, context_length=16, vocab_size=97,
        transformer_width=128, transformer_heads=2, transformer_layers=2,
    ).float().eval()
    ckpt = tmp_path_factory.mktemp("gd") / "ref_clip.pth"
    torch.save(tm.state_dict(), ckpt)
    ours = OpenAIClip(ckpt_path=str(ckpt))
    assert ours.module.vision_layers == 3 and ours.module.context_length == 16
    return tm, ours


@pytest.fixture(scope="module")
def target_pair(tmp_path_factory):
    """(torch HF CLIPModel, our converted OpenAIClip) — the `MODELS['clip']` target."""
    import torch

    transformers = pytest.importorskip("transformers")
    from mammodissect.models.clip_vit import OpenAIClip

    cfg = transformers.CLIPConfig(
        projection_dim=16,
        vision_config=dict(hidden_size=128, num_hidden_layers=3,
                           num_attention_heads=2, intermediate_size=512,
                           image_size=H, patch_size=8, projection_dim=16),
        text_config=dict(hidden_size=128, num_hidden_layers=2,
                         num_attention_heads=2, intermediate_size=512,
                         max_position_embeddings=16, vocab_size=97,
                         projection_dim=16, eos_token_id=96),
    )
    torch.manual_seed(1)
    hf = transformers.CLIPModel(cfg).eval()
    ckpt = tmp_path_factory.mktemp("gt") / "hf_clip.pth"
    torch.save(hf.state_dict(), ckpt)
    ours = OpenAIClip(ckpt_path=str(ckpt))
    assert ours.module.vision_layers == 3
    return hf, ours


def _ref_clip_feats(tm, probe_nchw, tokens):
    """clip_feats the reference way (`og_utils.py:21-28`, `utils.py:566-594`):
    encode both towers, L2-normalize, img @ txt.T."""
    import torch

    with torch.no_grad():
        img = tm.encode_image(torch.tensor(probe_nchw))
        txt = tm.encode_text(torch.tensor(tokens))
    img = img / img.norm(dim=1, keepdim=True)
    txt = txt / txt.norm(dim=1, keepdim=True)
    return (img @ txt.T).numpy().astype(np.float32)


def test_gdissect_end_to_end_agreement(dissector_pair, target_pair, ref_similarity):
    """Per-neuron top-1 concept agreement >= 99% for the full G-dissect pipeline."""
    import torch

    tm_dis, our_dis = dissector_pair
    tm_tgt, our_tgt = target_pair

    n_images, n_concepts, ctx = 200, 60, 16
    rng = np.random.default_rng(2)
    probe = rng.normal(size=(n_images, H, W, 3)).astype(np.float32)
    # concept tokens: EOT = max id at the end of a random-length prefix, so the
    # vendored argmax pooling (`clip/model.py:354-364`) finds it
    tokens = np.zeros((n_concepts, ctx), np.int64)
    for i in range(n_concepts):
        ln = rng.integers(3, ctx - 1)
        tokens[i, :ln] = rng.integers(1, 95, size=ln)
        tokens[i, ln] = 96
    layers = [f"vision_model.encoder.layers[{k}]" for k in range(3)]

    # ---- torch pipeline ----
    clip_feats_t = _ref_clip_feats(tm_dis, probe.transpose(0, 3, 1, 2), tokens)
    feats = {k: [] for k in range(3)}
    hooks = []
    for k in range(3):
        def hook(_m, _i, out, k=k):
            out = out[0] if type(out) is tuple else out  # `og_utils.py:38-39`
            feats[k].append(out[:, 0].clone().detach().numpy())  # 3-D CLS rule
        hooks.append(tm_tgt.vision_model.encoder.layers[k].register_forward_hook(hook))
    with torch.no_grad():
        for s in range(0, n_images, 50):
            tm_tgt.get_image_features(
                pixel_values=torch.tensor(probe.transpose(0, 3, 1, 2)[s : s + 50]))
    for h in hooks:
        h.remove()
    torch_top1 = {}
    for k in range(3):
        tf = np.concatenate(feats[k])
        sim = ref_similarity.soft_wpmi(
            torch.tensor(clip_feats_t), torch.tensor(tf), device="cpu").numpy()
        torch_top1[k] = sim.argmax(axis=1)

    # ---- our pipeline: converted dissector + engine capture + our soft_wpmi ----
    from mammodissect.dissect.capture import canonical_layer_name
    from mammodissect.models.clip_vit import ClipModule
    from mammodissect.ops.similarity import soft_wpmi

    img_emb = our_dis.embed_images(probe)
    txt_raw = np.asarray(our_dis.module.apply(
        our_dis.variables, jnp.asarray(tokens.astype(np.int32)),
        method=ClipModule.encode_text))
    txt_emb = txt_raw / np.clip(np.linalg.norm(txt_raw, axis=1, keepdims=True),
                                1e-12, None)
    clip_feats_o = (img_emb @ txt_emb.T).astype(np.float32)
    np.testing.assert_allclose(clip_feats_o, clip_feats_t, atol=2e-4)

    acts = our_tgt.harvest(probe, layers, pool_mode="avg")
    agree = total = 0
    for k in range(3):
        tf = acts[canonical_layer_name(layers[k])]
        ours = np.asarray(soft_wpmi(clip_feats_o, tf)).argmax(axis=1)
        agree += int((ours == torch_top1[k]).sum())
        total += ours.shape[0]
    agreement = agree / total
    assert agreement >= 0.99, f"G-dissect end-to-end top-1 agreement {agreement:.4f}"


def test_gdissect_layer_spelling_roundtrip():
    """run_og_clip.sh's exact layer spellings resolve to our capture indices."""
    from mammodissect.dissect.capture import canonical_layer_name, layer_index

    for k in (0, 5, 11):
        canon = canonical_layer_name(f"vision_model.encoder.layers[{k}]")
        assert canon == f"layers.{k}"
        assert layer_index(canon) == k
