"""CLIP tower tests: structure, capture, and numerical parity of the residual
attention block against a torch reference built from nn.MultiheadAttention (the same
primitive the OpenAI implementation uses, `concept_vit/clip/model.py:300-330`)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from mammodissect.models.clip_vit import (
    ClipModule,
    OpenAIClip,
    ResidualAttentionBlock,
    clip_torch_to_flax,
)


def torch_clip_block(d, heads, causal, x_np, weights):
    """Reference CLIP block: x + attn(ln_1(x)); x + mlp(ln_2(x)) with quick-GELU."""
    ln1 = tnn.LayerNorm(d); ln2 = tnn.LayerNorm(d)
    attn = tnn.MultiheadAttention(d, heads, batch_first=True)
    fc = tnn.Linear(d, 4 * d); proj = tnn.Linear(4 * d, d)
    with torch.no_grad():
        ln1.weight.copy_(torch.tensor(weights["ln_1"]["scale"]))
        ln1.bias.copy_(torch.tensor(weights["ln_1"]["bias"]))
        ln2.weight.copy_(torch.tensor(weights["ln_2"]["scale"]))
        ln2.bias.copy_(torch.tensor(weights["ln_2"]["bias"]))
        attn.in_proj_weight.copy_(torch.tensor(weights["attn_in"]["kernel"].T))
        attn.in_proj_bias.copy_(torch.tensor(weights["attn_in"]["bias"]))
        attn.out_proj.weight.copy_(torch.tensor(weights["attn_out"]["kernel"].T))
        attn.out_proj.bias.copy_(torch.tensor(weights["attn_out"]["bias"]))
        fc.weight.copy_(torch.tensor(weights["mlp_fc"]["kernel"].T))
        fc.bias.copy_(torch.tensor(weights["mlp_fc"]["bias"]))
        proj.weight.copy_(torch.tensor(weights["mlp_proj"]["kernel"].T))
        proj.bias.copy_(torch.tensor(weights["mlp_proj"]["bias"]))
    x = torch.tensor(x_np)
    t = x.shape[1]
    mask = torch.triu(torch.full((t, t), float("-inf")), diagonal=1) if causal else None
    with torch.no_grad():
        h = ln1(x)
        a, _ = attn(h, h, h, attn_mask=mask, need_weights=False)
        x = x + a
        h = fc(ln2(x))
        x = x + proj(h * torch.sigmoid(1.702 * h))
    return x.numpy()


@pytest.mark.parametrize("causal", [False, True])
def test_block_matches_torch_mha(causal):
    d, heads, b, t = 32, 4, 2, 7
    block = ResidualAttentionBlock(d, heads, causal=causal)
    x = np.random.default_rng(0).normal(size=(b, t, d)).astype(np.float32)
    variables = block.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(block.apply(variables, jnp.asarray(x)))
    want = torch_clip_block(d, heads, causal, x, jax.device_get(variables["params"]))
    np.testing.assert_allclose(got, want, atol=5e-5)


@pytest.fixture(scope="module")
def tiny_clip():
    return OpenAIClip(
        "ViT-B/16", vision_width=32, vision_layers=3, vision_heads=2,
        text_width=32, text_layers=2, text_heads=2, embed_dim=16,
        vocab_size=600, patch_size=16, image_size=32,
    )


def test_dissector_interface(tiny_clip):
    imgs = np.random.default_rng(1).normal(size=(2, 32, 32, 3)).astype(np.float32)
    ie = tiny_clip.embed_images(imgs)
    te = tiny_clip.embed_texts(["a dog", "a mass"])
    assert ie.shape == (2, 16) and te.shape == (2, 16)
    np.testing.assert_allclose(np.linalg.norm(ie, axis=1), 1.0, rtol=1e-5)


def test_vit_target_capture_cls_rule(tiny_clip):
    """ViT layers captured with reference spelling; 3-D -> CLS pooling."""
    imgs = np.random.default_rng(2).normal(size=(2, 32, 32, 3)).astype(np.float32)
    out = tiny_clip.harvest(imgs, ["vision_model.encoder.layers[0]", "layers.2"])
    assert set(out) == {"layers.0", "layers.2"}
    assert out["layers.0"].shape == (2, 32)  # [B, width] = CLS token


def test_torch_statedict_conversion_layout():
    """OpenAI-layout state dict (synthesized) maps onto our params with right shapes."""
    d, layers, heads, ctx, vocab, emb = 32, 2, 2, 77, 100, 16
    sd = {}
    for i in range(layers):
        p = f"transformer.resblocks.{i}."
        sd[p + "attn.in_proj_weight"] = np.zeros((3 * d, d), np.float32)
        sd[p + "attn.in_proj_bias"] = np.zeros(3 * d, np.float32)
        sd[p + "attn.out_proj.weight"] = np.zeros((d, d), np.float32)
        sd[p + "attn.out_proj.bias"] = np.zeros(d, np.float32)
        sd[p + "mlp.c_fc.weight"] = np.zeros((4 * d, d), np.float32)
        sd[p + "mlp.c_fc.bias"] = np.zeros(4 * d, np.float32)
        sd[p + "mlp.c_proj.weight"] = np.zeros((d, 4 * d), np.float32)
        sd[p + "mlp.c_proj.bias"] = np.zeros(d, np.float32)
        for ln in ("ln_1", "ln_2"):
            sd[p + ln + ".weight"] = np.ones(d, np.float32)
            sd[p + ln + ".bias"] = np.zeros(d, np.float32)
    sd["token_embedding.weight"] = np.zeros((vocab, d), np.float32)
    sd["positional_embedding"] = np.zeros((ctx, d), np.float32)
    sd["text_projection"] = np.zeros((d, emb), np.float32)
    sd["ln_final.weight"] = np.ones(d, np.float32)
    sd["ln_final.bias"] = np.zeros(d, np.float32)
    sd["logit_scale"] = np.asarray(2.6593, np.float32)
    p = clip_torch_to_flax(sd)
    assert p["text"]["resblocks_0"]["attn_in"]["kernel"].shape == (d, 3 * d)
    assert p["text"]["resblocks_1"]["mlp_fc"]["kernel"].shape == (d, 4 * d)
    assert p["text"]["token_embedding"]["embedding"].shape == (vocab, d)


def test_hf_layout_checkpoint_parity(tmp_path):
    """The reference's clip-cub/clip-bloodmnist targets are HF-hub fine-tunes
    (`data_utils.py:29,33,63-70`); a locally saved copy arrives with
    vision_model.*/text_model.* keys. `hf_clip_to_openai_layout` + the existing
    converter must reproduce transformers' CLIPModel features exactly."""
    transformers = pytest.importorskip("transformers")

    cfg = transformers.CLIPConfig(
        projection_dim=16,
        # widths are 64-divisible so the reference's heads=width//64 geometry
        # inference (`clip/model.py:419`) reproduces the true head count
        vision_config=dict(hidden_size=128, num_hidden_layers=2,
                           num_attention_heads=2, intermediate_size=512,
                           image_size=32, patch_size=8, projection_dim=16),
        text_config=dict(hidden_size=128, num_hidden_layers=2,
                         num_attention_heads=2, intermediate_size=512,
                         max_position_embeddings=16, vocab_size=99,
                         projection_dim=16, eos_token_id=98),
    )
    torch.manual_seed(0)
    hf = transformers.CLIPModel(cfg).eval()

    rng = np.random.default_rng(0)
    pix = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    # EOT must be the max id so OpenAI argmax pooling and HF eos pooling agree
    ids = np.array([[1, 5, 7, 98] + [0] * 12, [1, 9, 98, 0] + [0] * 12], np.int64)
    with torch.no_grad():
        want_img = hf.get_image_features(pixel_values=torch.tensor(pix)).numpy()
        want_txt = hf.get_text_features(input_ids=torch.tensor(ids)).numpy()

    ckpt = tmp_path / "hf_clip.pth"
    torch.save(hf.state_dict(), ckpt)
    ours = OpenAIClip(ckpt_path=str(ckpt))
    assert ours.module.vision_layers == 2 and ours.module.vocab_size == 99
    from mammodissect.models.clip_vit import ClipModule as _CM
    got_img = np.asarray(ours.module.apply(
        ours.variables, jnp.asarray(pix.transpose(0, 2, 3, 1)), method=_CM.encode_image))
    got_txt = np.asarray(ours.module.apply(
        ours.variables, jnp.asarray(ids.astype(np.int32)), method=_CM.encode_text))
    np.testing.assert_allclose(got_img, want_img, atol=2e-4)
    np.testing.assert_allclose(got_txt, want_txt, atol=2e-4)


def test_hf_vision_only_checkpoint_loads(tmp_path):
    """CLIPForImageClassification-style (vision-only) fine-tunes load the vision
    tower and leave the text tower at arch defaults instead of KeyError-ing."""
    transformers = pytest.importorskip("transformers")

    vcfg = transformers.CLIPVisionConfig(
        hidden_size=128, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=512, image_size=32, patch_size=8, projection_dim=16)
    torch.manual_seed(1)
    hf = transformers.CLIPVisionModel(vcfg).eval()
    sd = {f"clip.{k}": v for k, v in hf.state_dict().items()}  # wrapper prefix
    sd["classifier.weight"] = torch.zeros(3, 128)  # head: must be ignored
    sd["classifier.bias"] = torch.zeros(3)
    ckpt = tmp_path / "hf_vision.pth"
    torch.save(sd, ckpt)

    ours = OpenAIClip(ckpt_path=str(ckpt))
    assert ours.module.vision_layers == 2 and ours.module.image_size == 32

    pix = np.random.default_rng(1).normal(size=(2, 3, 32, 32)).astype(np.float32)
    # patch kernel converted (OIHW -> HWIO) and loaded, head dropped
    k = np.asarray(ours.variables["params"]["visual"]["conv1"]["kernel"])
    want_k = hf.state_dict()["vision_model.embeddings.patch_embedding.weight"].numpy()
    np.testing.assert_allclose(k, want_k.transpose(2, 3, 1, 0), atol=1e-6)
    out = ours.embed_images(pix.transpose(0, 2, 3, 1))
    # no visual_projection in a CLIPVisionModel sd: proj stays at the arch default
    assert out.shape == (2, ours.module.embed_dim) and np.isfinite(out).all()
