"""BreastClip assembly tests (forward contract `model/clip.py:103-137`) with a small
config (B0 tower, 2 BERT layers, 64x64 images) for CPU CI speed."""
import jax.numpy as jnp
import numpy as np
import pytest

from mammodissect.models.breastclip import BreastClip
from mammodissect.models.tokenizers import WordPieceTokenizer


@pytest.fixture(scope="module")
def small_clip():
    tok = WordPieceTokenizer.toy(words=["mass", "calcification", "dense", "breast"])
    cfg = {
        "name": "clip_custom",
        "temperature": 0.07,
        "image_encoder": {"variant": "efficientnet-b0", "in_channels": 1, "model_type": "cnn"},
        "text_encoder": {"pooling": "eos"},
        "projection_head": {"name": "linear", "proj_dim": 32},
    }
    return BreastClip.create(
        model_config=cfg, tokenizer=tok, image_shape=(64, 64, 1), bert_layers=2,
        vocab_size=len(tok.vocab),
    )


def test_forward_contract(small_clip):
    toks = small_clip.tokenize(["a dense breast", "a mass"], max_length=16)
    batch = {
        "images": np.random.default_rng(0).normal(size=(2, 64, 64, 1)).astype(np.float32),
        "input_ids": toks["input_ids"],
        "attention_mask": toks["attention_mask"],
    }
    out = small_clip.forward(batch)
    assert set(out) >= {"image_embeddings", "text_embeddings", "labels", "logit_scale"}
    assert out["image_embeddings"].shape == (2, 32)
    assert out["text_embeddings"].shape == (2, 32)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["image_embeddings"]), axis=1), 1.0, rtol=1e-5
    )
    assert float(out["logit_scale"]) == pytest.approx(1 / 0.07, rel=1e-5)
    np.testing.assert_array_equal(np.asarray(out["labels"]), [0, 1])


def test_two_view_forward(small_clip):
    toks = small_clip.tokenize(["one", "two"], max_length=16)
    imgs = np.random.default_rng(1).normal(size=(2, 64, 64, 1)).astype(np.float32)
    batch = {
        "images": imgs,
        "input_ids": toks["input_ids"],
        "attention_mask": toks["attention_mask"],
        "input_ids2": toks["input_ids"],
        "attention_mask2": toks["attention_mask"],
        "image_views": imgs[::-1].copy(),
    }
    out = small_clip.forward(batch)
    assert "text_embeddings2" in out and "image_view_embeddings" in out


def test_dissector_interface(small_clip):
    imgs = np.random.default_rng(2).normal(size=(3, 64, 64, 1)).astype(np.float32)
    img_emb = small_clip.embed_images(imgs)
    txt_emb = small_clip.embed_texts(["mass", "dense breast", "calcification", "x"])
    assert img_emb.shape == (3, 32) and txt_emb.shape == (4, 32)
    np.testing.assert_allclose(np.linalg.norm(txt_emb, axis=1), 1.0, rtol=1e-5)


def test_eos_pooling_uses_last_valid_token(small_clip):
    """eos pooling takes hidden[attention_mask.sum()-1] (`model/clip.py:66-69`):
    padding must not affect the embedding."""
    toks_short = small_clip.tokenize(["mass"], max_length=8)
    toks_long = small_clip.tokenize(["mass"], max_length=32)
    e1 = small_clip.encode_text(toks_short["input_ids"], toks_short["attention_mask"])
    e2 = small_clip.encode_text(toks_long["input_ids"], toks_long["attention_mask"])
    np.testing.assert_allclose(e1, e2, atol=1e-5)
