"""Out-of-the-box CLIP BPE parity: the vendored merges vocab
(`mammodissect/assets/clip/bpe_simple_vocab_16e6.txt.gz`, byte-identical to the
reference's `concept_vit/clip/bpe_simple_vocab_16e6.txt.gz`) must tokenize
token-for-token like the reference's own SimpleTokenizer + clip.tokenize
(`concept_vit/clip/simple_tokenizer.py:62-131`, `clip/clip.py:196-232`)."""
import gzip
import hashlib
import os
import sys
import types

import numpy as np
import pytest

from mammodissect.assets import clip_bpe_vocab_path, concept_set_path
from mammodissect.models.tokenizers import ClipBPETokenizer

REF_TOKENIZER_DIR = "/root/reference/concept_vit/clip"


def _load_reference_tokenizer():
    """Import the reference SimpleTokenizer from the read-only mount as an oracle.

    Its module imports `ftfy` (absent here); the concept set is pure ASCII and
    already well-formed, so a fix_text identity stub is faithful for these inputs."""
    if not os.path.isdir(REF_TOKENIZER_DIR):
        pytest.skip("reference mount unavailable")
    try:
        import regex  # noqa: F401  (the oracle needs it)
    except Exception:
        pytest.skip("regex package unavailable")
    stubbed = "ftfy" not in sys.modules
    if stubbed:
        stub = types.ModuleType("ftfy")
        stub.fix_text = lambda s: s
        sys.modules["ftfy"] = stub
    sys.path.insert(0, REF_TOKENIZER_DIR)
    try:
        import simple_tokenizer as ref_mod
    finally:
        sys.path.remove(REF_TOKENIZER_DIR)
        # the stub must NOT leak: transformers probes importlib.metadata for "ftfy"
        # and a version-less stub module breaks its import suite-wide
        if stubbed:
            sys.modules.pop("ftfy", None)
        sys.modules.pop("simple_tokenizer", None)  # keep the namespace clean too
    return ref_mod.SimpleTokenizer(bpe_path=clip_bpe_vocab_path())


@pytest.fixture(scope="module")
def oracle():
    return _load_reference_tokenizer()


@pytest.fixture(scope="module")
def ours():
    return ClipBPETokenizer.default()


def test_vendored_vocab_is_byte_identical():
    ref = os.path.join(REF_TOKENIZER_DIR, "bpe_simple_vocab_16e6.txt.gz")
    if not os.path.exists(ref):
        pytest.skip("reference mount unavailable")
    h = lambda p: hashlib.sha256(open(p, "rb").read()).hexdigest()
    assert h(clip_bpe_vocab_path()) == h(ref)


def test_vocab_size_is_canonical(ours):
    assert ours.vocab_size == 49408  # 256*2 + 48894 merges + 2 specials


def test_concept_set_token_parity(oracle, ours):
    """Every canonical concept (the full 763-entry set) encodes identically."""
    with open(concept_set_path()) as f:
        concepts = [w for w in f.read().split("\n") if w.strip()]
    assert len(concepts) == 763
    for w in concepts:
        assert ours.encode(w) == oracle.encode(w), w


def test_tokenize_matrix_parity(oracle, ours):
    """Full `clip.tokenize` contract on a sample: [SOT] ids [EOT], zero-padded 77."""
    sample = ["calcification", "a photo of a spiculated mass",
              "BI-RADS 4", "fatty tissue, scattered densities!"]
    got = ours(sample)
    want = np.zeros_like(got)
    for i, t in enumerate(sample):
        ids = [oracle.encoder["<|startoftext|>"]] + oracle.encode(t) + [
            oracle.encoder["<|endoftext|>"]]
        want[i, : len(ids)] = ids
    np.testing.assert_array_equal(got, want)


def test_openai_clip_defaults_to_vendored_vocab():
    """`OpenAIClip.tokenize` out of the box uses the real vocab, not the toy."""
    from mammodissect.models.clip_vit import OpenAIClip

    clip = OpenAIClip.__new__(OpenAIClip)  # tokenizer path only; skip tower init
    clip.tokenizer = None
    toks = clip.tokenize(["a photo of a dog"])
    assert toks.shape == (1, 77)
    tok = ClipBPETokenizer.default()
    assert toks[0, 0] == tok.sot and tok.vocab_size == 49408
    # known canonical encoding of "a photo of a dog" under the standard CLIP vocab
    assert [int(x) for x in toks[0] if x != 0] == [
        tok.sot, 320, 1125, 539, 320, 1929, tok.eot]


def test_toy_fallbacks_warn():
    with pytest.warns(UserWarning, match="chars-only"):
        ClipBPETokenizer.toy()
    from mammodissect.dissect.dissectors import get_dissector

    small = {"image_shape": (32, 32, 1), "bert_layers": 1,
             "model_config": {
                 "name": "clip_custom", "temperature": 0.07,
                 "image_encoder": {"model_type": "cnn", "variant": "efficientnet-b0",
                                   "in_channels": 1},
                 "text_encoder": {"pooling": "eos"},
                 "projection_head": {"name": "linear", "proj_dim": 16}}}
    with pytest.warns(UserWarning, match="toy WordPiece"):
        get_dissector("breastclip", **small)


def test_unicode_word_splitting_matches_reference():
    """The reference pattern uses \\p{L}/\\p{N} (`simple_tokenizer.py:77`); our
    stdlib-re port must split accented/non-Latin text identically — a chars-only
    [A-Za-z] class turned 'naïve' into a punctuation run (regression)."""
    ref = _load_reference_tokenizer()
    ours = ClipBPETokenizer.default()
    for text in ("naïve café 12 a-b_c", "mass, 3rd rib's edge!!",
                 "Δ density ±5%", "日本語 text", "under_score__x"):
        assert ours.encode(text) == ref.encode(text), text
