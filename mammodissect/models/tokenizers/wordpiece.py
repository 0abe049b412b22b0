"""BERT WordPiece tokenizer (Bio_ClinicalBERT-compatible).

Native implementation of the algorithm behind the reference's
`BertTokenizerFast.from_pretrained("emilyalsentzer/Bio_ClinicalBERT")`
(`concept_vit/utils.py:497-503`; `data/data_utils.py:8-22` with bos←cls fallback):
basic tokenization (lowercase, punctuation split, CJK spacing, accent strip) followed by
greedy longest-match-first WordPiece with '##' continuation. Loads a standard one-token-
per-line `vocab.txt`."""
from __future__ import annotations

import unicodedata
from typing import Dict, Iterable, List, Sequence

import numpy as np


def _is_punct(ch: str) -> bool:
    cp = ord(ch)
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def _is_cjk(cp: int) -> bool:
    return (
        0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF or 0x20000 <= cp <= 0x2A6DF
        or 0x2A700 <= cp <= 0x2EBEF or 0xF900 <= cp <= 0xFAFF
    )


class WordPieceTokenizer:
    def __init__(
        self,
        vocab: Dict[str, int] | None = None,
        vocab_file: str | None = None,
        do_lower_case: bool = True,
        unk_token: str = "[UNK]",
        cls_token: str = "[CLS]",
        sep_token: str = "[SEP]",
        pad_token: str = "[PAD]",
        mask_token: str = "[MASK]",
        max_chars_per_word: int = 100,
    ):
        if vocab is None:
            if vocab_file is None:
                raise ValueError("provide vocab or vocab_file")
            vocab = {}
            with open(vocab_file, encoding="utf-8") as f:
                for i, line in enumerate(f):
                    vocab[line.rstrip("\n")] = i
        self.vocab = vocab
        self.inv_vocab = {v: k for k, v in vocab.items()}
        self.do_lower_case = do_lower_case
        self.unk_token, self.cls_token, self.sep_token = unk_token, cls_token, sep_token
        self.pad_token, self.mask_token = pad_token, mask_token
        self.max_chars_per_word = max_chars_per_word

    # ------------------------------------------------------------------ basic tokenize
    def _clean(self, text: str) -> str:
        out = []
        for ch in text:
            cp = ord(ch)
            if cp == 0 or cp == 0xFFFD or unicodedata.category(ch).startswith("C") and ch not in "\t\n\r":
                continue
            if ch in "\t\n\r" or unicodedata.category(ch) == "Zs":
                out.append(" ")
            else:
                out.append(ch)
        return "".join(out)

    def basic_tokenize(self, text: str) -> List[str]:
        text = self._clean(text)
        # CJK spacing
        spaced = []
        for ch in text:
            if _is_cjk(ord(ch)):
                spaced.extend([" ", ch, " "])
            else:
                spaced.append(ch)
        tokens = "".join(spaced).split()
        out: List[str] = []
        for tok in tokens:
            if self.do_lower_case:
                tok = tok.lower()
                tok = "".join(
                    c for c in unicodedata.normalize("NFD", tok)
                    if unicodedata.category(c) != "Mn"
                )
            # split on punctuation
            cur = []
            for ch in tok:
                if _is_punct(ch):
                    if cur:
                        out.append("".join(cur))
                        cur = []
                    out.append(ch)
                else:
                    cur.append(ch)
            if cur:
                out.append("".join(cur))
        return out

    # -------------------------------------------------------------------- wordpiece
    def wordpiece(self, word: str) -> List[str]:
        if len(word) > self.max_chars_per_word:
            return [self.unk_token]
        pieces: List[str] = []
        start = 0
        while start < len(word):
            end = len(word)
            piece = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    piece = sub
                    break
                end -= 1
            if piece is None:
                return [self.unk_token]
            pieces.append(piece)
            start = end
        return pieces

    def tokenize(self, text: str) -> List[str]:
        out = []
        for word in self.basic_tokenize(text):
            out.extend(self.wordpiece(word))
        return out

    # ---------------------------------------------------------------------- encoding
    def encode(self, text: str, max_length: int = 256) -> List[int]:
        """[CLS] tokens [SEP], truncated to max_length (HF contract; the reference
        tokenizes with padding='max_length', truncation=True, max_length=256,
        `model/clip.py:81-101`)."""
        toks = self.tokenize(text)[: max_length - 2]
        ids = [self.vocab[self.cls_token]]
        ids += [self.vocab.get(t, self.vocab[self.unk_token]) for t in toks]
        ids.append(self.vocab[self.sep_token])
        return ids

    def __call__(self, texts: str | Sequence[str], max_length: int = 256):
        """Batch-encode to {'input_ids', 'attention_mask', 'token_type_ids'} numpy arrays
        padded to max_length."""
        if isinstance(texts, str):
            texts = [texts]
        pad_id = self.vocab[self.pad_token]
        input_ids = np.full((len(texts), max_length), pad_id, dtype=np.int32)
        attention_mask = np.zeros((len(texts), max_length), dtype=np.int32)
        for i, t in enumerate(texts):
            ids = self.encode(t, max_length)
            input_ids[i, : len(ids)] = ids
            attention_mask[i, : len(ids)] = 1
        return {
            "input_ids": input_ids,
            "attention_mask": attention_mask,
            "token_type_ids": np.zeros_like(input_ids),
        }

    @classmethod
    def toy(cls, words: Iterable[str] = ()):
        """Tiny deterministic vocab for tests: specials + single characters + the given
        whole words."""
        specials = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
        chars = [chr(c) for c in range(ord("a"), ord("z") + 1)] + list("0123456789")
        cont = ["##" + c for c in chars]
        vocab_list = specials + chars + cont + sorted(set(words))
        return cls(vocab={w: i for i, w in enumerate(vocab_list)})
