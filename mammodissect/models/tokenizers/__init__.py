"""Native tokenizers: BERT WordPiece (Bio_ClinicalBERT) and CLIP byte-BPE.

The reference leans on HF AutoTokenizer (`data/data_utils.py:8-22`) and a vendored BPE
(`concept_vit/clip/simple_tokenizer.py`). Here both algorithms are implemented natively
and load their vocab files from a configurable path (this environment has zero egress,
so nothing is downloaded)."""

from mammodissect.models.tokenizers.wordpiece import WordPieceTokenizer
from mammodissect.models.tokenizers.bpe import ClipBPETokenizer

__all__ = ["WordPieceTokenizer", "ClipBPETokenizer"]
