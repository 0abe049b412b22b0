"""Vendored workload data assets (data, not code — copied from the reference repo so
the canonical runs need no external mount):

  concepts/Specific_concepts_sorted.txt   the 762-concept set every driver consumes
                                          (reference `Concepts/Specific_concepts_sorted.txt`,
                                          wired in `run_clipdissect.sh:6-9`)
  concepts/Extended_Breast_text_categories.xlsx  category workbook used by the Plots
                                          notebooks' mapping (Plots/process_result_csvs.ipynb cell 16)
  dataset/{categories,updated_categories,seven_broad_categories}.json
                                          concept→category groupings (28/30/7 groups)
  dataset/{prompts,prompts_all}.json      pos/neg x left/right report templates
                                          (`prompts/prompts.py:4-47` input)
"""
from __future__ import annotations

import os

_ROOT = os.path.dirname(os.path.abspath(__file__))


def asset_path(relpath: str) -> str:
    """Absolute path of a vendored asset, e.g. asset_path('dataset/categories.json')."""
    path = os.path.join(_ROOT, relpath)
    if not os.path.exists(path):
        raise FileNotFoundError(f"no vendored asset {relpath!r} under {_ROOT}")
    return path


def concept_set_path() -> str:
    """The canonical 762-concept set (`Concepts/Specific_concepts_sorted.txt`)."""
    return asset_path("concepts/Specific_concepts_sorted.txt")


def categories_path(name: str = "seven_broad") -> str:
    """Category-grouping JSON: 'seven_broad' (7 groups), 'categories' (28),
    'updated' (30)."""
    fname = {
        "seven_broad": "seven_broad_categories.json",
        "categories": "categories.json",
        "updated": "updated_categories.json",
    }[name]
    return asset_path(f"dataset/{fname}")


def prompts_path(all_variants: bool = False) -> str:
    """Finding->sentence-template JSON for prompt-generated reports."""
    return asset_path(f"dataset/{'prompts_all' if all_variants else 'prompts'}.json")


def category_workbook_path() -> str:
    return asset_path("concepts/Extended_Breast_text_categories.xlsx")


def clip_bpe_vocab_path() -> str:
    """The standard CLIP BPE merges file the reference vendors
    (`concept_vit/clip/bpe_simple_vocab_16e6.txt.gz`, loaded unconditionally by its
    tokenizer at `simple_tokenizer.py:62-75`) — copied byte-identical so out-of-the-box
    G-dissect concept tokenization matches the reference token-for-token."""
    return asset_path("clip/bpe_simple_vocab_16e6.txt.gz")
