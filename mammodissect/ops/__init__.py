"""Scoring / pooling ops (L4 of the reference layer map, SURVEY.md §2.3)."""

from mammodissect.ops.similarity import (
    SIMILARITY_FNS,
    cos_similarity,
    cos_similarity_cubed,
    get_similarity_fn,
    rank_reorder,
    soft_wpmi,
    wpmi,
)
from mammodissect.ops.pooling import pool_activation, gem_pool

__all__ = [
    "SIMILARITY_FNS",
    "get_similarity_fn",
    "soft_wpmi",
    "wpmi",
    "rank_reorder",
    "cos_similarity",
    "cos_similarity_cubed",
    "pool_activation",
    "gem_pool",
]
