"""Dissection engine (L5a): activation harvest, feature cache, scoring, CSV results."""

from mammodissect.dissect.capture import canonical_layer_name, layer_index
from mammodissect.dissect.engine import (
    get_save_names,
    get_similarity_from_activations,
    run_dissection,
    save_activations,
)
from mammodissect.dissect.results import write_results

__all__ = [
    "canonical_layer_name",
    "layer_index",
    "get_save_names",
    "save_activations",
    "get_similarity_from_activations",
    "run_dissection",
    "write_results",
]
