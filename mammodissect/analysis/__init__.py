"""Headless analysis of dissection CSVs — the library form of the reference's
`Plots/process_result_csvs.ipynb` and `Plots/Figure4.ipynb` logic (SURVEY.md §2.10), so
post-processing is reproducible without notebooks."""

from mammodissect.analysis.postprocess import (
    add_global_threshold,
    add_local_threshold,
    layer_mean_similarity,
    load_descriptions_csv,
    map_categories,
    top_categories_per_layer,
)

__all__ = [
    "load_descriptions_csv",
    "layer_mean_similarity",
    "add_local_threshold",
    "add_global_threshold",
    "map_categories",
    "top_categories_per_layer",
]
