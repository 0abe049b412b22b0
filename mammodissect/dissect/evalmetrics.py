"""Description-quality evaluation (reference `get_cos_similarity`,
`concept_vit/utils.py:618-646` and `CLIP_og_utils.py:178`): score predicted neuron
descriptions against ground-truth names by text-embedding cosine, using the CLIP text
tower and/or a sentence encoder (the reference uses mpnet; any dissector-style text
embedder works here — this environment has no model hub egress, so the embedder is
injected)."""
from __future__ import annotations

from typing import Sequence

import numpy as np


def description_cos_similarity(
    predicted: Sequence[str],
    ground_truth: Sequence[str],
    text_embedder,
    template: str = "{}",
) -> np.ndarray:
    """Per-neuron cosine between embedded predicted and ground-truth descriptions.

    `text_embedder(texts) -> [N, D] L2-normalized` (a dissector's `embed_texts`)."""
    if len(predicted) != len(ground_truth):
        raise ValueError("predicted and ground_truth must align per neuron")
    pe = np.asarray(text_embedder([template.format(t) for t in predicted]))
    ge = np.asarray(text_embedder([template.format(t) for t in ground_truth]))
    pe = pe / np.clip(np.linalg.norm(pe, axis=1, keepdims=True), 1e-12, None)
    ge = ge / np.clip(np.linalg.norm(ge, axis=1, keepdims=True), 1e-12, None)
    return np.sum(pe * ge, axis=1)


def mean_description_similarity(predicted, ground_truth, text_embedder, **kw) -> float:
    return float(np.mean(description_cos_similarity(predicted, ground_truth,
                                                    text_embedder, **kw)))
