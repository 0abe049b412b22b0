"""Image<->text retrieval evaluation (the capability behind the reference's
`imagetext_retrieval` dataset, `data/dataset/imagetext_retrieval.py`)."""
from __future__ import annotations

from typing import Dict, Sequence

import numpy as np


def retrieval_metrics(image_embs: np.ndarray, text_embs: np.ndarray,
                      ks: Sequence[int] = (1, 5, 10)) -> Dict[str, float]:
    """Recall@k both directions + median rank for paired, L2-normalized embeddings."""
    sims = image_embs @ text_embs.T  # [N, N]
    n = sims.shape[0]
    out: Dict[str, float] = {}
    for name, s in (("i2t", sims), ("t2i", sims.T)):
        order = np.argsort(-s, axis=1)
        # rank of the true pair = column where order[i] == i, vectorized
        ranks = np.nonzero(order == np.arange(n)[:, None])[1]
        for k in ks:
            out[f"{name}_recall@{k}"] = float((ranks < k).mean())
        out[f"{name}_median_rank"] = float(np.median(ranks) + 1)
    return out


def evaluate_retrieval(dissector, dataset, batch_size: int = 32,
                       ks: Sequence[int] = (1, 5, 10)) -> Dict[str, float]:
    """Embed a RetrievalDataset's images + texts pairwise and score."""
    images, texts = [], []
    for i in range(len(dataset)):
        item = dataset[i]
        images.append(item["image"])
        texts.append(item["text"])
    img_embs = []
    for start in range(0, len(images), batch_size):
        img_embs.append(dissector.embed_images(np.stack(images[start:start + batch_size])))
    image_embs = np.concatenate(img_embs)
    text_embs = dissector.embed_texts(texts)
    return retrieval_metrics(image_embs, text_embs, ks)
