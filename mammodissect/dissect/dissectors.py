"""Dissector adapters: vision–language models that embed probe images and concept texts.

The reference's dissectors are BreastClip (`concept_vit/utils.py:434-454`) and OpenAI CLIP
(`og_utils.py:392`). A dissector exposes:
  embed_images(images_nhwc [B,H,W,C]) -> [B, D] L2-normalized float32
  embed_texts(list[str])              -> [C, D] L2-normalized float32
"""
from __future__ import annotations

import hashlib
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mammodissect.utils.registry import Registry

DISSECTORS: Registry = Registry("dissector")


def _l2n(x, axis=-1):
    return x / np.clip(np.linalg.norm(x, axis=axis, keepdims=True), 1e-12, None)


@DISSECTORS.register("random")
class RandomDissector:
    """Deterministic random-projection dissector for tests/benchmarks: images are
    average-pooled to a fixed grid then projected by a seed-fixed random matrix; each
    concept text maps to a hash-seeded random unit vector. No semantics, but fully
    deterministic — exercises every pipeline stage with real shapes."""

    def __init__(self, dim: int = 512, grid: int = 8, seed: int = 0, **_):
        self.dim = dim
        self.grid = grid
        self.seed = seed
        self._proj = None

        @jax.jit
        def _pool(images):
            b, h, w, c = images.shape
            g = self.grid
            # crop to a multiple of the grid, then average-pool each cell
            hh, ww = (h // g) * g, (w // g) * g
            x = images[:, :hh, :ww, :]
            x = x.reshape(b, g, hh // g, g, ww // g, c).mean(axis=(2, 4))
            return x.reshape(b, g * g * c)

        self._pool = _pool

    def embed_images(self, images: np.ndarray) -> np.ndarray:
        pooled = np.asarray(self._pool(jnp.asarray(images)), dtype=np.float32)
        if self._proj is None or self._proj.shape[0] != pooled.shape[1]:
            rng = np.random.default_rng(self.seed)
            self._proj = rng.normal(size=(pooled.shape[1], self.dim)).astype(np.float32)
        return _l2n(pooled @ self._proj)

    def embed_texts(self, texts: Sequence[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        for i, t in enumerate(texts):
            h = int.from_bytes(hashlib.sha256(t.encode()).digest()[:8], "little")
            out[i] = np.random.default_rng(h).normal(size=self.dim)
        return _l2n(out)


def get_dissector(name: str, **kw):
    """'breastclip' and 'clip' adapters are registered by their model modules on import."""
    if name not in DISSECTORS:
        # lazy-import model-backed dissectors to avoid heavy imports for the simple paths
        if name.startswith("breastclip"):
            import mammodissect.models.breastclip  # noqa: F401  (registers)
        elif name.lower().startswith(("vit-", "rn", "clip")):
            import mammodissect.models.clip_vit  # noqa: F401  (registers)
    return DISSECTORS.get(name)(**kw)
