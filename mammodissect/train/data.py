"""Classifier fine-tune datasets + samplers (L2 of the fine-tune path).

Replaces the reference's `MammoDataset` (`Datasets/dataset_concepts.py:168-227`: cv2
grayscale load, albumentations, min-max + mean/std, {'x','y','img_path'}) and
`get_dataloader_RSNA`'s samplers (`Datasets/dataset_utils.py:121-251`: shuffled /
WeightedRandom balanced; DistributedSampler sharding is unnecessary here — the pjit
trainer shards the global batch over the mesh itself)."""
from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

from mammodissect.data import transforms as T
from mammodissect.data.loader import HostBatch


@dataclass
class ClassifierDataset:
    """CSV-driven image+label dataset with the mammo normalization contract."""

    df: "pandas.DataFrame"
    image_col: str = "image_path"
    label_col: str = "cancer"
    root: str = ""
    size_hw: tuple = (1520, 912)
    mean: float = T.VINDR_MEAN
    std: float = T.VINDR_STD
    train: bool = False
    seed: int = 0
    # 'f32': host-normalized float batches (4 B/px wire). 'u8': post-transform
    # uint8 batches (1 B/px wire), normalized on device by the trainer
    # (Trainer(input_wire='u8', norm_mean=..., norm_std=...)) — the reference's
    # own contract keeps images uint8 through the transforms and normalizes at
    # tensor conversion, so this changes the wire, not the recipe.
    wire: str = "f32"

    def __post_init__(self):
        if self.wire not in ("f32", "u8"):
            raise ValueError(f"wire must be 'f32' or 'u8', got {self.wire!r}")
        self._rng = np.random.default_rng(self.seed)
        self.image_shape = (self.size_hw[0], self.size_hw[1], 1)

    def __len__(self):
        return len(self.df)

    def image(self, i: int) -> np.ndarray:
        import os

        path = os.path.join(self.root, str(self.df.iloc[i][self.image_col]))
        return T.load_for_wire(path, self.size_hw, self.mean, self.std,
                               self.train, self.wire, self._rng)

    def label(self, i: int):
        return self.df.iloc[i][self.label_col]


def resample_balanced(df, label_col: str, ratio: float = 1.0, seed: int = 0):
    """Per-class resampled DataFrame: minority class kept whole, majority downsampled
    to `ratio` x minority size (the CSAW `cancer_task_single_view_balanced_dataloader`
    capability, `Datasets/dataset_concepts.py:16-166`)."""
    rng = np.random.default_rng(seed)
    labels = df[label_col].astype(int)
    counts = labels.value_counts()
    minority = counts.idxmin()
    n_keep = int(counts.min() * ratio)
    parts = []
    for cls, grp in df.groupby(label_col, sort=False):
        if int(cls) == int(minority) or len(grp) <= n_keep:
            parts.append(grp)
        else:
            parts.append(grp.iloc[rng.permutation(len(grp))[:n_keep]])
    out = __import__("pandas").concat(parts)
    return out.iloc[rng.permutation(len(out))].reset_index(drop=True)


def class_balanced_weights(labels: np.ndarray, sampler_weights: Optional[dict] = None):
    """Per-sample weights: explicit class->weight map (reference
    `lumi_single_gpu_train_classifier.py:186-192`) or inverse-frequency."""
    labels = np.asarray(labels).astype(np.int64)
    if sampler_weights:
        return np.asarray([float(sampler_weights[int(l)]) for l in labels])
    counts = np.bincount(labels)
    return 1.0 / np.maximum(counts[labels], 1)


def iter_epoch(
    dataset,
    batch_size: int,
    shuffle: bool = False,
    seed: int = 0,
    balanced_weights: Optional[np.ndarray] = None,
    drop_last: bool = False,
    label_dtype=np.float32,
    host_index: int = 0,
    host_count: int = 1,
) -> Iterator[HostBatch]:
    """One epoch of padded static-shape batches. With `balanced_weights`, samples
    len(dataset) indices with replacement ∝ weights (WeightedRandomSampler parity,
    `dataset_utils.py:202-234`).

    host_index/host_count shard the epoch per process for multi-host DP
    (DistributedSampler parity, `dataset_utils.py:236-251`): every host builds the
    SAME seeded order, takes its contiguous wrap-padded slice (equal length on
    every host so the lockstep pjit steps line up), and yields the same number of
    batches. Eval reassembly = tiled allgather of the per-host predictions then
    trim to the true length (`parallel.multihost.gather_predictions`)."""
    n = len(dataset)
    rng = np.random.default_rng(seed)
    if balanced_weights is not None:
        p = balanced_weights / balanced_weights.sum()
        order = rng.choice(n, size=n, replace=True, p=p)
    elif shuffle:
        order = rng.permutation(n)
    else:
        order = np.arange(n)
    if host_count > 1:
        shard_len = -(-n // host_count)  # ceil: equal length, tail wraps
        order = np.resize(order, host_count * shard_len)
        order = order[host_index * shard_len : (host_index + 1) * shard_len]
        n = shard_len
    h, w, c = dataset.image_shape
    img_dtype = np.uint8 if getattr(dataset, "wire", "f32") == "u8" else np.float32
    for start in range(0, n, batch_size):
        idx = order[start : start + batch_size]
        if drop_last and len(idx) < batch_size:
            return
        n_valid = len(idx)
        if n_valid < batch_size:
            # wrap-pad the tail with REAL rows (torch yields a short batch; we
            # keep static shapes): zero-image padding fed fake all-black
            # "negatives" into BatchNorm statistics and—before the trainer's
            # n_valid loss mask—into the gradients themselves
            idx = np.resize(idx, batch_size)
        imgs = np.zeros((batch_size, h, w, c), img_dtype)
        labels = np.zeros((batch_size,), label_dtype)
        for j, i in enumerate(idx):
            imgs[j] = dataset.image(int(i))
            labels[j] = dataset.label(int(i))
        yield HostBatch(images=imgs, n_valid=n_valid, start=start, labels=labels)
