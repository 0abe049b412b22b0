"""Image preprocessing in numpy (host-side; device work stays in XLA).

Replicates the reference's implicit data contracts (SURVEY.md "Hard parts"):
- min-max normalize then mean/std (`Datasets/dataset_concepts.py:212-215`)
- grayscale (1-channel) vs RGB branching per encoder type
  (`data/dataset/image_classification_zs.py:65-75`)
- VinDr resize 1520x912, mean 0.3089279 / std 0.25053555 (`concept_vit/data_utils.py:120-122`)
- CLIP eval preprocessing: 224 bicubic resize + center crop + CLIP norm
  (`concept_vit/clip/clip.py:79-86`)

All outputs are HWC float32 (TPU-native NHWC once batched)."""
from __future__ import annotations

import numpy as np
from PIL import Image

VINDR_MEAN = 0.3089279
VINDR_STD = 0.25053555
VINDR_SIZE = (1520, 912)  # (H, W)

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], dtype=np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], dtype=np.float32)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def load_image(path: str, grayscale: bool) -> np.ndarray:
    """Read an image file to HWC float32 in [0, 1]."""
    with Image.open(path) as im:
        im = im.convert("L" if grayscale else "RGB")
        arr = np.asarray(im, dtype=np.float32) / 255.0
    if grayscale:
        arr = arr[..., None]
    return arr


def load_image_u8_resized(path: str, size_hw: tuple[int, int]) -> np.ndarray:
    """Read + resize a grayscale image staying in uint8 (cv2/albumentations-style:
    the reference resizes the uint8 image before float conversion). Output [H, W, 1]
    uint8 — the wire format for the device-side normalization fast path."""
    h, w = size_hw
    with Image.open(path) as im:
        im = im.convert("L")
        if im.size != (w, h):
            im = im.resize((w, h), Image.BILINEAR)
        arr = np.asarray(im, dtype=np.uint8)
    return arr[..., None]


def resize(arr: np.ndarray, size_hw: tuple[int, int], method: str = "bilinear") -> np.ndarray:
    """Resize HWC float array via PIL (bilinear for mammo pipeline, bicubic for CLIP)."""
    h, w = size_hw
    if arr.shape[:2] == (h, w):
        return arr
    resample = Image.BICUBIC if method == "bicubic" else Image.BILINEAR
    chans = []
    for c in range(arr.shape[2]):
        im = Image.fromarray(arr[..., c])
        chans.append(np.asarray(im.resize((w, h), resample), dtype=np.float32))
    return np.stack(chans, axis=-1)


def center_crop(arr: np.ndarray, size: int) -> np.ndarray:
    h, w = arr.shape[:2]
    top = max((h - size) // 2, 0)
    left = max((w - size) // 2, 0)
    return arr[top : top + size, left : left + size]


def minmax_meanstd(arr: np.ndarray, mean: float, std: float) -> np.ndarray:
    """The mammo normalization contract: scale to [0,1] by min-max, then standardize
    (`Datasets/dataset_concepts.py:212-215`)."""
    lo, hi = float(arr.min()), float(arr.max())
    if hi > lo:
        arr = (arr - lo) / (hi - lo)
    else:
        arr = np.zeros_like(arr)
    return (arr - mean) / std


def gray_resize_normalize(arr: np.ndarray, size_hw: tuple[int, int], mean: float,
                          std: float, prefer_native: bool = True) -> np.ndarray:
    """Fused grayscale resize + min-max + mean/std. Uses the native C++ path
    (mammodissect.native, cv2-style bilinear — the reference's albumentations/cv2
    semantics) when available, else PIL resize + numpy normalize."""
    if arr.shape[-1] != 1:
        arr = arr.mean(axis=-1, keepdims=True)
    if prefer_native:
        try:
            from mammodissect import native

            if native.available():
                return native.resize_normalize(arr, size_hw, mean, std)
        except Exception:
            pass
    return minmax_meanstd(resize(arr, size_hw), mean, std).astype(np.float32)


def vindr_preprocess(arr: np.ndarray, size_hw: tuple[int, int] = VINDR_SIZE) -> np.ndarray:
    """Full VinDr probe pipeline: resize to 1520x912 grayscale + minmax + mean/std."""
    if arr.shape[-1] != 1:
        arr = arr.mean(axis=-1, keepdims=True)
    arr = resize(arr, size_hw)
    return minmax_meanstd(arr, VINDR_MEAN, VINDR_STD).astype(np.float32)


def clip_preprocess(arr: np.ndarray, size: int = 224) -> np.ndarray:
    """OpenAI-CLIP eval pipeline: bicubic resize shorter side → center crop → CLIP norm."""
    if arr.shape[-1] == 1:
        arr = np.repeat(arr, 3, axis=-1)
    h, w = arr.shape[:2]
    scale = size / min(h, w)
    arr = resize(arr, (round(h * scale), round(w * scale)), method="bicubic")
    arr = center_crop(arr, size)
    return ((arr - CLIP_MEAN) / CLIP_STD).astype(np.float32)


def imagenet_preprocess(arr: np.ndarray, size: int = 224) -> np.ndarray:
    """torchvision-style eval pipeline: resize + center crop + ImageNet norm
    (`concept_vit/data_utils.py:106-113`)."""
    if arr.shape[-1] == 1:
        arr = np.repeat(arr, 3, axis=-1)
    h, w = arr.shape[:2]
    scale = 256 / min(h, w)
    arr = resize(arr, (round(h * scale), round(w * scale)))
    arr = center_crop(arr, size)
    return ((arr - IMAGENET_MEAN) / IMAGENET_STD).astype(np.float32)


# ------------------------------------------------------------------ train-time augment
def augment_train(
    arr: np.ndarray,
    rng: np.random.Generator,
    hflip: bool = True,
    vflip: bool = True,
    max_rotate_deg: float = 20.0,
    translate_frac: float = 0.1,
    scale_range: tuple[float, float] = (0.8, 1.2),
    p: float = 0.5,
) -> np.ndarray:
    """Train augmentation matching the reference's albumentations recipe envelope
    (HFlip+VFlip+Affine(20deg, 0.1 translate, [0.8,1.2] scale), `data/data_utils.py:25-67`).
    Implemented with PIL affine on the host; elastic deform omitted (augment, not contract)."""
    if hflip and rng.random() < 0.5:
        arr = arr[:, ::-1]
    if vflip and rng.random() < 0.5:
        arr = arr[::-1]
    if rng.random() < p:
        angle = rng.uniform(-max_rotate_deg, max_rotate_deg)
        tx = rng.uniform(-translate_frac, translate_frac) * arr.shape[1]
        ty = rng.uniform(-translate_frac, translate_frac) * arr.shape[0]
        scale = rng.uniform(*scale_range)
        chans = []
        for c in range(arr.shape[2]):
            im = Image.fromarray(arr[..., c])
            im = im.rotate(
                angle, resample=Image.BILINEAR, translate=(tx, ty), center=None, expand=False
            )
            if scale != 1.0:
                w, h = im.size
                im2 = im.resize((max(int(w * scale), 1), max(int(h * scale), 1)), Image.BILINEAR)
                canvas = Image.new("F", (w, h))
                canvas.paste(im2, ((w - im2.size[0]) // 2, (h - im2.size[1]) // 2))
                im = canvas
            chans.append(np.asarray(im, dtype=np.float32))
        arr = np.stack(chans, axis=-1)
    return np.ascontiguousarray(arr)
