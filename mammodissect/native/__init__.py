"""Native host-side preprocessing (C++ via ctypes).

Builds `fastimage.cpp` with g++ on first import (cached as _fastimage.so beside the
source); falls back cleanly to the PIL/numpy path in transforms.py when no compiler is
available. This is the framework's native data-loader component: the fused
resize+min-max+mean/std per-image hot path plus a threaded batch variant."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fastimage.cpp")
_SO = os.path.join(_HERE, "_fastimage.so")
_lock = threading.Lock()
_lib = None
_tried = False


_REQUIRED_SYMBOLS = ("fi_resize_normalize", "fi_batch_resize_normalize",
                     "fi_row_spans", "fi_pack_spans", "fi_batch_pack",
                     # ABI stamp: a .so carrying every name above but built
                     # from a source with DIFFERENT signatures (fi_batch_pack
                     # lost compute_spans without renaming) lacks this and is
                     # rejected before dlopen
                     "fi_abi_v2")


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             "-o", _SO, _SRC, "-lpthread"],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _so_has_symbols(path: str) -> bool:
    """True when every required export name appears in the .so's bytes.

    Checked BEFORE dlopen: an _fastimage.so built from an older fastimage.cpp
    can outrank the source on mtime (tree copied/extracted with fresh stamps)
    yet lack newer entry points — and rebuilding a path that is already
    dlopen'ed would truncate the live mapping, so staleness must be decided
    while the file is still unloaded. Export names live as plain strings in
    .dynsym/.dynstr, so a substring scan is a sufficient (and dependency-free)
    presence test."""
    try:
        with open(path, "rb") as f:
            blob = f.read()
    except OSError:
        return False
    return all(s.encode() in blob for s in _REQUIRED_SYMBOLS)


def get_lib():
    """The loaded ctypes library, or None when native is unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)
                or not _so_has_symbols(_SO)):
            if not _build() or not _so_has_symbols(_SO):
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        # _so_has_symbols makes a missing export unreachable in practice, but a
        # symbol lookup failure must degrade to the numpy path, never crash
        try:
            _bind(lib)
        except AttributeError:
            return None
        _lib = lib
        return _lib


def _bind(lib) -> None:
    """Declare argtypes for every required export (AttributeError on a stale .so)."""
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.fi_resize_normalize.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_float, ctypes.c_float,
    ]
    lib.fi_batch_resize_normalize.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float,
        ctypes.c_int,
    ]
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.fi_row_spans.argtypes = [
        u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i32p, i32p,
    ]
    lib.fi_pack_spans.argtypes = [
        u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i32p, i32p, u8p,
    ]
    lib.fi_pack_spans.restype = ctypes.c_int64
    lib.fi_batch_pack.argtypes = [
        u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        i32p, i32p, u8p, i64p, ctypes.c_int,
    ]


def available() -> bool:
    return get_lib() is not None


def resize_normalize(src: np.ndarray, size_hw, mean: float, std: float,
                     minmax: bool = True) -> np.ndarray:
    """Fused bilinear resize + (min-max) + mean/std for a [H, W] or [H, W, 1] float32
    image. Matches transforms.resize + transforms.minmax_meanstd semantics with
    min/max computed on the source image."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native fastimage unavailable")
    img = np.ascontiguousarray(np.squeeze(src, -1) if src.ndim == 3 else src,
                               dtype=np.float32)
    dh, dw = size_hw
    out = np.empty((dh, dw), np.float32)
    lib.fi_resize_normalize(img, img.shape[0], img.shape[1], out, dh, dw,
                            1 if minmax else 0, float(mean), float(std))
    return out[..., None]


def batch_resize_normalize(src: np.ndarray, size_hw, mean: float, std: float,
                           minmax: bool = True, n_threads: int | None = None) -> np.ndarray:
    """Threaded batch variant: [N, H, W] or [N, H, W, 1] float32 -> [N, dh, dw, 1]."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native fastimage unavailable")
    arr = np.ascontiguousarray(np.squeeze(src, -1) if src.ndim == 4 else src,
                               dtype=np.float32)
    n, sh, sw = arr.shape
    dh, dw = size_hw
    out = np.empty((n, dh, dw), np.float32)
    if n_threads is None:
        n_threads = min(os.cpu_count() or 4, 16)
    lib.fi_batch_resize_normalize(arr, n, sh, sw, out, dh, dw,
                                  1 if minmax else 0, float(mean), float(std), n_threads)
    return out[..., None]


def batch_row_spans(u8: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-row nonzero spans for a [B, H, W, C] uint8 batch via the native scan.

    Returns (start [B, H] int32, length [B, H] int32) — the batched equivalent
    of packing.row_spans (nonzero = any channel nonzero)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native fastimage unavailable")
    arr = np.ascontiguousarray(u8, dtype=np.uint8)
    b, h, w, c = arr.shape
    start = np.empty((b, h), np.int32)
    length = np.empty((b, h), np.int32)
    lib.fi_row_spans(arr.reshape(-1), b * h, w, c, start.reshape(-1),
                     length.reshape(-1))
    return start, length


def batch_pack(u8: np.ndarray, start: np.ndarray, length: np.ndarray,
               out: np.ndarray, out_offsets: np.ndarray,
               n_threads: "int | None" = None) -> None:
    """Pack each image's row spans into `out` at byte offset `out_offsets[i]`
    (one memcpy per row, threaded across images). Spans come from
    `batch_row_spans` or a probe's precomputed spans — they must be known up
    front because the offsets are their prefix sums."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native fastimage unavailable")
    arr = np.ascontiguousarray(u8, dtype=np.uint8)
    b, h, w, c = arr.shape
    start = np.ascontiguousarray(start, np.int32)
    length = np.ascontiguousarray(length, np.int32)
    offs = np.ascontiguousarray(out_offsets, np.int64)
    if n_threads is None:
        n_threads = min(os.cpu_count() or 2, 8)
    lib.fi_batch_pack(arr.reshape(-1), b, h, w, c, start.reshape(-1),
                      length.reshape(-1), out, offs, int(n_threads))
