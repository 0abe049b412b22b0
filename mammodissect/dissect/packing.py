"""Lossless uint8 wire packing for the dissection harvest.

The measured harvest is >=98% wire on this environment's relay (docs/PERF.md r3:
put_s + sync_s = 98%+ of harvest wall), and the workload's probe images are
mammograms — 1520x912 grayscale with ~40-60% exactly-black background
(`concept_vit/data_utils.py:120-122`; the breast occupies one side of the frame).
Raw uint8 already crosses at 1.39 MB/image; the only remaining lever on the wire
is to NOT send the zeros.

Scheme (lossless, shape-static, XLA-friendly):
  host   per image, per ROW: the [first, last] span of nonzero pixels
         (start[H], length[H] int32). The spans' bytes are packed contiguously,
         batch-row-major, into ONE flat uint8 buffer; per-row metadata is
         [B, H, 2] int32 (start, length) — ~0.9% of a full frame.
  device inside the jit, reconstruct the [B, H, W, C] canvas with one gather:
         row offsets = cumsum(length * C) (matches the host packing order by
         construction), idx = rowoff + (x - start) * C + c, pixels outside the
         span are exactly zero — bit-identical to the original image, so the
         downstream min-max + mean/std normalization and the conv tower see the
         same bytes and the >=99% top-concept agreement contract is untouched.

Row spans beat a bounding-box crop on this content: an MLO-view breast is a
diagonal half-ellipse, so per-row spans track the curve (~fill-fraction bytes)
while a bbox pays the full rectangle (~1.27x the ellipse area).

The flat buffer's length is rounded up to a bucket (multiples of
`quantum` = full_bytes/16 by default) so the compiled step program has a static
input shape and at most 16 variants exist; a stable probe hits 1-2. Padding
bytes are wasted wire (<= 1/16 of a full frame per batch) — still far below the
40-60% saved.

The scheme degrades gracefully: an image with no zero background packs to the
full frame (bucket = cap), costing only the metadata. `sample_pack_fraction`
lets callers auto-disable packing for dense probes.

Under a device mesh the payload is packed PER DATA SHARD (`pack_batch_groups`):
group g holds the contiguous batch rows a `P('data')` sharding assigns to shard
g, each group packs into its own flat buffer, and the wire tensor is
[n_shards, L] sharded P('data', None) — so each chip receives ONLY its own
shard's packed bytes (a replicated flat payload would make every chip pay the
whole batch's wire, erasing packing's per-chip win on real multi-chip hosts).
The unpack runs per shard (`shard_map` in the model step; `unpack_canvas_groups`
is the mesh-free equivalent), entirely local — no collectives.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def row_spans(img_u8: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-row [first, last] nonzero span of one [H, W, C] uint8 image.

    Returns (start[H] int32, length[H] int32); all-zero rows get length 0."""
    nz = img_u8.any(axis=-1) if img_u8.ndim == 3 else img_u8 != 0  # [H, W]
    any_row = nz.any(axis=1)
    first = nz.argmax(axis=1).astype(np.int32)
    last = (nz.shape[1] - 1 - nz[:, ::-1].argmax(axis=1)).astype(np.int32)
    start = np.where(any_row, first, 0).astype(np.int32)
    length = np.where(any_row, last - first + 1, 0).astype(np.int32)
    return start, length


def packed_nbytes(meta: np.ndarray, channels: int) -> int:
    """Exact packed payload size for span metadata [..., H, 2]."""
    return int(meta[..., 1].astype(np.int64).sum()) * channels


def pack_image(img_u8: np.ndarray, start: np.ndarray, length: np.ndarray) -> np.ndarray:
    """Pack one [H, W, C] image's row spans into a flat row-major uint8 vector."""
    h, w = img_u8.shape[:2]
    x = np.arange(w, dtype=np.int32)
    keep = (x[None, :] >= start[:, None]) & (x[None, :] < (start + length)[:, None])
    return img_u8[keep].reshape(-1)  # [sum(length) * C]


def _native_lib_ok() -> bool:
    try:
        from mammodissect import native as fastimage

        return fastimage.available()
    except Exception:
        return False


def _spans_meta(u8: np.ndarray, spans, use_native: bool) -> np.ndarray:
    """[B, H, 2] int32 (start, length) metadata from precomputed per-image span
    tuples, the native batched row scan, or the numpy fallback."""
    b, h = u8.shape[0], u8.shape[1]
    meta = np.empty((b, h, 2), np.int32)
    if spans is not None:
        for i in range(b):
            start, length = spans[i]
            meta[i, :, 0] = start
            meta[i, :, 1] = length
        return meta
    if use_native:
        from mammodissect import native as fastimage

        start, length = fastimage.batch_row_spans(u8)
        meta[:, :, 0] = start
        meta[:, :, 1] = length
        return meta
    for i in range(b):
        start, length = row_spans(u8[i])
        meta[i, :, 0] = start
        meta[i, :, 1] = length
    return meta


def pack_batch(u8: np.ndarray, spans=None, native=None) -> Tuple[np.ndarray, np.ndarray]:
    """Pack a [B, H, W, C] uint8 batch.

    spans: optional per-image precomputed (start, length) tuples (e.g. a cyclic
    bench pool computes them once per pool image).
    native: None = auto (use the C++ packer when built), False forces the numpy
    path (the parity oracle in tests).

    The native path matters: numpy packs via a full-frame boolean mask + fancy
    index (~4 passes over the batch — measured ~0.9 s/batch at the canonical
    64x1520x912 geometry on a 1-vCPU host, the dominant non-wire term of the r5
    full-scale harvest); the C++ path is one span scan + one memcpy per row.

    Returns (flat uint8 [L_exact], meta int32 [B, H, 2])."""
    b, h = u8.shape[0], u8.shape[1]
    c = u8.shape[3]
    use_native = _native_lib_ok() if native is None else bool(native) and _native_lib_ok()
    meta = _spans_meta(u8, spans, use_native)
    img_bytes = meta[:, :, 1].astype(np.int64).sum(axis=1) * c  # [B]
    offs = np.zeros(b, np.int64)
    if b > 1:
        offs[1:] = np.cumsum(img_bytes[:-1])
    flat = np.empty(int(img_bytes.sum()), np.uint8)
    if use_native:
        from mammodissect import native as fastimage

        fastimage.batch_pack(u8, meta[:, :, 0], meta[:, :, 1], flat, offs)
    else:
        for i in range(b):
            p = pack_image(u8[i], meta[i, :, 0], meta[i, :, 1])
            flat[offs[i]:offs[i] + p.shape[0]] = p
    return flat, meta


def pack_batch_groups(u8: np.ndarray, n_groups: int, spans=None, native=None):
    """Pack a [B, H, W, C] batch as `n_groups` contiguous shard groups.

    Group g covers batch rows [g*B/n, (g+1)*B/n) — exactly the rows a
    `P('data')` sharding over an n-way data axis assigns to shard g, so stacking
    the (bucket-padded) group buffers into [n_groups, L] and sharding axis 0 by
    'data' sends each device only its own images' bytes.

    Returns (list of n_groups flat uint8 arrays (exact, unpadded), meta [B, H, 2])."""
    b = u8.shape[0]
    if b % n_groups:
        raise ValueError(f"batch {b} not divisible by {n_groups} shard groups")
    bs = b // n_groups
    flats, metas = [], []
    for g in range(n_groups):
        sl = slice(g * bs, (g + 1) * bs)
        f, m = pack_batch(u8[sl], spans=spans[sl] if spans is not None else None,
                          native=native)
        flats.append(f)
        metas.append(m)
    return flats, np.concatenate(metas, axis=0)


def pack_batch_groups_padded(u8: np.ndarray, n_groups: int, spans=None,
                             quantum: int = 1, cap: Optional[int] = None,
                             fixed_len: Optional[int] = None, native=None):
    """One-shot padded wire assembly: pack a [B, H, W, C] batch per shard group
    DIRECTLY into the [n_groups, bucket] uint8 wire tensor.

    Equivalent to `pack_batch_groups` + `bucket_len` + `pad_flat` + `np.stack`
    (the prefetch thread's previous recipe) but with one allocation and one copy
    of each span: per-image destination offsets are prefix sums of the span
    metadata, so the (native, threaded) row memcpys land in their final padded
    positions — no intermediate exact-size buffers, no restack.

    Bucket choice matches the prefetcher's contract: `fixed_len` when every
    group fits it (the single-compile envelope), else the `quantum` rounding
    capped at `cap` (both PER-SHARD byte sizes).

    Returns (flat2d [n_groups, bucket] uint8, meta [B, H, 2] int32, bucket)."""
    b, h = u8.shape[0], u8.shape[1]
    c = u8.shape[3]
    if b % n_groups:
        raise ValueError(f"batch {b} not divisible by {n_groups} shard groups")
    bs = b // n_groups
    use_native = _native_lib_ok() if native is None else bool(native) and _native_lib_ok()
    meta = _spans_meta(u8, spans, use_native)
    img_bytes = meta[:, :, 1].astype(np.int64).sum(axis=1) * c  # [B]
    grp = img_bytes.reshape(n_groups, bs)
    max_exact = int(grp.sum(axis=1).max()) if b else 0
    if fixed_len is not None and max_exact <= fixed_len:
        bucket = int(fixed_len)
    else:
        bucket = bucket_len(max_exact, quantum,
                            cap if cap is not None else max(max_exact, 1))
    flat2d = np.zeros((n_groups, bucket), np.uint8)
    # exclusive prefix sums within each group, shifted to the group's wire row
    excl = np.cumsum(grp, axis=1) - grp
    offs = (np.arange(n_groups, dtype=np.int64)[:, None] * bucket + excl).reshape(-1)
    if use_native:
        from mammodissect import native as fastimage

        fastimage.batch_pack(u8, meta[:, :, 0], meta[:, :, 1],
                             flat2d.reshape(-1), offs)
    else:
        flat1 = flat2d.reshape(-1)
        for i in range(b):
            p = pack_image(u8[i], meta[i, :, 0], meta[i, :, 1])
            flat1[offs[i]:offs[i] + p.shape[0]] = p
    return flat2d, meta, bucket


def bucket_len(n_exact: int, quantum: int, cap: int) -> int:
    """Static-shape bucket for a flat payload: round up to a `quantum` multiple,
    never above `cap` (= the raw full-frame batch size — packing can't lose)."""
    q = max(int(quantum), 1)
    return int(min(max(((n_exact + q - 1) // q) * q, q), cap))


def pad_flat(flat: np.ndarray, n_bucket: int) -> np.ndarray:
    out = np.zeros((n_bucket,), np.uint8)
    out[: flat.shape[0]] = flat
    return out


def sample_pack_fraction(probe, k: int = 16) -> float:
    """Estimate packed-wire fraction (payload + metadata vs raw) from up to k
    sampled probe images. ~1.0 for dense images, ~fill-fraction for mammograms.

    Probes that already know their exact spans (e.g. `exact_pack_fraction()`)
    short-circuit the sample. The k=16 sample is drawn by a SEEDED PRNG without
    replacement — deterministic for a given probe length, and immune to the
    stride aliasing an even-spaced sample suffers on a MIXED-density probe (the
    reference `combined` probe interleaves dense ImageNet and sparse mammo
    content; an even stride can land every sample in one population and flip the
    auto decision on content order — VERDICT r4 weak #4; the k=4 even-spaced
    default this replaces did exactly that in the regression test)."""
    exact = getattr(probe, "exact_pack_fraction", None)
    if callable(exact):
        f = exact()
        if f is not None:
            return float(f)
    n = len(probe)
    if n == 0:
        return 1.0
    h, w, c = probe.image_shape
    idxs = sorted(np.random.default_rng(0).choice(n, size=min(k, n), replace=False))
    raw = h * w * c
    fracs = []
    for i in idxs:
        img = probe.image_u8(i)
        _, length = probe.image_spans(i) if hasattr(probe, "image_spans") \
            else row_spans(img)
        fracs.append((int(length.sum()) * c + h * 2 * 4) / raw)
    return float(np.mean(fracs))


def unpack_canvas(flat_u8, meta, shape):
    """Device-side reconstruction (call INSIDE a jit): rebuild the [B, H, W, C]
    uint8 canvas from the packed buffer, bit-identical to the original.

    Formulation matters enormously on TPU: an elementwise `take` with computed
    [B,H,W,C] indices runs through the scalar gather path (measured 1.23 s/batch
    at the canonical 64x1520x912 geometry — 3.4x slower than the whole B5
    forward). Instead, every canvas row is ONE fixed-size dynamic_slice of the
    flat buffer at offset rowoff - start*C (the bytes left of the span are the
    previous row's tail — garbage that the span mask zeroes anyway), so the whole
    unpack is a single slice-granular gather of B*H contiguous W*C-byte rows plus
    one vectorized mask — the pattern XLA lowers to efficient block copies.

    flat_u8: [L] uint8 (bucket-padded), meta: [B, H, 2] int32 (start, length)."""
    import jax
    import jax.numpy as jnp

    b, h, w, c = shape
    wc = w * c
    start = meta[..., 0]  # [B, H]
    length = meta[..., 1]
    row_bytes = (length * c).reshape(-1)  # [B*H], batch-row-major = host pack order
    rowoff = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(row_bytes)[:-1].astype(jnp.int32)]
    )
    # front/back zero aprons keep every row's slice in bounds (first row with
    # start > 0 reaches left of offset 0; dynamic_slice clamps the far end)
    apron = jnp.zeros((wc,), flat_u8.dtype)
    flat_p = jnp.concatenate([apron, flat_u8, apron])
    offs = rowoff - start.reshape(-1) * c + wc  # [B*H]
    rows = jax.vmap(lambda o: jax.lax.dynamic_slice(flat_p, (o,), (wc,)))(offs)
    rows = rows.reshape(b, h, w, c)
    x = jnp.arange(w, dtype=jnp.int32)[None, None, :]  # [1, 1, W]
    inside = (x >= start[:, :, None]) & (x < (start + length)[:, :, None])  # [B,H,W]
    return jnp.where(inside[..., None], rows, jnp.uint8(0))


def unpack_canvas_groups(flat2d, meta, shape):
    """Device-side reconstruction of a per-shard-group packed batch (the
    `pack_batch_groups` wire format): flat2d [D, L] uint8, meta [B, H, 2] i32,
    B = D * Bs. Each group's row offsets are a cumsum over ITS OWN rows only
    (groups pack independently), so the unpack vmaps `unpack_canvas` over the
    group axis. Mesh-free equivalent of the model step's shard_map unpack —
    used single-device (D=1) and in tests."""
    import jax

    d = flat2d.shape[0]
    b, h, w, c = shape
    meta_g = meta.reshape(d, b // d, h, 2)
    out = jax.vmap(lambda f, m: unpack_canvas(f, m, (b // d, h, w, c)))(flat2d, meta_g)
    return out.reshape(shape)
