"""Dissection engine: harvest → cache → score (reference `concept_vit/utils.py`).

Pipeline stages (same disk-staged design as the reference — SURVEY.md §7 move 2):
  1. harvest per-layer pooled activations of the target over D_probe     -> .npy cache
  2. embed D_probe with the dissector's image tower                      -> .npy cache
  3. embed the concept set with the dissector's text tower               -> .npy cache
  4. clip_feats = img_feats @ text_feats.T ; similarity_fn -> [U, C]    (fp32, jitted)

Cache naming parity (`get_save_names`, `concept_vit/utils.py:54-62`):
  {save_dir}/{d_probe}_{target_name}_{layer}{pool_suffix}.npy
  {save_dir}/{d_probe}_{clip_name}.npy
  {save_dir}/{concept_set_stem}_{clip_name}.npy
with skip-if-exists memoization (`_all_saved`, `utils.py:648-657`) so interrupted runs
resume for free."""
from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional, Sequence

import numpy as np

from mammodissect.data.loader import iter_batches
from mammodissect.data.probes import get_probe
from mammodissect.dissect.capture import canonical_layer_name
from mammodissect.dissect.dissectors import get_dissector
from mammodissect.dissect.targets import get_target_model
from mammodissect.dissect.results import write_results
from mammodissect.ops.pooling import PM_SUFFIX
from mammodissect.ops.similarity import get_similarity_fn
from mammodissect.parallel.mesh import auto_data_mesh, data_parallel_size


def _attach_mesh(obj, mesh):
    """Give a target/dissector the engine's data mesh unless it already has one.

    Multi-chip DP harvest: per-device probe shards, replicated params, one SPMD
    program over Mesh('data') — mirrors the reference's DistributedSampler +
    prediction gather (`Classifiers/experiments.py:554-564`) on the dissection side."""
    if mesh is not None and hasattr(obj, "set_mesh") and getattr(obj, "mesh", None) is None:
        obj.set_mesh(mesh)
    return obj


def _atomic_write(path: str, writer) -> None:
    """Write-to-temp + os.replace (the single atomic-write primitive for every
    cache file). Two protections: a crash mid-write cannot leave a torn file
    behind a skip-if-exists check, and concurrent same-path writers — every
    process of a multi-host run saves the identical allgathered arrays to a
    shared activation_dir — each land a complete file instead of truncating one
    another. The temp suffix must be unique ACROSS HOSTS (PIDs collide between
    hosts sharing one activation_dir), so it includes a random token; a failed
    write unlinks its temp file instead of orphaning it in the cache dir."""
    import contextlib
    import uuid

    tmp = f"{path}.tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
    try:
        with open(tmp, "wb") as f:  # file handle: np.save must not append .npy
            writer(f)
        os.replace(tmp, path)
    except BaseException:
        with contextlib.suppress(FileNotFoundError):
            os.remove(tmp)
        raise


def _atomic_np_save(path: str, arr) -> None:
    _atomic_write(path, lambda f: np.save(f, arr))


def _round_batch(batch_size: int, mesh) -> int:
    """Round batch_size up to a multiple of the data-axis size (batches are padded to
    the full batch size already, so sharding only needs divisibility)."""
    d = data_parallel_size(mesh)
    return ((batch_size + d - 1) // d) * d


def get_save_names(clip_name: str, target_name: str, target_layer: str, d_probe: str,
                   concept_set: str, pool_mode: str, save_dir: str, prefix: str = ""):
    """Cache-file naming, same scheme as the reference (`utils.py:54-62`) plus the
    experiment prefix the drivers prepend (`describe_broad_neurons.py:90-92`)."""
    layer = canonical_layer_name(target_layer)
    suffix = PM_SUFFIX[pool_mode]
    # probe specs may embed paths ("folder:/data/probe"); flatten for filenames
    d_probe = d_probe.replace("/", "_").replace(":", "_")
    target = f"{save_dir}/{prefix}{d_probe}_{target_name}_{layer}{suffix}.npy"
    clip = f"{save_dir}/{prefix}{d_probe}_{clip_name.replace('/', '')}.npy"
    stem = os.path.splitext(os.path.basename(concept_set))[0]
    text = f"{save_dir}/{prefix}{stem}_{clip_name.replace('/', '')}.npy"
    return target, clip, text


def _all_saved(paths: Sequence[str]) -> bool:
    return all(os.path.exists(p) for p in paths)


@dataclass
class DissectConfig:
    """Flag surface of `describe_broad_neurons.py:15-49`, typed."""

    target_model: str = "tiny_cnn"
    target_layers: List[str] = field(default_factory=lambda: ["blocks.0"])
    d_probe: str = "synthetic"
    concept_set: str = ""
    clip_model: str = "random"
    batch_size: int = 200
    pool_mode: str = "avg"
    similarity_fn: str = "soft_wpmi"
    top_k: int = 100
    activation_dir: str = "saved_activations"
    result_dir: str = "results"
    save_prefix: str = ""
    num_top_concepts: int = 10  # top-10 concepts/neuron (`describe_broad_neurons.py:101`)
    num_top_images: int = 5  # top-5 activating images (`describe_broad_neurons.py:102`)
    breast_clip_ckpt: Optional[str] = None
    finetuned_ckpt: Optional[str] = None
    num_class: int = 1
    probe_kwargs: dict = field(default_factory=dict)
    target_kwargs: dict = field(default_factory=dict)
    dissector_kwargs: dict = field(default_factory=dict)
    # device-resident fused M-dissect: activations+embeddings accumulate on device
    # (sharded over Mesh('data') when >1 device) and scoring runs there too; only
    # CSV-sized results cross the wire. Completed chunks spill to the activation
    # cache so interrupted runs resume at batch granularity. Falls back to the
    # staged path when the target isn't the dissector's own image tower.
    resident: bool = False
    # wall-clock budget (seconds) for a resident run: the harvest stops at the next
    # batch boundary once exceeded and the CSV covers the images harvested so far;
    # a rerun resumes from the spilled chunks and completes. None = unbounded.
    deadline_s: Optional[float] = None
    # results naming: "generated" uses the systematic broad-driver stem
    # (results.result_basename); "og" reproduces describe_og_neurons.py's own
    # hardcoded CSV/args name matrix exactly (results.og_result_basename)
    naming: str = "generated"
    # lossless wire packing for the resident harvest (dissect/packing.py): "auto"
    # samples the probe and packs when the packed fraction is <= 0.85 (mammograms
    # are ~40-60% exactly-black background), "on"/"off" force it. Reconstruction is
    # bit-identical, so results are unchanged; only the host->device bytes shrink.
    wire_pack: str = "auto"


def save_activations(cfg: DissectConfig, probe=None, target=None, dissector=None,
                     log=print) -> Dict[str, str]:
    """Stage 1–3: populate the activation/feature cache. Returns {kind: path}.

    Mirrors `utils.save_activations` (`concept_vit/utils.py:430-564`) without the
    per-probe-family special cases: every probe speaks the uniform Batch contract."""
    os.makedirs(cfg.activation_dir, exist_ok=True)
    probe = probe or get_probe(cfg.d_probe, **cfg.probe_kwargs)
    layers = [canonical_layer_name(l) for l in cfg.target_layers]
    mesh = auto_data_mesh()  # engine auto-uses all local devices (DP over the probe)
    bs = _round_batch(cfg.batch_size, mesh)

    paths: Dict[str, str] = {}
    target_paths = {}
    for layer in layers:
        t, c, x = get_save_names(cfg.clip_model, cfg.target_model, layer, cfg.d_probe,
                                 cfg.concept_set, cfg.pool_mode, cfg.activation_dir,
                                 cfg.save_prefix)
        target_paths[layer] = t
        paths["clip"] = c
        paths["text"] = x
    paths.update({f"target:{k}": v for k, v in target_paths.items()})

    # ---- fused M-dissect fast path: target IS the dissector's image tower ----
    # (`describe_broad_neurons.py` dissecting the same BreastClip's `_blocks`): one
    # forward per batch produces activations AND probe embeddings — half the compute
    # and half the host->device traffic of the two separate stages.
    missing_layers = [l for l in layers if not os.path.exists(target_paths[l])]
    clip_missing = not os.path.exists(paths["clip"])
    # exact-match gate: "breastclip_swin"/"breastclip_classifier" targets capture
    # different layer keys than the CNN dissector tower, and target_kwargs would be
    # silently dropped by this path — both must fall through to the staged harvest
    import jax as _jax

    if (
        (missing_layers or clip_missing)
        and cfg.target_model == "breastclip"
        and cfg.clip_model == "breastclip"
        and not cfg.target_kwargs
        and not cfg.finetuned_ckpt
        and target is None
        and hasattr(probe, "image_u8")
        and hasattr(probe, "mean")
        # _fused_harvest_embed has no multi-host gather; the staged harvest below
        # handles real multi-host (global-mesh u8 dispatch + allgather-and-trim)
        and _jax.process_count() == 1
    ):
        try:
            probe.image_u8(0)
            can_fuse = True
        except Exception:
            can_fuse = False
        if can_fuse:
            dk = dict(cfg.dissector_kwargs)
            dk.setdefault("ckpt_path", cfg.breast_clip_ckpt)
            dissector = _attach_mesh(dissector or get_dissector(cfg.clip_model, **dk), mesh)
            if hasattr(dissector, "harvest_and_embed_u8_dispatch"):
                t0 = time.time()
                acc, embs, n_images = _fused_harvest_embed(
                    dissector, probe, layers, cfg.pool_mode, bs)
                for l in layers:
                    _atomic_np_save(target_paths[l], acc[l])
                _atomic_np_save(paths["clip"], embs)
                missing_layers, clip_missing = [], False
                log(f"[fused] harvested {len(layers)} layers + embedded {n_images} "
                    f"images in one pass, {time.time()-t0:.1f}s")

    # ---- stage 1: target activation harvest (one jitted forward for ALL layers) ----
    if missing_layers:
        target = _attach_mesh(
            target
            or get_target_model(
                cfg.target_model,
                ckpt_path=cfg.breast_clip_ckpt,
                finetuned_ckpt=cfg.finetuned_ckpt,
                num_class=cfg.num_class,
                **cfg.target_kwargs,
            ),
            mesh,
        )
        t0 = time.time()
        acc, n_images = harvest_probe(target, probe, layers, cfg.pool_mode, bs)
        for l in layers:
            _atomic_np_save(target_paths[l], acc[l])
        log(f"[harvest] {n_images} images x {len(layers)} layers in {time.time()-t0:.1f}s")
    else:
        log("[harvest] all target activations cached, skipping")

    def _make_dissector():
        dk = dict(cfg.dissector_kwargs)
        if cfg.clip_model.startswith("breastclip"):
            # the dissector loads the same Mammo-CLIP checkpoint (`utils.py:451-454`)
            dk.setdefault("ckpt_path", cfg.breast_clip_ckpt)
        return _attach_mesh(get_dissector(cfg.clip_model, **dk), mesh)

    # ---- stage 2: dissector image features ----
    if clip_missing and not os.path.exists(paths["clip"]):
        dissector = dissector or _make_dissector()
        t0 = time.time()
        feats = []
        use_u8 = hasattr(dissector, "embed_images_u8") and hasattr(probe, "image_u8")
        if use_u8:
            try:
                probe.image_u8(0)
            except Exception:
                use_u8 = False
        n = len(probe)
        h, w_, c = probe.image_shape
        for start in range(0, n, bs):
            stop = min(start + bs, n)
            if use_u8:
                u8 = np.zeros((bs, h, w_, c), np.uint8)
                for j, i in enumerate(range(start, stop)):
                    u8[j] = probe.image_u8(i)
                feats.append(dissector.embed_images_u8(
                    u8, probe.mean, probe.std)[: stop - start])
            else:
                imgs = np.zeros((bs, h, w_, c), np.float32)
                for j, i in enumerate(range(start, stop)):
                    imgs[j] = probe.image(i)
                feats.append(dissector.embed_images(imgs)[: stop - start])
        _atomic_np_save(paths["clip"], np.concatenate(feats, axis=0))
        log(f"[clip-img] embedded D_probe in {time.time()-t0:.1f}s"
            + (" (u8 fast path)" if use_u8 else ""))

    # ---- stage 3: concept text features ----
    if not os.path.exists(paths["text"]):
        dissector = dissector or _make_dissector()
        words = read_concepts(cfg.concept_set)
        _atomic_np_save(paths["text"], dissector.embed_texts(words))
        log(f"[clip-txt] embedded {len(words)} concepts")
    return paths


def _prefetch(assemble, n: int, batch_size: int, start: int, depth: int = 2):
    """Shared producer-thread scaffolding for batch prefetchers:
    `assemble(start_, stop) -> item` builds one batch on a background thread so
    host-side work (image decode+resize, span packing) overlaps the previous
    batch's device work — the TPU-side analogue of DataLoader workers. Producer
    exceptions surface in the consumer."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)

    def producer():
        try:
            for start_ in range(start, n, batch_size):
                q.put(assemble(start_, min(start_ + batch_size, n)))
        except Exception as e:  # surface loader errors to the consumer
            q.put(e)
            return
        q.put(None)

    threading.Thread(target=producer, daemon=True).start()
    while True:
        item = q.get()
        if item is None:
            return
        if isinstance(item, Exception):
            raise item
        yield item


def _prefetch_u8_batches(probe, batch_size: int, depth: int = 2, start: int = 0):
    """Background-thread u8 batch assembly (`_prefetch`). `start` skips
    already-harvested images (chunk-level resume)."""
    h, w_, c = probe.image_shape

    def assemble(start_, stop):
        u8 = np.zeros((batch_size, h, w_, c), np.uint8)
        for j, i in enumerate(range(start_, stop)):
            u8[j] = probe.image_u8(i)
        return u8, stop - start_

    yield from _prefetch(assemble, len(probe), batch_size, start, depth)


def harvest_probe(target, probe, layers, pool_mode: str, batch_size: int,
                  pipeline_depth: int = 2):
    """Harvest pooled activations of `layers` over the whole probe.

    Fast path (probe exposes uint8 images + target supports on-device normalization):
    uint8 wire format (4x less host->device traffic) and a `pipeline_depth`-deep
    dispatch queue overlapping upload/compute/fetch — the TPU-native analogue of the
    reference's DataLoader-worker overlap. Falls back to the float32 per-batch path.

    With >1 local device the batch axis is sharded over a data mesh (attached to the
    target here if the caller didn't already) and batch_size rounds up to a multiple
    of the device count.

    Real multi-host runs (jax.process_count() > 1 with a host-spanning mesh): the
    probe auto-wraps in a per-process HostShardedProbe, every process dispatches its
    local slice of each global batch (`make_array_from_process_local_data` in
    `_put_batch`), and the fetched activations are process-allgathered then trimmed
    to the true probe length — the DistributedSampler + all_gather-and-trim shape of
    the reference (`experiments.py:554-564`).

    Returns ({layer: [N, C] float32}, n_images)."""
    import warnings
    from collections import deque

    import jax

    from mammodissect.parallel.mesh import global_data_mesh, mesh_spans_processes

    n_procs = jax.process_count()
    if n_procs > 1:
        from mammodissect.data.probes import HostShardedProbe

        if not isinstance(probe, HostShardedProbe):
            probe = HostShardedProbe(probe)
        # the true probe length, not the per-host shard length, is what the gathered
        # result trims to — a pre-wrapped probe must not truncate the global harvest
        n_total = len(probe.base)
    else:
        n_total = len(probe)

    use_u8 = (
        hasattr(target, "harvest_u8_dispatch")
        and hasattr(probe, "image_u8")
        and hasattr(probe, "mean")
    )
    if use_u8:
        try:
            probe.image_u8(0)
        except Exception:
            use_u8 = False

    # Mesh choice depends on the path (verified against a REAL 2-process run):
    #  * u8 dispatch builds GLOBAL-batch programs — each process contributes its
    #    local slice via make_array_from_process_local_data, which requires a mesh
    #    spanning every process. A local-only mesh crashes with a half-sized input.
    #  * the f32 fallback computes LOCAL results then process-allgathers — its
    #    per-host device_put needs a LOCAL mesh.
    if hasattr(target, "set_mesh"):
        mesh = getattr(target, "mesh", None)
        want_global = n_procs > 1 and use_u8
        if want_global and not mesh_spans_processes(mesh):
            if mesh is not None:
                warnings.warn(
                    "multi-host u8 harvest needs a process-spanning mesh; replacing "
                    "the target's local mesh with the global data mesh")
            target.set_mesh(global_data_mesh())
        elif not want_global and mesh is None:
            _attach_mesh(target, auto_data_mesh())
        elif n_procs > 1 and not use_u8 and mesh is not None \
                and mesh_spans_processes(mesh):
            warnings.warn(
                "multi-host f32-fallback harvest computes per-host results; "
                "replacing the target's global mesh with the local data mesh")
            target.set_mesh(auto_data_mesh())
    mesh_now = getattr(target, "mesh", None)
    if n_procs > 1 and use_u8:
        # global-batch program: round the GLOBAL batch against the global mesh
        # (a multiple of n_procs * local devices), then take the local slice —
        # the division is exact by construction
        batch_size = max(_round_batch(batch_size, mesh_now) // n_procs, 1)
    elif n_procs > 1:
        # per-host local programs: divide FIRST, then round against the local
        # mesh — rounding the global batch and then dividing can leave a local
        # batch that violates the local data-axis divisibility (e.g. 2 procs x
        # 2 local devices, batch 6: round(6)=6, 6//2=3, and 3 rows cannot shard
        # over 2 devices)
        batch_size = _round_batch(max(batch_size // n_procs, 1), mesh_now)
    else:
        batch_size = _round_batch(batch_size, mesh_now)
    acc: Dict[str, list] = {l: [] for l in layers}
    n_images = 0

    if not use_u8:
        for batch in iter_batches(probe, batch_size):
            captured = target.harvest(batch.images, layers, pool_mode)
            for l in captured:
                acc[canonical_layer_name(l)].append(captured[l][: batch.n_valid])
            n_images += batch.n_valid
        local = {l: np.concatenate(acc[l], axis=0) for l in layers}
        if n_procs > 1:
            # host shards are contiguous equal-length ranges (wrap-padded), so a
            # tiled allgather concatenates them back in probe order; trim the tail
            # padding to the true total (`experiments.py:554-564` gather-and-trim)
            from jax.experimental import multihost_utils

            return (
                {l: np.asarray(multihost_utils.process_allgather(local[l], tiled=True))
                 [:n_total] for l in layers},
                n_total,
            )
        return local, n_images

    pending = deque()

    if n_procs > 1:
        from jax.experimental import multihost_utils

        def _fetch(dev):
            return np.asarray(multihost_utils.process_allgather(dev, tiled=True))
    else:
        _fetch = np.asarray

    def drain_one():
        dev, n_valid, names, widths = pending.popleft()
        packed = _fetch(dev)
        off = 0
        for name, w in zip(names, widths):
            # multi-host: keep the full global batch; per-host tails untangle below
            rows = packed[:, off : off + w] if n_procs > 1 else packed[:n_valid, off : off + w]
            acc[name].append(rows)
            off += w

    for u8, n_valid in _prefetch_u8_batches(probe, batch_size):
        dev, names, widths = target.harvest_u8_dispatch(
            u8, layers, pool_mode, probe.mean, probe.std)
        pending.append((dev, n_valid, names, widths))
        n_images += n_valid
        if len(pending) > pipeline_depth:
            drain_one()
    while pending:
        drain_one()

    if n_procs > 1:
        # global batches interleave host slices [b][h][local_bs]; restore probe order
        # (host shards are contiguous ranges) then trim wrap padding to n_total
        out = {}
        for l in layers:
            a = np.stack(acc[l])  # [n_batches, n_procs*local_bs, C]
            nb, gb, cdim = a.shape
            a = (a.reshape(nb, n_procs, gb // n_procs, cdim)
                 .transpose(1, 0, 2, 3).reshape(n_procs, nb * (gb // n_procs), cdim))
            out[l] = a[:, : len(probe)].reshape(-1, cdim)[:n_total]
        return out, n_total
    return {l: np.concatenate(acc[l], axis=0) for l in layers}, n_images


def _fused_harvest_embed(dissector, probe, layers, pool_mode: str, batch_size: int,
                         pipeline_depth: int = 2):
    """Double-buffered fused harvest+embed loop (see save_activations fused path)."""
    from collections import deque

    acc: Dict[str, list] = {l: [] for l in layers}
    emb_acc: list = []
    pending = deque()

    def drain_one():
        packed_dev, emb_dev, n_valid, names, widths = pending.popleft()
        packed = np.asarray(packed_dev)
        emb_acc.append(np.asarray(emb_dev)[:n_valid])
        off = 0
        for name, w in zip(names, widths):
            acc[name].append(packed[:n_valid, off : off + w])
            off += w

    n_images = 0
    for u8, n_valid in _prefetch_u8_batches(probe, batch_size):
        packed_dev, emb_dev, names, widths = dissector.harvest_and_embed_u8_dispatch(
            u8, layers, pool_mode, probe.mean, probe.std)
        pending.append((packed_dev, emb_dev, n_valid, names, widths))
        n_images += n_valid
        if len(pending) > pipeline_depth:
            drain_one()
    while pending:
        drain_one()
    return ({l: np.concatenate(acc[l], axis=0) for l in layers},
            np.concatenate(emb_acc, axis=0), n_images)


def _prefetch_packed_batches(probe, batch_size: int, quantum: int, cap_bytes: int,
                             depth: int = 2, start: int = 0,
                             fixed_len: Optional[int] = None, n_shards: int = 1):
    """Packed-wire batch assembly (dissect/packing.py): the producer thread computes
    per-row nonzero spans, packs them per data-shard group into a [n_shards, L]
    uint8 payload (bucket-padded to a static per-shard length) and emits
    (flat2d [D, L], meta [B, H, 2] i32, n_valid, L). Packing overlaps device work
    exactly like `_prefetch_u8_batches`' decode+resize.

    `quantum`/`cap_bytes`/`fixed_len` are PER-SHARD byte sizes. `fixed_len` pins
    the bucket (single compile) when the caller knows the payload envelope (e.g.
    the bench precomputes its pool's max batch bytes); a batch whose largest
    shard group overflows it falls back to the quantum bucketing for that batch."""
    from mammodissect.dissect.packing import pack_batch_groups_padded

    h, w_, c = probe.image_shape
    use_spans = hasattr(probe, "image_spans")
    zero_span = (np.zeros(h, np.int32), np.zeros(h, np.int32))

    def assemble(start_, stop):
        u8 = np.zeros((batch_size, h, w_, c), np.uint8)
        spans = [] if use_spans else None
        for j, i in enumerate(range(start_, stop)):
            u8[j] = probe.image_u8(i)
            if use_spans:
                spans.append(probe.image_spans(i))
        if use_spans:
            # tail padding rows are known all-zero: constant empty spans,
            # no O(H*W) rescan of frames we just allocated as zeros
            spans.extend(zero_span for _ in range(stop - start_, batch_size))
        # one-shot padded pack (native memcpy path when built): spans land
        # directly in their final [D, bucket] wire positions
        flat2d, meta, bucket = pack_batch_groups_padded(
            u8, n_shards, spans=spans, quantum=quantum, cap=cap_bytes,
            fixed_len=fixed_len)
        return flat2d, meta, stop - start_, bucket

    yield from _prefetch(assemble, len(probe), batch_size, start, depth)


def _decide_wire_pack(wire_pack: str, probe) -> bool:
    """Resolve the wire_pack mode against a sampled packed-fraction estimate."""
    if wire_pack == "off" or not hasattr(probe, "image_u8"):
        return False
    if wire_pack == "on":
        return True
    from mammodissect.dissect.packing import sample_pack_fraction

    return sample_pack_fraction(probe) <= 0.85


class _ChunkSpiller:
    """Background writer: fetches completed resident chunks to host and saves them to
    the activation cache, off the harvest loop's critical path. Restores the
    reference's skip-if-exists restartability (`utils.py:648-657`) for the resident
    path: an interrupted run resumes from the last fully-harvested chunk."""

    def __init__(self, cache_dir: str, key: str):
        import queue
        import threading

        os.makedirs(cache_dir, exist_ok=True)
        self.cache_dir, self.key = cache_dir, key
        self._q: "queue.Queue" = queue.Queue()
        self._err = None
        self._t = threading.Thread(target=self._run, daemon=True)
        self._t.start()

    def paths(self, i: int):
        stem = os.path.join(self.cache_dir, f"{self.key}_chunk{i:04d}")
        return stem + "_act.npy", stem + "_emb.npy"

    @property
    def partial_path(self):
        return os.path.join(self.cache_dir, f"{self.key}_partial.npz")

    def load_existing(self, cap: int, u_total: int, emb_dim: int):
        """Consecutive complete spilled chunks with the expected geometry."""
        chunks = []
        i = 0
        while True:
            pa, pe = self.paths(i)
            if not (os.path.exists(pa) and os.path.exists(pe)):
                break
            try:
                a, e = np.load(pa), np.load(pe)
            except Exception:
                break  # torn write from a killed run: re-harvest from here
            if a.shape != (cap, u_total) or e.shape != (cap, emb_dim):
                break
            chunks.append((a, e))
            i += 1
        return chunks

    def load_partial(self, chunk_index: int, cap: int, u_total: int, emb_dim: int,
                     batch_size: int):
        """The in-progress chunk a previous run spilled at interruption/completion:
        (act [cap,U], emb [cap,D], offset, n_images) or None. Validated against the
        current geometry AND the expected chunk index (a stale partial from before
        that chunk completed is ignored)."""
        p = self.partial_path
        if not os.path.exists(p):
            return None
        try:
            z = np.load(p)
            a, e = z["act"], z["emb"]
            idx, offset, n_img = int(z["chunk_index"]), int(z["offset"]), int(z["n_images"])
        except Exception:
            return None
        if (idx != chunk_index or a.shape != (cap, u_total)
                or e.shape != (cap, emb_dim) or not 0 < offset <= cap
                or offset % batch_size != 0):
            return None
        return a, e, offset, n_img

    def submit(self, i: int, acc_a, acc_e):
        self._q.put(("chunk", i, acc_a, acc_e))

    def submit_partial(self, chunk_index: int, acc_a, acc_e, offset: int, n_images: int):
        self._q.put(("partial", chunk_index, acc_a, acc_e, offset, n_images))

    def _run(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            try:
                if item[0] == "chunk":
                    _, i, acc_a, acc_e = item
                    pa, pe = self.paths(i)
                    for path, dev in ((pa, acc_a), (pe, acc_e)):
                        host = np.asarray(dev)  # device fetch happens here
                        _atomic_write(path, lambda f, h=host: np.save(f, h))
                else:
                    _, idx, acc_a, acc_e, offset, n_img = item
                    a, e = np.asarray(acc_a), np.asarray(acc_e)
                    _atomic_write(
                        self.partial_path,
                        lambda f: np.savez(f, act=a, emb=e, chunk_index=idx,
                                           offset=offset, n_images=n_img),
                    )
            except Exception as e:
                self._err = e

    def close(self):
        self._q.put(None)
        self._t.join()
        if self._err is not None:
            raise self._err


def fused_harvest_embed_resident(dissector, probe, layers, pool_mode: str,
                                 batch_size: int, sync_every: int = 16,
                                 chunk_batches: int = 16, log=None,
                                 cache_dir: Optional[str] = None, cache_key: str = "",
                                 deadline: Optional[float] = None,
                                 timing: Optional[list] = None,
                                 wire_pack: str = "off",
                                 pack_fixed_len: Optional[int] = None):
    """Device-resident fused M-dissect harvest (see BreastClip.fused_resident_step).

    Per batch the only relay traffic is the uint8 upload; activations+embeddings
    accumulate in donated device buffers. The buffers are FIXED-capacity chunks of
    `chunk_batches * batch_size` rows, so the compiled step program is independent of
    probe size (one compile serves any D_probe; a fresh chunk is just new zeros).
    A 1-element fetch every `sync_every` batches provides backpressure
    (block_until_ready is a no-op on this runtime).

    With a mesh attached to the dissector, the step runs SPMD over Mesh('data'):
    uint8 batch + accumulators row-sharded, params replicated; row order and chunk
    files are identical to the single-device layout.

    cache_dir/cache_key enable chunk-level spill+resume: every completed chunk is
    written to the activation cache by a background thread, and a rerun with the same
    key resumes after the last complete chunk (skip-if-exists, `utils.py:648-657`).

    deadline (a time.monotonic() value) stops the harvest at the next batch boundary
    once reached — partial results are valid (rows are sequential) and the caller
    scores whatever was harvested. The check is predictive: the loop stops when the
    time remaining is less than ~1.5x the previous batch's wall time, because a
    single blocking upload in this runtime's throttled relay can run many minutes
    and the deadline cannot interrupt it mid-transfer.

    timing, if a list, collects per-batch dicts {"assemble_s","put_s","step_s",
    "sync_s","wire_bytes"} for transport diagnostics.

    wire_pack ("off"/"on"/"auto") enables the lossless packed uint8 wire
    (dissect/packing.py): per-row nonzero spans cross instead of full frames and an
    in-jit gather reconstructs the bit-identical canvas — the direct lever on the
    measured >=98%-wire harvest for ~40-60%-black mammography probes. "auto"
    samples the probe and packs when the payload fraction is <= 0.85.
    Under a mesh the payload packs per data-shard group and ships [D, L] sharded
    P('data') — each chip receives only its own shard's packed bytes.
    pack_fixed_len pins the packed bucket to one static TOTAL size (single
    compile); it is split evenly across the D shard groups.

    Returns (act_chunks, emb_chunks, names, widths, n_images) where the chunk lists
    concatenate (on device, in `score_resident`) to [>=n, U_total]/[>=n, D] f32."""
    import jax
    import jax.numpy as jnp

    h, w, c = probe.image_shape
    shape = (batch_size, h, w, c)
    step, names, widths = dissector.fused_resident_step(
        shape, layers, pool_mode, probe.mean, probe.std)
    u_total = int(sum(widths))
    cap = chunk_batches * batch_size
    emb_dim = int(dissector.module.proj_dim)

    packed = (_decide_wire_pack(wire_pack, probe)
              and hasattr(dissector, "fused_resident_step_packed"))
    # the packed payload packs/ships per data-shard group ([D, L] sharded
    # P('data')), so bucket sizes are PER SHARD. The group count MUST come from
    # the dissector itself (the same mesh its packed step shards over): a
    # dissector that grows fused_resident_step_packed without declaring its
    # data-shard count would get packed [1, L] against a step expecting [D, L]
    # and fail only at jit call time with an opaque shape error (ADVICE r4).
    n_shards = 1
    if packed:
        if not hasattr(dissector, "resident_data_shards"):
            raise AttributeError(
                f"{type(dissector).__name__} provides fused_resident_step_packed "
                "but not resident_data_shards(); the packed wire's [D, L] leading "
                "axis must match the step's data-shard count")
        n_shards = int(dissector.resident_data_shards())
    if packed and batch_size % n_shards:
        raise ValueError(f"packed wire needs batch_size {batch_size} divisible "
                         f"by the mesh's data axis ({n_shards})")
    cap_bytes = batch_size * h * w * c // n_shards
    pack_quantum = max(cap_bytes // 16, 1)
    packed_steps: Dict[int, object] = {}

    def _packed_step(bucket: int):
        if bucket not in packed_steps:
            packed_steps[bucket], _n, _w = dissector.fused_resident_step_packed(
                shape, bucket, layers, pool_mode, probe.mean, probe.std)
        return packed_steps[bucket]

    rows_sharding = u8_sharding = None
    if hasattr(dissector, "resident_accumulator_shardings"):
        rows_sharding, u8_sharding = dissector.resident_accumulator_shardings()
    flat_sharding = meta_sharding = None
    if packed and hasattr(dissector, "resident_packed_put_shardings"):
        flat_sharding, meta_sharding = dissector.resident_packed_put_shardings()

    if rows_sharding is not None:
        # jitted creation with out_shardings: the zeros materialize sharded on
        # device, never crossing the host wire. Built ONCE — a fresh closure per
        # chunk would re-trace (and pay a remote compile) every chunk.
        _zeros_sharded = jax.jit(
            lambda n_cols: jnp.zeros((cap, n_cols), jnp.float32),
            static_argnums=0, out_shardings=rows_sharding)

    def _zeros(n_cols):
        if rows_sharding is None:
            return jnp.zeros((cap, n_cols), jnp.float32)
        return _zeros_sharded(n_cols)

    def _put(flat):
        return jax.device_put(flat, u8_sharding) if u8_sharding is not None \
            else jax.device_put(flat)

    def _put_rows(arr):
        return jax.device_put(arr, rows_sharding) if rows_sharding is not None \
            else jax.device_put(arr)

    spiller = _ChunkSpiller(cache_dir, cache_key) if cache_dir else None
    act_chunks, emb_chunks = [], []
    acc_a = acc_e = None
    offset = 0
    consumed = 0  # probe images dispatched (batch_size granularity)
    n_images = 0  # valid images harvested (< consumed only past the probe tail)
    if spiller is not None:
        for a, e in spiller.load_existing(cap, u_total, emb_dim):
            act_chunks.append(a)
            emb_chunks.append(e)
        consumed = len(act_chunks) * cap
        # the probe's short final batch can land exactly on a chunk boundary, in
        # which case the last complete chunk carries padding rows — valid images
        # can never exceed the probe length (scoring must not see padded rows)
        n_images = min(consumed, len(probe))
        part = spiller.load_partial(len(act_chunks), cap, u_total, emb_dim, batch_size)
        if part is not None:
            pa, pe, offset, n_images = part
            n_images = min(n_images, len(probe))
            acc_a, acc_e = _put_rows(pa), _put_rows(pe)
            consumed = len(act_chunks) * cap + offset
        if consumed and log is not None:
            log(f"[resident] resumed {len(act_chunks)} cached chunks"
                + (f" + a partial chunk at row {offset}" if part else "")
                + f" ({n_images} images) from {cache_dir}")

    if packed:
        # pack_fixed_len is the TOTAL batch envelope; the per-shard bucket is the
        # CEIL division (floor would undershoot when n_shards doesn't divide it
        # and silently fall back to quantum bucketing — an unplanned mid-harvest
        # recompile, ADVICE r4). Callers that know the max per-GROUP payload on
        # an uneven mesh should pass pack_fixed_len = n_shards * that maximum.
        fixed_group = -(-pack_fixed_len // n_shards) if pack_fixed_len else None
        batches = _prefetch_packed_batches(probe, batch_size, pack_quantum, cap_bytes,
                                           start=consumed, fixed_len=fixed_group,
                                           n_shards=n_shards)
        if log is not None:
            log("[resident] packed uint8 wire enabled"
                + (f" ({n_shards} shard groups)" if n_shards > 1 else "")
                + (f" (fixed bucket {fixed_group} B/shard"
                   f" = ceil({pack_fixed_len}/{n_shards}))" if pack_fixed_len
                   else ""))
    else:
        batches = ((u8, None, n_valid, None)
                   for u8, n_valid in _prefetch_u8_batches(probe, batch_size,
                                                           start=consumed))
    i_batch = 0
    try:
        for payload, meta, n_valid, bucket in batches:
            t0 = time.perf_counter()
            if acc_a is None:
                acc_a = _zeros(u_total)
                acc_e = _zeros(emb_dim)
            if packed:
                wire_b = payload.nbytes + meta.nbytes
                t1 = time.perf_counter()
                flat_dev = (jax.device_put(payload, flat_sharding)
                            if flat_sharding is not None else jax.device_put(payload))
                meta_dev = (jax.device_put(meta, meta_sharding)
                            if meta_sharding is not None else jax.device_put(meta))
                t2 = time.perf_counter()
                acc_a, acc_e = _packed_step(bucket)(
                    dissector.variables, acc_a, acc_e, flat_dev, meta_dev,
                    jnp.int32(offset))
            else:
                flat = np.ascontiguousarray(payload).reshape(-1)
                wire_b = flat.nbytes
                t1 = time.perf_counter()
                u8_dev = _put(flat)
                t2 = time.perf_counter()
                acc_a, acc_e = step(dissector.variables, acc_a, acc_e,
                                    u8_dev, jnp.int32(offset))
            t3 = time.perf_counter()
            n_images += n_valid
            consumed += batch_size
            offset += batch_size
            i_batch += 1
            if offset == cap:
                act_chunks.append(acc_a)
                emb_chunks.append(acc_e)
                if spiller is not None:
                    spiller.submit(len(act_chunks) - 1, acc_a, acc_e)
                acc_a = acc_e = None
                offset = 0
            t4 = t3
            if i_batch % sync_every == 0:
                probe_chunk = acc_e if acc_e is not None else emb_chunks[-1]
                _ = np.asarray(probe_chunk[0, :1])  # backpressure: bound the queue
                t4 = time.perf_counter()
                if log is not None:
                    log(f"[resident] {n_images}/{len(probe)} images")
            if timing is not None:
                timing.append({"assemble_s": t1 - t0, "put_s": t2 - t1,
                               "step_s": t3 - t2, "sync_s": t4 - t3,
                               "wire_bytes": wire_b})
            if deadline is not None:
                margin = min(1.5 * (t4 - t0), 120.0)
                if time.monotonic() >= deadline - margin:
                    if log is not None:
                        log(f"[resident] deadline reached at {n_images}/{len(probe)} "
                            f"images; finalizing with the partial harvest")
                    break
        if acc_a is not None:
            act_chunks.append(acc_a)
            emb_chunks.append(acc_e)
            if spiller is not None:
                # spill the in-progress chunk too: interruption resumes at batch
                # granularity and a completed harvest resumes straight to scoring
                spiller.submit_partial(len(act_chunks) - 1, acc_a, acc_e,
                                       offset, n_images)
    finally:
        if spiller is not None:
            spiller.close()
    return act_chunks, emb_chunks, names, widths, n_images


def _score_resident_jit():
    """Module-level jitted scorer (lazy: jax imported on first use). Hoisted so
    repeated `score_resident` calls hit the SAME jit cache — a per-call closure would
    retrace every time (jit caches key on function identity), silently adding a full
    retrace+compile to every measured scoring pass."""
    global _SCORE_RESIDENT_FN
    if _SCORE_RESIDENT_FN is None:
        import jax
        import jax.numpy as jnp
        from jax import lax

        from mammodissect.ops.similarity import SEGMENTED_FNS, get_similarity_fn

        @partial(jax.jit, static_argnames=(
            "n_images", "n_segments", "sim_name", "k_c", "k_i", "kk"))
        def _score(act_chunks, emb_chunks, text_f, seg_ids, n_images, n_segments,
                   sim_name, k_c, k_i, kk):
            acts = jnp.concatenate(act_chunks, axis=0)[:n_images]
            emb = jnp.concatenate(emb_chunks, axis=0)[:n_images]
            emb = emb / jnp.clip(jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
            txt = text_f / jnp.clip(jnp.linalg.norm(text_f, axis=1, keepdims=True), 1e-12)
            clip_feats = jnp.dot(emb, txt.T, preferred_element_type=jnp.float32,
                                 precision=lax.Precision.HIGHEST)
            if sim_name in SEGMENTED_FNS:
                kwargs = {"top_k": kk} if sim_name == "soft_wpmi" else {}
                sim = SEGMENTED_FNS[sim_name](clip_feats, acts, seg_ids, n_segments,
                                              **kwargs)
            else:
                sim = get_similarity_fn(sim_name)(clip_feats, acts)
            top_vals, top_idx = lax.top_k(sim, k_c)
            _, img_idx = lax.top_k(acts.T, k_i)
            return top_vals, top_idx, img_idx

        _SCORE_RESIDENT_FN = _score
    return _SCORE_RESIDENT_FN


_SCORE_RESIDENT_FN = None


def score_resident(act_chunks, emb_chunks, n_images: int, text_features: np.ndarray,
                   widths, similarity_name: str, top_k: int = 100,
                   num_top_concepts: int = 10, num_top_images: int = 5):
    """Stage 4 entirely ON DEVICE from resident accumulators: clip_feats = emb@text.T,
    segmented scoring across all layers in one program, per-unit top-concepts and
    top-activating-image indices via lax.top_k — the host receives only CSV-sized
    arrays (the device->host relay runs ~6 MB/s, so fetching the raw [N, U_total]
    matrix would cost more than the whole harvest). With mesh-sharded chunks the
    program runs SPMD over the same Mesh('data').

    Returns (top_vals [U, k_c], top_concept_idx [U, k_c], top_image_idx [U, k_i])."""
    import jax.numpy as jnp

    widths = [int(w) for w in widths]
    segment_ids = np.repeat(np.arange(len(widths), dtype=np.int32), widths)

    k_c = min(num_top_concepts, int(text_features.shape[0]))
    k_i = min(num_top_images, n_images)
    kk = min(top_k, n_images)
    top_vals, top_idx, img_idx = _score_resident_jit()(
        list(act_chunks), list(emb_chunks), jnp.asarray(text_features, jnp.float32),
        jnp.asarray(segment_ids), int(n_images), len(widths),
        similarity_name, k_c, k_i, kk,
    )
    return np.asarray(top_vals), np.asarray(top_idx), np.asarray(img_idx)


def get_target_activations(target_save_name: str, neuron_idx=None) -> np.ndarray:
    """Load cached activations, optionally one neuron's column (the reference's
    `get_dist_from_target_activations`, `concept_vit/utils.py:613-617`)."""
    target_feats = np.load(target_save_name)
    return target_feats[:, neuron_idx] if neuron_idx is not None else target_feats


def read_concepts(concept_set: str) -> List[str]:
    with open(concept_set) as f:
        return [w for w in f.read().split("\n") if w.strip()]


def get_similarity_from_activations(
    target_save_name: str,
    clip_save_name: str,
    text_save_name: str,
    similarity_fn,
    return_target_feats: bool = True,
    top_k: int = 100,
):
    """Stage 4 (reference `utils.py:566-612`): load cached features, L2-normalize both
    towers, clip_feats = img @ text.T (fp32), score."""
    image_features = np.load(clip_save_name).astype(np.float32)
    text_features = np.load(text_save_name).astype(np.float32)
    image_features /= np.clip(np.linalg.norm(image_features, axis=1, keepdims=True), 1e-12, None)
    text_features /= np.clip(np.linalg.norm(text_features, axis=1, keepdims=True), 1e-12, None)
    clip_feats = image_features @ text_features.T

    target_feats = np.load(target_save_name).astype(np.float32)
    kwargs = {}
    if getattr(similarity_fn, "__name__", "") in ("soft_wpmi",):
        kwargs["top_k"] = min(top_k, target_feats.shape[0])
        # NOT auto-enabling the Pallas gather+log-reduce kernel: measured on this
        # chip at both canonical geometries (10k/2k images x 762 x 512, top_k 100)
        # the XLA gather path is now ~1.7-1.8x FASTER (6.0 vs 10.2 ms) — XLA's
        # gather emitter overtook the hand kernel since the round-2 measurement.
        # The kernel remains available via soft_wpmi(..., use_pallas=True).
    # NOTE: unit-count bucketing (pad U to few sizes to cut per-width recompiles) is
    # deliberately NOT done: soft_wpmi's log p(d) is a logsumexp over units, so padded
    # units would shift every score and break exact reference agreement.
    similarity = np.asarray(similarity_fn(clip_feats, target_feats, **kwargs))
    if return_target_feats:
        return similarity, target_feats
    return similarity


def _load_clip_feats(clip_save_name: str, text_save_name: str) -> np.ndarray:
    image_features = np.load(clip_save_name).astype(np.float32)
    text_features = np.load(text_save_name).astype(np.float32)
    image_features /= np.clip(np.linalg.norm(image_features, axis=1, keepdims=True), 1e-12, None)
    text_features /= np.clip(np.linalg.norm(text_features, axis=1, keepdims=True), 1e-12, None)
    return image_features @ text_features.T


def score_all_layers(
    feats_by_layer: Dict[str, np.ndarray],
    clip_save_name: str,
    text_save_name: str,
    similarity_name: str,
    top_k: int = 100,
) -> Dict[str, np.ndarray]:
    """Stage 4 over ALL layers in ONE jitted program.

    The reference scores layer by layer (`describe_broad_neurons.py:83-119`), which in
    XLA terms would compile once per distinct unit width (7 for B5's 39 blocks). Here
    the per-layer [N, U_l] activation matrices are concatenated into one [N, U_total]
    scoring call: soft_wpmi/wpmi use the segmented entry points (per-layer log p(d) via
    segment logsumexp — math identical to the per-layer loop); cos/cos³/rank_reorder
    are per-unit independent so the plain fn applies directly. One compile, full-width
    MXU tiles, one device round-trip."""
    from mammodissect.ops.similarity import SEGMENTED_FNS

    clip_feats = _load_clip_feats(clip_save_name, text_save_name)
    layers = list(feats_by_layer)
    widths = [feats_by_layer[l].shape[1] for l in layers]
    target_cat = np.concatenate(
        [feats_by_layer[l].astype(np.float32) for l in layers], axis=1
    )

    kwargs = {}
    if similarity_name == "soft_wpmi":
        kwargs["top_k"] = min(top_k, target_cat.shape[0])
        # Pallas kernel not auto-enabled — measured slower than XLA's gather path
        # at canonical geometry (see get_similarity_from_activations).
    if similarity_name in SEGMENTED_FNS:
        segment_ids = np.repeat(np.arange(len(layers), dtype=np.int32), widths)
        sim_cat = np.asarray(
            SEGMENTED_FNS[similarity_name](
                clip_feats, target_cat, segment_ids, len(layers), **kwargs
            )
        )
    else:
        sim_cat = np.asarray(
            get_similarity_fn(similarity_name)(clip_feats, target_cat, **kwargs)
        )

    out, off = {}, 0
    for layer, w in zip(layers, widths):
        out[layer] = sim_cat[off : off + w]
        off += w
    return out


def _gather_resident_multihost(act_chunks, emb_chunks, n_local: int, probe):
    """Reassemble per-host resident accumulators into global probe order.

    Each host harvested its contiguous HostShardedProbe shard on its LOCAL mesh;
    scoring needs the global [N, U_total] matrix (soft-WPMI's per-unit top-k and
    log p(d) span ALL images). Hosts can stop at different batch boundaries under
    a deadline, so every host trims to the common minimum, allgathers (tiled, so
    contiguous shards concatenate back in probe order), and drops the shard
    clamp-padding rows (indices past the true probe length).

    Returns (act_chunks, emb_chunks, n_images, index_map) where index_map[i] is
    the GLOBAL probe index of gathered row i — the CSV's top-activating-image ids
    must pass through it."""
    from jax.experimental import multihost_utils

    local_a = np.concatenate([np.asarray(c) for c in act_chunks], axis=0)[:n_local]
    local_e = np.concatenate([np.asarray(c) for c in emb_chunks], axis=0)[:n_local]
    counts = np.asarray(
        multihost_utils.process_allgather(np.asarray([n_local]), tiled=True)
    ).reshape(-1)
    n_min = int(counts.min())
    ga = np.asarray(multihost_utils.process_allgather(local_a[:n_min], tiled=True))
    ge = np.asarray(multihost_utils.process_allgather(local_e[:n_min], tiled=True))
    per_host, n_total = probe.per_host, len(probe.base)
    idx = np.concatenate(
        [np.arange(h * per_host, h * per_host + n_min) for h in range(len(counts))])
    mask = idx < n_total  # clamp-padded shard rows duplicate the last probe image
    return [ga[mask]], [ge[mask]], int(mask.sum()), idx[mask]


def _run_dissection_resident(cfg: DissectConfig, probe=None, target=None,
                             dissector=None, log=print):
    """Fully device-resident M-dissect (see DissectConfig.resident). Returns
    (DataFrame, csv_path) or None when the configuration can't run resident.

    Real multi-host runs (process_count > 1): each host runs the resident harvest
    over its contiguous HostShardedProbe shard on its LOCAL device mesh (per-host
    chunk spill keyed by host index), then the accumulators are process-allgathered
    back into probe order for scoring — the resident analogue of the staged path's
    DistributedSampler + allgather-and-trim (`Classifiers/experiments.py:554-564`)."""
    if not (cfg.target_model == "breastclip"
            and cfg.clip_model == "breastclip"
            and not cfg.target_kwargs
            and not cfg.finetuned_ckpt and target is None):
        return None
    import warnings

    import jax

    from mammodissect.parallel.mesh import mesh_spans_processes

    n_procs = jax.process_count()
    mesh = auto_data_mesh()  # LOCAL devices: each host harvests its own shard
    probe = probe or get_probe(cfg.d_probe, **cfg.probe_kwargs)
    if not (hasattr(probe, "image_u8") and hasattr(probe, "mean")):
        return None
    index_map = None
    if n_procs > 1:
        from mammodissect.data.probes import HostShardedProbe

        if not isinstance(probe, HostShardedProbe):
            probe = HostShardedProbe(probe)
    dk = dict(cfg.dissector_kwargs)
    dk.setdefault("ckpt_path", cfg.breast_clip_ckpt)
    dissector = _attach_mesh(dissector or get_dissector(cfg.clip_model, **dk), mesh)
    if n_procs > 1 and mesh_spans_processes(getattr(dissector, "mesh", None)):
        warnings.warn(
            "multi-host resident dissection harvests per-host shards on LOCAL "
            "devices; replacing the dissector's process-spanning mesh")
        dissector.set_mesh(mesh)
    if not hasattr(dissector, "fused_resident_step"):
        return None
    bs = _round_batch(cfg.batch_size, getattr(dissector, "mesh", None))

    words = read_concepts(cfg.concept_set)
    layers = [canonical_layer_name(l) for l in cfg.target_layers]
    # chunk-spill resume: completed chunks land in the activation cache keyed by the
    # run's probe/geometry so an interrupted resident dissection restarts where it
    # stopped (the staged path's skip-if-exists semantics, `utils.py:648-657`)
    os.makedirs(cfg.activation_dir, exist_ok=True)
    d_probe_key = cfg.d_probe.replace("/", "_").replace(":", "_")
    # the key must cover EVERYTHING that changes chunk contents: a pool_mode /
    # layer-list / probe_kwargs change can leave (cap, U_total) identical, and
    # geometry validation alone would silently resume stale chunks
    import hashlib

    # resolve the packed-wire decision HERE so the resume cache keys on the actual
    # wire mode: packed and unpacked programs reconstruct bit-identical canvases,
    # but compile as different XLA programs, and resumed chunks must come from one
    wire_mode = "on" if (_decide_wire_pack(cfg.wire_pack, probe)
                         and hasattr(dissector, "fused_resident_step_packed")) else "off"
    sig = hashlib.sha1(repr((tuple(layers), cfg.pool_mode,
                             sorted(cfg.probe_kwargs.items()),
                             cfg.breast_clip_ckpt, wire_mode)).encode()).hexdigest()[:8]
    cache_key = (f"{cfg.save_prefix}{d_probe_key}_{cfg.clip_model}"
                 f"_resident_b{bs}_{sig}")
    if n_procs > 1:
        # per-host spill files must not collide in a shared activation_dir
        cache_key += f"_host{jax.process_index()}of{n_procs}"
    deadline = (time.monotonic() + cfg.deadline_s
                if cfg.deadline_s is not None else None)
    t0 = time.time()
    act_chunks, emb_chunks, names, widths, n_images = fused_harvest_embed_resident(
        dissector, probe, layers, cfg.pool_mode, bs,
        cache_dir=cfg.activation_dir, cache_key=cache_key, log=log,
        deadline=deadline, wire_pack=wire_mode)
    if n_images < len(probe):
        log(f"[resident] PARTIAL dissection: {n_images}/{len(probe)} images within "
            f"the {cfg.deadline_s}s budget; rerun to resume and complete")
    if n_procs > 1:
        act_chunks, emb_chunks, n_images, index_map = _gather_resident_multihost(
            act_chunks, emb_chunks, n_images, probe)
        log(f"[resident] multi-host: gathered {n_images} rows from {n_procs} "
            f"host shards for scoring")
    text_feats = dissector.embed_texts(words)
    top_vals, top_idx, img_idx = score_resident(
        act_chunks, emb_chunks, n_images, text_feats, widths, cfg.similarity_fn,
        top_k=cfg.top_k, num_top_concepts=cfg.num_top_concepts,
        num_top_images=cfg.num_top_images)
    if index_map is not None:
        # multi-host: scored rows are the gathered subset; map top-activating-image
        # ids back to GLOBAL probe indices for the CSV contract
        img_idx = index_map[img_idx]
    log(f"[resident] dissected {n_images} images x {len(names)} layers on device "
        f"in {time.time()-t0:.1f}s")

    row_slices, off = {}, 0
    for name, w in zip(names, widths):
        row_slices[name] = slice(off, off + w)
        off += w
    outputs = {"layer": [], "unit": [], "description": [], "similarity": [], "images": []}
    for layer in layers:  # CSV rows follow the requested layer order (staged parity)
        sl = row_slices[layer]
        w = sl.stop - sl.start
        outputs["layer"].extend([layer] * w)
        outputs["unit"].extend(range(w))
        outputs["description"].extend(
            [[words[int(i)] for i in row] for row in top_idx[sl]])
        outputs["similarity"].extend([row.tolist() for row in top_vals[sl]])
        outputs["images"].extend([row.tolist() for row in img_idx[sl]])
        # staged-path log parity: downstream consumers (the CLI's wandb status
        # stream) key per-layer events on these lines
        log(f"[score] {layer}: {w} units scored")
    return write_results(outputs, cfg)


def run_dissection(cfg: DissectConfig, probe=None, target=None, dissector=None, log=print):
    """Full driver (reference `describe_broad_neurons.py.__main__`): harvest + score every
    layer, emit the results CSV `{layer, unit, description, similarity, images}` and an
    args.txt metadata dump. Returns (DataFrame, csv_path)."""
    if cfg.resident:
        # build the probe once: on a non-resident-capable configuration the
        # fallback hands the SAME probe to the staged path instead of re-reading
        # the CSV/folder from scratch
        probe = probe or get_probe(cfg.d_probe, **cfg.probe_kwargs)
        out = _run_dissection_resident(cfg, probe=probe, target=target,
                                       dissector=dissector, log=log)
        if out is not None:
            return out
        log("[resident] not applicable (non-fused target/probe); using the staged path")

    paths = save_activations(cfg, probe=probe, target=target, dissector=dissector, log=log)
    words = read_concepts(cfg.concept_set)

    layer_names = [canonical_layer_name(l) for l in cfg.target_layers]
    feats_by_layer = {
        l: np.load(paths[f"target:{l}"]).astype(np.float32) for l in layer_names
    }
    sims = score_all_layers(
        feats_by_layer, paths["clip"], paths["text"], cfg.similarity_fn, top_k=cfg.top_k
    )

    outputs = {"layer": [], "unit": [], "description": [], "similarity": [], "images": []}
    for layer in layer_names:
        sim, target_feats = sims[layer], feats_by_layer[layer]
        k_c = min(cfg.num_top_concepts, sim.shape[1])
        k_i = min(cfg.num_top_images, target_feats.shape[0])
        top_concepts = np.argsort(-sim, axis=1, kind="stable")[:, :k_c]  # [U, k_c]
        top_vals = np.take_along_axis(sim, top_concepts, axis=1)
        top_images = np.argsort(-target_feats, axis=0, kind="stable")[:k_i].T  # [U, k_i]

        n_units = sim.shape[0]
        outputs["layer"].extend([layer] * n_units)
        outputs["unit"].extend(range(n_units))
        outputs["description"].extend(
            [[words[int(i)] for i in row] for row in top_concepts]
        )
        outputs["similarity"].extend([row.tolist() for row in top_vals])
        outputs["images"].extend([row.tolist() for row in top_images])
        log(f"[score] {layer}: {n_units} units scored")

    df, csv_path = write_results(outputs, cfg)
    return df, csv_path
