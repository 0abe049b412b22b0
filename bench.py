"""Headline benchmark: Mammo-CLIP dissection throughput on one TPU chip — a MEASURED
full-scale run that ALWAYS publishes a number.

Workload (BASELINE.md north-star): 10,000-image D_probe at 1520x912 grayscale through
the flagship M-dissect configuration — BreastClip (EfficientNet-B5 + 12-layer BERT)
dissecting its own image tower, all 39 MBConv blocks, 762 concepts, soft-WPMI — via the
engine's device-RESIDENT path: uint8 probe upload is the only per-batch relay traffic;
pooled activations [N, 6992] and projected embeddings accumulate on device; scoring
(one segmented program across all 39 layers) and per-unit top-k run on device; the host
receives only CSV-sized results. (This runtime's device->host relay is ~6 MB/s — 8x
slower than upload — so per-batch activation fetches would be the hidden cost.)

Deadline discipline (the round-2 run was killed by the driver before printing):
  * BENCH_DEADLINE_S (default 1440 s) is a wall-clock budget from process start; the
    harvest loop stops at the next batch boundary once ~90 s of scoring reserve
    remains, and the run scores the N images it actually harvested.
  * every completed chunk spills to BENCH_CACHE_DIR (background thread), so even a
    hard kill leaves a resumable record, and partial-progress JSON goes to stderr.
  * stdout carries exactly ONE final JSON line.

Prints ONE JSON line:
  {"metric": "dissect_images_per_sec_per_chip", "value": N, "unit": "img/s/chip",
   "vs_baseline": R}
vs_baseline is measured against the north-star rate implied by "10k-image D_probe,
full dissection < 5 min on v5e-8" => 33.3 img/s on 8 chips = 4.17 img/s/chip
(`/root/repo/BASELINE.json`). R > 1.0 beats the target.

Timing notes for this TPU runtime: block_until_ready is a no-op; completion is
observed by host fetches of 1-element slices. Compile time is reported separately
(persistent cache makes reruns start in seconds)."""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_IMG_PER_SEC_PER_CHIP = 10_000 / 300 / 8  # 4.166..., see module docstring


def _process_age_s() -> float:
    """Seconds since the OS started this process. NOT `time.monotonic() - import
    time`: this runtime's sitecustomize acquires the TPU grant at interpreter
    startup, and after an ungracefully killed predecessor that acquisition retries
    in a sleep loop for 10+ minutes BEFORE any bench code runs — budget that must
    count against the deadline, or the driver kills us before the watchdogs fire."""
    try:
        with open("/proc/self/stat") as f:
            stat = f.read()
        starttime_ticks = float(stat.rsplit(")", 1)[1].split()[19])
        with open("/proc/uptime") as f:
            uptime = float(f.read().split()[0])
        return max(uptime - starttime_ticks / os.sysconf("SC_CLK_TCK"), 0.0)
    except (OSError, ValueError, IndexError):
        return 0.0


T_PROC = time.monotonic() - _process_age_s()
# module import happens AFTER sitecustomize's TPU-grant acquisition, so the gap
# between process start and this line is the grant wait (+ trivial numpy import):
# the r4 driver capture lost ~1,100 s before the first harvested image with no
# ledger saying where — every stage now reports into detail.setup_ledger
T_IMPORT = time.monotonic()


class CyclicProbe:
    """10k-image probe backed by a smaller unique pool (host-RAM bound: 10k full-res
    grayscale images are 13.9 GB). Every image still crosses the relay as its own
    uint8 upload — transport and compute are measured honestly. Per-pool-image row
    spans are precomputed once so the packed-wire path doesn't rescan cyclic repeats."""

    def __init__(self, pool: np.ndarray, n: int, mean: float, std: float, spans=None):
        self.pool, self.n, self.mean, self.std = pool, n, mean, std
        self._spans = spans

    def __len__(self):
        return self.n

    @property
    def image_shape(self):
        return self.pool.shape[1:]

    def image_u8(self, i: int) -> np.ndarray:
        return self.pool[i % len(self.pool)]

    def image_spans(self, i: int):
        if self._spans is None:
            from mammodissect.dissect.packing import row_spans

            return row_spans(self.pool[i % len(self.pool)])
        return self._spans[i % len(self.pool)]

    def exact_pack_fraction(self):
        """Exact packed-wire fraction over the pool (spans are precomputed): the
        wire_pack=auto decision never rides a sample here."""
        if self._spans is None:
            return None
        h, w = self.pool.shape[1:3]
        c = self.pool.shape[3]
        payload = sum(int(s[1].sum()) for s in self._spans) * c
        return (payload + len(self._spans) * h * 2 * 4) / (len(self._spans) * h * w * c)


def make_mammo_pool(pool_n: int, h: int, w: int):
    """Synthetic pool matching the real workload's content envelope: mammograms are
    ~40-60% exactly-black background with the breast attached to one lateral edge
    (`concept_vit/data_utils.py:120-122`; VinDr/CSAW/EMBED PNGs). Round 1-3 pools
    were full-frame noise — unrepresentatively DENSE: the packed-wire path (the
    round-4 harvest lever) is content-dependent, so the pool must carry the real
    sparsity. Each image: a half-ellipse breast region (random size/side/center)
    filled with os.urandom texture (numpy RNG is ~4 MB/s on this 1-vCPU host;
    the kernel CSPRNG sustains ~240 MB/s — see docs/PERF.md r3).

    Returns (pool [n, h, w, 1] u8, spans list, fill_fraction)."""
    from mammodissect.dissect.packing import row_spans

    rng = np.random.default_rng(0)  # mask geometry: tiny arrays, determinism is free
    pool = np.empty((pool_n, h, w, 1), np.uint8)
    ds = 8  # masks computed at 1/8 resolution, cropped to (h, w) after upsampling
    hh, ww = -(-h // ds), -(-w // ds)  # ceil: BENCH_IMAGE_H/W need not divide by 8
    yy = (np.arange(hh) + 0.5) / hh
    xx = (np.arange(ww) + 0.5) / ww
    spans = []
    filled = 0
    for i in range(pool_n):
        cy = rng.uniform(0.35, 0.65)
        ry = rng.uniform(0.45, 0.58)
        rx = rng.uniform(0.55, 0.75)
        dx = xx if rng.integers(2) == 0 else 1.0 - xx  # breast on left or right edge
        m = ((yy[:, None] - cy) / ry) ** 2 + (dx[None, :] / rx) ** 2 <= 1.0
        mask = np.repeat(np.repeat(m, ds, axis=0), ds, axis=1)[:h, :w]
        tex = np.frombuffer(os.urandom(h * w), np.uint8).reshape(h, w)
        pool[i, :, :, 0] = tex * mask
        spans.append(row_spans(pool[i]))
        filled += int(mask.sum())
    return pool, spans, filled / (pool_n * h * w)


def note(msg):
    print(f"[bench {time.strftime('%T')}] {msg}", file=sys.stderr, flush=True)


def _pool_path(cache_dir: str, pool_n: int, h: int, w: int) -> str:
    # distinct from the `{cache_key}_*` chunk-spill namespace the cache-clean
    # wipe globs — the pool is INPUT data, wiping it would be pointless work
    return os.path.join(cache_dir, f"pool_{pool_n}x{h}x{w}_v1.npz")


def load_or_make_pool(cache_dir: str, pool_n: int, h: int, w: int):
    """Pool generation cost ~3-6 min of the r4 capture's invisible pre-harvest
    time (1-vCPU host). The pool content is measurement-neutral (any pool with
    the real sparsity envelope is equivalent), so persist it: an in-round run
    writes the file once and every later capture — including the driver's —
    starts its harvest minutes earlier. Bonus: a shared pool pins
    pack_fixed_len across runs, so the persistent XLA cache hits the packed
    step's exact program.

    Returns (pool, spans, fill_fraction, source)."""
    path = _pool_path(cache_dir, pool_n, h, w)
    try:
        with np.load(path) as z:
            pool = z["pool"]
            starts, lengths = z["starts"], z["lengths"]
            fill = float(z["fill"])
        spans = [(starts[i], lengths[i]) for i in range(pool.shape[0])]
        return pool, spans, fill, "disk"
    except (OSError, KeyError, ValueError):
        pass
    pool, spans, fill = make_mammo_pool(pool_n, h, w)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        tmp = path + f".tmp{os.getpid()}.npz"  # .npz suffix: savez must not rename it
        np.savez(tmp, pool=pool,
                 starts=np.stack([s[0] for s in spans]),
                 lengths=np.stack([s[1] for s in spans]),
                 fill=np.float64(fill))
        os.replace(tmp, path)
    except OSError:
        pass
    return pool, spans, fill, "generated"


def _chip_ab_path(cache_dir: str, h: int, w: int, batch_size: int) -> str:
    return os.path.join(cache_dir, f"chip_ab_{h}x{w}_b{batch_size}_v1.json")


def _load_chip_ab(cache_dir: str, h: int, w: int, batch_size: int) -> dict:
    try:
        with open(_chip_ab_path(cache_dir, h, w, batch_size)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _save_chip_ab(cache_dir: str, h: int, w: int, batch_size: int, ab: dict):
    """Persist the chip-side A/B rates: they depend only on geometry (not on the
    relay), so a capture that skips the measurement for budget can still publish
    the in-round measured value, labeled with where it came from."""
    try:
        os.makedirs(cache_dir, exist_ok=True)
        path = _chip_ab_path(cache_dir, h, w, batch_size)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(ab, f)
        os.replace(tmp, path)
    except OSError:
        pass


def _merge_chip_ab(fresh: dict, cached: dict) -> dict:
    """The A/B record a capture publishes: fresh rates win; rates the budget
    skipped (measure_chip_ab only runs the unpacked section when ~300 s remain)
    are backfilled from the in-round persisted measurement — otherwise the JSON
    would null a number this round already measured, defeating _save_chip_ab's
    purpose. chip_ab_source says exactly which of the two happened."""
    backfilled = {k: v for k, v in cached.items()
                  if k != "measured_at" and k not in fresh}
    out = {**backfilled, **fresh}
    out["chip_ab_source"] = (
        "measured_this_run" if not backfilled
        else f"measured_this_run+cached_{cached.get('measured_at', 'unknown')}")
    return out


def measure_chip_ab(dissector, pool, pool_spans, pack_fixed_len, batch_size,
                    h, w, layers, mean, std, budget_s: float) -> dict:
    """Chip-side forward+embed rates with device-resident input (no wire): what a
    real PCIe-attached host would see. PACKED first — its step program is already
    compiled (the harvest used it), so it costs only 9 steps; the UNPACKED step
    needs its own remote compile and only runs when `budget_s` allows (~300 s)."""
    import jax
    import jax.numpy as jnp

    from mammodissect.dissect.packing import pack_batch, pad_flat

    out = {}
    t_end = time.monotonic() + budget_s
    n_chip_batches = 8

    def _accs(widths):
        # fresh per section: the steps DONATE their accumulators, so a cached
        # reference would be a deleted buffer by the second section
        return (jnp.zeros((16 * batch_size, int(sum(widths))), jnp.float32),
                jnp.zeros((16 * batch_size, int(dissector.module.proj_dim)),
                          jnp.float32))

    # packed step: cached jit from the harvest — measurement only
    step_p, _n, widths = dissector.fused_resident_step_packed(
        (batch_size, h, w, 1), pack_fixed_len, layers, "avg", mean, std)
    a, e = _accs(widths)
    flat_np, meta_np = pack_batch(pool[:batch_size], spans=pool_spans[:batch_size])
    flat_dev = jax.device_put(pad_flat(flat_np, pack_fixed_len)[None, :])  # D=1
    meta_dev = jax.device_put(meta_np)
    a, e = step_p(dissector.variables, a, e, flat_dev, meta_dev, jnp.int32(0))
    _ = np.asarray(e[0, :1])
    t0 = time.perf_counter()
    for i in range(n_chip_batches):
        a, e = step_p(dissector.variables, a, e, flat_dev, meta_dev,
                      jnp.int32((i % 16) * batch_size))
    _ = np.asarray(e[0, :1])
    out["chip_side_packed_forward_img_per_s"] = round(
        n_chip_batches * batch_size / (time.perf_counter() - t0), 1)
    del flat_dev, meta_dev
    note(f"chip-side packed forward+embed: "
         f"{out['chip_side_packed_forward_img_per_s']} img/s")

    if time.monotonic() < t_end - 240:  # unpacked step: fresh remote compile
        step, _names, widths = dissector.fused_resident_step(
            (batch_size, h, w, 1), layers, "avg", mean, std)
        a, e = _accs(widths)
        u8_dev = jax.device_put(np.ascontiguousarray(pool[:batch_size]).reshape(-1))
        a, e = step(dissector.variables, a, e, u8_dev, jnp.int32(0))
        _ = np.asarray(e[0, :1])
        t0 = time.perf_counter()
        for i in range(n_chip_batches):
            a, e = step(dissector.variables, a, e, u8_dev,
                        jnp.int32((i % 16) * batch_size))
        _ = np.asarray(e[0, :1])
        out["chip_side_forward_img_per_s"] = round(
            n_chip_batches * batch_size / (time.perf_counter() - t0), 1)
        del u8_dev
        note(f"chip-side forward+embed: {out['chip_side_forward_img_per_s']} img/s")
    out["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    return out


def _wipe_cache(cache_dir: str, cache_key: str) -> int:
    """Remove every spilled cache file under this run's key (complete chunks AND
    partials) so the measured harvest covers every image over the wire. One
    helper for both the upfront wipe and the belt-and-braces re-wipe — the glob
    must track the _ChunkSpiller file naming in exactly one place."""
    import glob

    wiped = 0
    for p in glob.glob(os.path.join(cache_dir, f"{cache_key}_*")):
        try:
            os.remove(p)
            wiped += 1
        except OSError:
            pass
    return wiped


# Stage progress shared with the watchdog (the runtime's remote compile can wedge
# indefinitely after an earlier killed process; a blocked C call can't observe the
# deadline, so a daemon thread guarantees the final JSON line no matter what).
PROGRESS: dict = {"stage": "boot", "printed": False}
_EMIT_LOCK = __import__("threading").Lock()


# pid-scoped coordination files for the subprocess watchdog (see
# _start_process_watchdog): the sentinel says "the final JSON was printed", the
# status file carries the latest progress snapshot for its fallback record
_SENTINEL = f"/tmp/mammodissect_bench_{os.getpid()}.printed"
_STATUS = f"/tmp/mammodissect_bench_{os.getpid()}.status"


def _cleanup_watchdog_files():
    # graceful exits only — on a SIGKILL'd parent the files stay behind (pid-scoped,
    # a few hundred bytes) so the already-exiting child never misreads a missing
    # sentinel
    for p in (_SENTINEL, _STATUS, _STATUS + ".tmp"):
        try:
            os.remove(p)
        except OSError:
            pass


import atexit  # noqa: E402  (module-level: must outlive main())

atexit.register(_cleanup_watchdog_files)


def _write_status():
    """Best-effort atomic progress snapshot for the subprocess watchdog."""
    try:
        snap = {k: PROGRESS.get(k) for k in
                ("stage", "n_images", "cum_rate_img_per_s",
                 "last_rate_img_per_s", "rate_to_2048_img_per_s")}
        if PROGRESS.get("pending_result") is not None:
            snap["pending_result"] = PROGRESS["pending_result"]
        tmp = _STATUS + ".tmp"
        with open(tmp, "w") as f:
            json.dump(snap, f)
        os.replace(tmp, _STATUS)
    except (OSError, TypeError, ValueError):
        pass


def _emit_final(result):
    # atomic test-and-set: the watchdog and the main thread can race right at the
    # deadline, and stdout must carry exactly ONE final JSON line
    with _EMIT_LOCK:
        if PROGRESS["printed"]:
            return False
        PROGRESS["printed"] = True
    try:  # tell the subprocess watchdog stdout is covered BEFORE printing
        open(_SENTINEL, "w").close()
    except OSError:
        pass
    print(json.dumps(result), flush=True)
    return True


def _start_watchdog(deadline_s: float):
    import threading

    def run():
        while True:
            remain = T_PROC + deadline_s - time.monotonic()
            if PROGRESS["printed"]:
                return
            if remain <= 5:
                break
            time.sleep(min(remain - 5, 10))
        if PROGRESS["printed"]:
            return
        # a COMPLETE result staged before the post-harvest decoration stages
        # (chip A/B re-measurement can wedge on the remote compile helper's
        # executable materialization — observed 6-750 s) beats any fallback:
        # publish the real measured number, flagged with where the stall hit
        pending = PROGRESS.get("pending_result")
        if pending is not None:
            pending["detail"]["post_harvest_timeout"] = True
            pending["detail"]["stage_at_timeout"] = PROGRESS.get("stage")
            printed_by_watchdog = _emit_final(pending)
            sys.stderr.flush()
            sys.stdout.flush()
            if printed_by_watchdog:
                os._exit(3)
            return
        # the cumulative harvest average is the honest fallback: the LAST stride sits
        # in the relay's deepest throttle tier (observed 1.6 img/s while the run
        # averaged ~3x that), and a wedged transfer means the last stride never
        # completed at all
        rate = PROGRESS.get("cum_rate_img_per_s",
                            PROGRESS.get("last_rate_img_per_s", 0.0))
        printed_by_watchdog = _emit_final({
            "metric": "dissect_images_per_sec_per_chip",
            "value": round(float(rate), 2),
            "unit": "img/s/chip",
            "vs_baseline": round(float(rate) / BASELINE_IMG_PER_SEC_PER_CHIP, 2),
            "detail": {
                "watchdog_timeout": True,
                "stage": PROGRESS.get("stage"),
                "n_images_measured": PROGRESS.get("n_images", 0),
                "last_stride_img_per_s": round(
                    float(PROGRESS.get("last_rate_img_per_s", 0.0)), 2),
                "rate_to_2048_img_per_s": PROGRESS.get("rate_to_2048_img_per_s"),
                "elapsed_s": round(time.monotonic() - T_PROC, 1),
                "note": "runtime stalled (remote compile/transfer wedge); value is "
                        "the cumulative harvest rate observed before the stall, "
                        "0.0 if none was measured",
            },
        })
        sys.stderr.flush()
        sys.stdout.flush()
        if not printed_by_watchdog:
            return  # main won the race and already printed: let it exit normally
        os._exit(3)  # the runtime is wedged; a normal exit may never happen

    t = threading.Thread(target=run, daemon=True)
    t.start()
    return t


_PROC_WATCHDOG_HELPER = r'''
import json, os, signal, sys, time
wait_s, sentinel, status, ppid, baseline = (float(sys.argv[1]), sys.argv[2],
                                            sys.argv[3], int(sys.argv[4]),
                                            float(sys.argv[5]))
deadline = time.monotonic() + wait_s
while time.monotonic() < deadline:
    if os.path.exists(sentinel):
        sys.exit(0)
    try:
        os.kill(ppid, 0)  # parent gone -> nothing to guard
    except OSError:
        sys.exit(0)
    time.sleep(2)
if os.path.exists(sentinel):
    sys.exit(0)
try:
    os.kill(ppid, 0)  # parent finished (and cleaned up) in the last poll window
except OSError:
    sys.exit(0)
rate, n, stage, pending = 0.0, 0, "unknown", None
try:
    with open(status) as f:
        st = json.load(f)
    rate = float(st.get("cum_rate_img_per_s") or st.get("last_rate_img_per_s") or 0.0)
    n = int(st.get("n_images") or 0)
    stage = st.get("stage") or "unknown"
    pending = st.get("pending_result")
except Exception:
    pass
if isinstance(pending, dict) and "value" in pending:
    # a COMPLETE result was staged before a post-harvest decoration stage
    # wedged holding the GIL: publish the real measurement, flagged
    pending.setdefault("detail", {})["post_harvest_timeout"] = True
    pending["detail"]["process_watchdog"] = True
    pending["detail"]["stage_at_timeout"] = stage
    print(json.dumps(pending), flush=True)
    try:
        os.kill(ppid, signal.SIGKILL)
    except OSError:
        pass
    sys.exit(0)
print(json.dumps({
    "metric": "dissect_images_per_sec_per_chip",
    "value": round(rate, 2), "unit": "img/s/chip",
    "vs_baseline": round(rate / baseline, 2),
    "detail": {"process_watchdog": True, "stage": stage, "n_images_measured": n,
               "note": "parent stalled holding the GIL (in-process watchdog never "
                       "ran); value from the last status snapshot, 0.0 if none"},
}), flush=True)
try:
    os.kill(ppid, signal.SIGKILL)
except OSError:
    pass
'''


def _start_process_watchdog(deadline_s: float):
    """Last line of defense: a CHILD PROCESS that prints the fallback JSON if this
    process never does. The in-process watchdog thread cannot run while a wedged C
    call holds the GIL — observed with the remote backend-init stall (transfer
    stalls release it, init stalls do not) — but a subprocess has its own
    interpreter. It inherits stdout, polls the sentinel `_emit_final` touches
    before printing, and fires ~15 s after the in-process watchdog should have."""
    import subprocess

    wait_s = max(deadline_s - (time.monotonic() - T_PROC), 0.0) + 10.0
    subprocess.Popen(
        [sys.executable, "-c", _PROC_WATCHDOG_HELPER, str(wait_s), _SENTINEL,
         _STATUS, str(os.getpid()), str(BASELINE_IMG_PER_SEC_PER_CHIP)],
        stderr=subprocess.DEVNULL)  # stdout inherited: its one JSON line lands
        # in the same capture as ours would have


def partial_record(**kw):
    """Parseable progress record in the stderr tail: even a hard kill leaves a
    measured number on the record (stdout stays reserved for the ONE final line)."""
    print(json.dumps({"partial": True, **kw}), file=sys.stderr, flush=True)
    _write_status()


def summarize_timing(timing, tail_n=64):
    """Transport diagnostics: where per-batch time goes, overall and in the tail
    (the round-2 run decayed 32 -> ~3 img/s late; this localizes upload-throttle vs
    dispatch vs sync growth)."""
    if not timing:
        return {}
    def agg(rows):
        out = {}
        for k in ("assemble_s", "put_s", "step_s", "sync_s", "wire_bytes"):
            if k not in rows[0]:
                continue
            v = np.array([r[k] for r in rows])
            out[k] = {"mean": round(float(v.mean()), 4),
                      "p90": round(float(np.percentile(v, 90)), 4),
                      "total": round(float(v.sum()), 1)}
        return out
    return {"all": agg(timing), f"last_{tail_n}": agg(timing[-tail_n:])}


def main():
    # stage-elapsed ledger (VERDICT r4 weak #1): every pre-harvest second must be
    # attributable in the final JSON — the fields sum to ~elapsed_s (other_s is
    # the reported remainder)
    ledger = {"grant_wait_s": round(T_IMPORT - T_PROC, 1)}
    t_stage = time.monotonic()

    def stage_done(name):
        nonlocal t_stage
        now = time.monotonic()
        ledger[name] = round(now - t_stage, 1)
        t_stage = now

    import jax
    import jax.numpy as jnp

    # platform override FIRST: enable_compilation_cache touches
    # jax.default_backend(), which INITIALIZES the backend — with the axon
    # plugin that means acquiring the TPU grant, so a cpu smoke run must set
    # jax_platforms before any backend-touching call
    if os.environ.get("BENCH_PLATFORM"):  # test-only: e.g. cpu logic smoke
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

    from mammodissect.utils.jit_cache import enable_compilation_cache

    enable_compilation_cache()  # amortize the cold-compile across runs

    from mammodissect.dissect.dissectors import get_dissector
    from mammodissect.dissect.engine import (
        fused_harvest_embed_resident,
        score_resident,
    )

    # BENCH_IMAGE_H/W are test-only shrink knobs; the published number always runs
    # the canonical 1520x912 workload (the driver sets no overrides)
    h = int(os.environ.get("BENCH_IMAGE_H", 1520))
    w = int(os.environ.get("BENCH_IMAGE_W", 912))
    batch_size = int(os.environ.get("BENCH_BATCH_SIZE", 64))
    n_images = int(os.environ.get("BENCH_N_IMAGES", 10_000))
    sync_every = int(os.environ.get("BENCH_SYNC_EVERY", 4))
    # the r02 driver kill landed at ~29m43s after start => budget ~30 min; keep a
    # multi-minute margin for scoring + final print
    deadline_s = float(os.environ.get("BENCH_DEADLINE_S", 1440))
    score_reserve_s = float(os.environ.get("BENCH_SCORE_RESERVE_S", 90))
    cache_dir = os.environ.get("BENCH_CACHE_DIR", "/tmp/mammodissect_bench_cache")
    _start_watchdog(deadline_s)
    _start_process_watchdog(deadline_s)
    _write_status()
    pool_n = min(n_images, 1024)
    n_concepts = 762
    layers = [f"blocks.{i}" for i in range(39)]
    mean, std = 0.3089279, 0.25053555

    import warnings

    warnings.filterwarnings("ignore", message=".*toy WordPiece.*")
    stage_done("jax_import_s")
    dissector = get_dissector(
        "breastclip", image_shape=(h, w, 1), bert_layers=12, dtype=jnp.bfloat16
    )
    stage_done("model_build_s")

    note("pool (mammogram-shaped: ~40-60% black background)")
    PROGRESS["stage"] = "pool"
    pool, pool_spans, fill_fraction, pool_source = load_or_make_pool(
        cache_dir, pool_n, h, w)
    stage_done("pool_s")
    ledger["pool_source"] = pool_source
    note(f"pool fill fraction {fill_fraction:.3f} ({pool_source}, "
         f"{ledger['pool_s']}s)")

    # packed-wire bucket: ONE static flat length covering every batch of the run
    # (batches cycle the pool in order, so the per-batch payload is precomputable) —
    # a single compile instead of one per quantum bucket
    per_img_bytes = np.array([int(s[1].sum()) for s in pool_spans], np.int64)
    # max payload over EVERY cyclic window of batch_size pool images (covers any
    # batch alignment, including pool sizes not divisible by the batch)
    reps = int(np.ceil((len(per_img_bytes) + batch_size) / len(per_img_bytes)))
    cyc = np.tile(per_img_bytes, reps)[: len(per_img_bytes) + batch_size]
    cs = np.concatenate([[0], np.cumsum(cyc)])
    max_payload = int((cs[batch_size:] - cs[:-batch_size]).max())
    pack_fixed_len = int(((max_payload + (1 << 20) - 1) >> 20) << 20)
    raw_batch_bytes = batch_size * h * w
    note(f"packed bucket {pack_fixed_len / 1e6:.1f} MB vs raw {raw_batch_bytes / 1e6:.1f} MB")
    PROGRESS["stage"] = "warmup_compile"

    # warmup/compile: one chunk's worth through the PACKED resident step (the step
    # program is probe-size independent — fixed-capacity chunks; the warm batch is
    # the run's first pool batch so it compiles the run's exact bucket), includes
    # remote-compile warmup. This is the ONLY pre-harvest device work: the
    # chip-side A/B measurements moved AFTER the timed harvest (VERDICT r4 #1 —
    # they cost an extra remote compile + measurement loops that starved the r4
    # capture's harvest window; deferred, they publish from the same process when
    # budget allows and load the in-round persisted measurement when it doesn't).
    note("warmup/compile")
    warm = CyclicProbe(pool, batch_size, mean, std, spans=pool_spans)
    t0 = time.perf_counter()
    _, we, *_ = fused_harvest_embed_resident(dissector, warm, layers, "avg", batch_size,
                                             wire_pack="on",
                                             pack_fixed_len=pack_fixed_len)
    _ = np.asarray(we[-1][0, :1])  # sync: remote compile completes asynchronously
    vocab = int(dissector.module.vocab_size)
    dissector.embed_tokens(
        np.ones((n_concepts, 64), np.int32), np.ones((n_concepts, 64), np.int32)
    )
    compile_s = time.perf_counter() - t0
    stage_done("warmup_compile_s")
    partial_record(stage="warmup_done", compile_s=round(compile_s, 1),
                   elapsed_s=round(time.monotonic() - T_PROC, 1))

    # ---- timed: the 10k-image harvest through the resident engine path, bounded by
    # the wall-clock budget; completed chunks spill to the cache (resume on rerun) ----
    harvest_deadline = T_PROC + deadline_s - score_reserve_s
    PROGRESS["stage"] = "harvest"
    ledger["harvest_start_elapsed_s"] = round(time.monotonic() - T_PROC, 1)
    note(f"timed harvest of {n_images} "
         f"(budget {harvest_deadline - time.monotonic():.0f}s; "
         f"pre-harvest ledger {ledger})")
    probe = CyclicProbe(pool, n_images, mean, std, spans=pool_spans)
    cache_key = f"bench_{n_images}x{h}x{w}_b{batch_size}_pk"
    # CACHE-CLEAN published number (VERDICT r3 weak #1): the r03 capture resumed
    # 3,024 images from a stale partial cache, shrinking the upload and dodging the
    # relay's deepest throttle tier. Wipe EVERYTHING under this run's cache_key —
    # complete chunks AND partials — before the timed harvest; the in-run spill
    # stays (crash resumability for the watchdog record), but the published rate
    # always covers every image over the wire THIS run.
    wiped = _wipe_cache(cache_dir, cache_key)
    if wiped:
        note(f"wiped {wiped} stale cache files for a clean-cache measurement")
    timing: list = []

    last = {"n": 0, "t": time.perf_counter()}

    def harvest_log(msg):
        note(msg)
        if "/" in msg and "[resident]" in msg:  # progress line: attach stride rate
            try:
                seen = int(msg.split("]")[1].split("/")[0])
            except (ValueError, IndexError):
                return
            now = time.perf_counter()
            dn, dt = seen - last["n"], now - last["t"]
            PROGRESS["n_images"] = seen
            if dn > 0 and dt > 0:
                PROGRESS["last_rate_img_per_s"] = dn / dt
            # cumulative rate since the first progress line of THIS harvest pass
            # (excludes resumed chunks; reset if a cache-wipe re-harvest restarted)
            if "first" not in last or seen < last["first"][0]:
                last["first"] = (seen, now)
            f_n, f_t = last["first"]
            if seen > f_n and now > f_t:
                PROGRESS["cum_rate_img_per_s"] = (seen - f_n) / (now - f_t)
                # stable cross-round anchor: the relay throttle deepens with
                # cumulative upload, so the whole-run average depends on how LONG
                # the deadline let the run go; the rate up to a fixed 2048-image
                # mark (~2.8 GB, spool + first throttle tier) is comparable
                # between rounds regardless of deadline budget
                if seen >= 2048 and "rate_to_2048_img_per_s" not in PROGRESS:
                    PROGRESS["rate_to_2048_img_per_s"] = round(
                        PROGRESS["cum_rate_img_per_s"], 2)
            if dn > 0 and last["n"] > 0:
                tail = summarize_timing(timing[-sync_every:], tail_n=sync_every)
                stride = tail.get(f"last_{sync_every}", {})
                note(f"  stride: {dn / dt:.1f} img/s | "
                     + " ".join(f"{k}={v['mean']:.3f}s" for k, v in stride.items()))
            last["n"], last["t"] = seen, now
            _write_status()

    t0 = time.perf_counter()
    act_chunks, emb_chunks, names, widths, n_seen = fused_harvest_embed_resident(
        dissector, probe, layers, "avg", batch_size, sync_every=sync_every,
        log=harvest_log, cache_dir=cache_dir, cache_key=cache_key,
        deadline=harvest_deadline, timing=timing,
        wire_pack="on", pack_fixed_len=pack_fixed_len,
    )
    if not timing and n_seen:
        # belt-and-braces: the upfront wipe should make this unreachable, but the
        # published rate must NEVER come from disk — re-wipe and re-harvest
        note("cache fully covers the probe; re-measuring with a fresh harvest")
        _wipe_cache(cache_dir, cache_key)
        t0 = time.perf_counter()
        act_chunks, emb_chunks, names, widths, n_seen = fused_harvest_embed_resident(
            dissector, probe, layers, "avg", batch_size, sync_every=sync_every,
            log=harvest_log, cache_dir=cache_dir, cache_key=cache_key,
            deadline=harvest_deadline, timing=timing,
            wire_pack="on", pack_fixed_len=pack_fixed_len,
        )
    _ = np.asarray(emb_chunks[-1][0, :1])  # final sync
    harvest_s = time.perf_counter() - t0
    n_fresh = len(timing) * batch_size  # images actually forwarded THIS run
    n_resumed = n_seen - min(n_fresh, n_seen)
    partial_record(stage="harvest_done", n_images=n_seen, n_resumed=n_resumed,
                   harvest_s=round(harvest_s, 1),
                   elapsed_s=round(time.monotonic() - T_PROC, 1))

    stage_done("harvest_wall_s")

    # ---- timed: concept-text embedding through the real BERT tower ----
    PROGRESS["stage"] = "text_embed"
    t0 = time.perf_counter()
    rng = np.random.default_rng(0)
    token_ids = rng.integers(1, vocab, size=(n_concepts, 64), dtype=np.int32)
    attn = np.ones_like(token_ids)
    text_feats = dissector.embed_tokens(token_ids, attn)
    text_s = time.perf_counter() - t0

    # ---- scoring: all 39 layers in ONE segmented program, on device ----
    # first call pays the scorer compile (reported separately); the hoisted jitted
    # scorer makes the second call a pure cache hit (measured)
    note("scoring")
    PROGRESS["stage"] = "score"
    t0 = time.perf_counter()
    score_resident(act_chunks, emb_chunks, n_seen, text_feats, widths, "soft_wpmi")
    score_compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    top_vals, top_idx, img_idx = score_resident(
        act_chunks, emb_chunks, n_seen, text_feats, widths, "soft_wpmi"
    )
    score_s = time.perf_counter() - t0
    assert top_idx.shape[0] == sum(widths) and np.isfinite(top_vals).all()

    stage_done("text_score_s")

    # e2e rate over the images actually processed THIS run (resumed chunks came from
    # disk, not the wire — counting them would inflate the measured rate)
    n_rate = max(n_fresh if n_resumed else n_seen, 1)
    harvest_rate = min(n_rate, n_seen) / harvest_s
    total_s = harvest_s + text_s + score_s
    value = min(n_rate, n_seen) / total_s

    wire_bytes_total = int(sum(t.get("wire_bytes", 0) for t in timing))
    wire_per_image = wire_bytes_total / max(n_fresh, 1)
    per_chip_images = 10_000 / 8  # the north-star workload, regardless of BENCH_N_IMAGES

    def build_result(ab: dict) -> dict:
        """The complete publishable record from the measurements already in hand.

        Called twice: once BEFORE the chip-A/B decoration stage (staged as
        PROGRESS['pending_result'] so a wedge in the remote compile helper —
        observed 6-750 s of silent executable materialization — publishes the
        real measured number instead of a skeleton fallback), and once after
        with the fresh/merged A/B rates."""
        chip_side_rate = ab.get("chip_side_forward_img_per_s")
        chip_side_packed_rate = ab.get("chip_side_packed_forward_img_per_s")
        # v5e-8 projection (the north-star's actual hardware): each chip's host
        # uploads n/8 of the probe — valid for the PACKED wire because the payload
        # packs per data-shard group and ships [D, L] sharded P('data') (each chip
        # receives only its own shard's packed bytes; a replicated payload would
        # have made per-chip upload n_devices x wire_per_image). Per-shard bucket
        # padding adds <= 1/16 of a shard's raw bytes — inside this projection's
        # margin. Compute runs DP-sharded over Mesh('data') through the SAME
        # resident path (sharded accumulators + shard_map unpack — dryrun_multichip
        # runs it; tests/test_packing.py asserts sharded==single-device), scoring
        # is one segmented SPMD program.
        v5e8_s = None
        chip_rates = [r for r in (chip_side_rate, chip_side_packed_rate) if r]
        if chip_rates:
            per_chip_upload_s = per_chip_images * wire_per_image / (50e6)
            per_chip_compute_s = per_chip_images / min(chip_rates)
            v5e8_s = round(
                max(per_chip_upload_s, per_chip_compute_s) + text_s + score_s, 1)
        elapsed_total = time.monotonic() - T_PROC
        # every duration field must sum to ~elapsed_s; harvest_start_elapsed_s is a
        # TIMESTAMP (cross-check: it should equal the pre-harvest durations' sum)
        led = dict(ledger)
        led["other_s"] = round(
            elapsed_total - sum(v for k, v in led.items()
                                if isinstance(v, (int, float))
                                and k != "harvest_start_elapsed_s"), 1)
        return {
            "metric": "dissect_images_per_sec_per_chip",
            "value": round(float(value), 2),
            "unit": "img/s/chip",
            "vs_baseline": round(float(value / BASELINE_IMG_PER_SEC_PER_CHIP), 2),
            "detail": {
                "n_images_measured": n_seen,
                "n_images_resumed_from_cache": n_resumed,
                "wire_pack": True,
                "wire_bytes_total": wire_bytes_total,
                "wire_fraction_of_raw": round(wire_per_image / (h * w), 4),
                "pool_fill_fraction": round(float(fill_fraction), 4),
                "pack_fixed_len": pack_fixed_len,
                "chip_side_packed_forward_img_per_s": chip_side_packed_rate,
                "deadline_s": deadline_s,
                "deadline_hit": n_seen < n_images,
                "harvest_s": round(harvest_s, 1),
                "harvest_img_per_s": round(float(harvest_rate), 2),
                "rate_to_2048_img_per_s": PROGRESS.get("rate_to_2048_img_per_s"),
                "chip_side_forward_img_per_s": chip_side_rate,
                "chip_ab_source": ab.get("chip_ab_source"),
                "v5e8_projected_10k_wall_s": v5e8_s,
                "text_embed_s": round(text_s, 2),
                "score_all_39_layers_s": round(score_s, 2),
                "total_dissection_s": round(total_s, 1),
                "compile_s": round(compile_s, 1),
                "score_compile_s": round(score_compile_s, 1),
                "setup_ledger": led,
                "elapsed_s": round(elapsed_total, 1),
                "batch_timing": summarize_timing(timing),
                "image_size": [h, w],
                "batch_size": batch_size,
                "layers": len(layers),
                "units": int(sum(widths)),
                "concepts": n_concepts,
            },
        }

    def _cached_ab() -> dict:
        ab = _load_chip_ab(cache_dir, h, w, batch_size)
        ab["chip_ab_source"] = (f"cached_{ab['measured_at']}" if "measured_at" in ab
                                else "unavailable")
        return ab

    # stage the COMPLETE result before the decoration stage: from here on, a wedge
    # or crash publishes this record (with in-round cached A/B rates), never a
    # skeleton fallback that discards a finished measurement
    PROGRESS["pending_result"] = build_result(_cached_ab())
    _write_status()

    # ---- chip-side A/B: AFTER the timed harvest (it no longer eats the capture's
    # harvest window); measured fresh when budget allows, else loaded from the
    # in-round persisted measurement ----
    PROGRESS["stage"] = "chip_ab"
    remaining = T_PROC + deadline_s - time.monotonic()
    ab_min_s = float(os.environ.get("BENCH_CHIP_AB_MIN_S", 60))
    ab = {}
    if remaining >= ab_min_s:
        try:
            ab = measure_chip_ab(dissector, pool, pool_spans, pack_fixed_len,
                                 batch_size, h, w, layers, mean, std,
                                 budget_s=remaining - 30)
            cached = _load_chip_ab(cache_dir, h, w, batch_size)
            _save_chip_ab(cache_dir, h, w, batch_size, {**cached, **ab})
            ab = _merge_chip_ab(ab, cached)
        except Exception as e:  # noqa: BLE001 — decoration must not kill the number
            note(f"chip A/B failed ({type(e).__name__}: {e}); using cached values")
            ab = {}
    if not ab:
        ab = _cached_ab()
    stage_done("chip_ab_s")
    _emit_final(build_result(ab))


def run_main():
    """main() wrapped so a crash still publishes: stdout must ALWAYS carry one JSON."""
    try:
        main()
    except BaseException as e:  # noqa: BLE001
        # e.g. the runtime swallows a failed backend init at interpreter startup
        # and jax.devices() then raises in get_dissector: without this, a crash
        # publishes nothing (the watchdogs only cover deadline/stall, not a fast
        # exception exit)
        import traceback

        traceback.print_exc(file=sys.stderr)
        pending = PROGRESS.get("pending_result")
        if pending is not None:
            # the harvest finished and a complete record was staged: a crash in a
            # post-harvest decoration stage must not discard the measurement
            pending["detail"]["post_harvest_error"] = f"{type(e).__name__}: {e}"[:400]
            _emit_final(pending)
            raise SystemExit(4)
        rate = float(PROGRESS.get("cum_rate_img_per_s", 0.0))
        _emit_final({
            "metric": "dissect_images_per_sec_per_chip",
            "value": round(rate, 2),
            "unit": "img/s/chip",
            "vs_baseline": round(rate / BASELINE_IMG_PER_SEC_PER_CHIP, 2),
            "detail": {"error": f"{type(e).__name__}: {e}"[:400],
                       "stage": PROGRESS.get("stage"),
                       "n_images_measured": PROGRESS.get("n_images", 0),
                       "note": "run crashed; value is the cumulative harvest rate "
                               "observed before the crash, 0.0 if none"},
        })
        raise SystemExit(4)


if __name__ == "__main__":
    run_main()
