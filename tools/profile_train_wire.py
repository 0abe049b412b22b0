"""Measured E2E (wire-inclusive) fine-tune step rate on a real TPU chip —
f32 vs u8 input wire at the reference recipe (BreastClipClassifier B5,
1520x912 grayscale, batch 8, AdamW + warmup-cosine, weighted BCE;
`Finetune/lumi_single_gpu_train_classifier.py:54-68`).

This is the training-side counterpart of bench.py's harvest decomposition
(VERDICT r4 weak #3): each step is timed as
  put_s   host->device transfer of the image batch (+ labels/weights)
  step_s  dispatch of the jitted train step
  sync_s  completion wait (1-element loss fetch; block_until_ready is a no-op
          on this runtime)
and the wire bytes per step are reported, so the published training img/s is
decomposed exactly like the harvest's.

The batch content is mammogram-shaped (same half-ellipse generator as bench.py)
— irrelevant for f32/u8 wire sizes (both are dense frames) but it keeps the
min-max normalization realistic.

Run on the TPU host:  python tools/profile_train_wire.py
  env knobs: PROF_BATCH=8 PROF_STEPS=12 PROF_WIRES="f32,u8" PROF_H/PROF_W
Prints one JSON line per wire; results land in docs/PERF.md by hand.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from mammodissect.utils.jit_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from mammodissect.models.classifier import BreastClipClassifierModule
    from mammodissect.train.trainer import Trainer, make_optimizer

    h = int(os.environ.get("PROF_H", 1520))
    w = int(os.environ.get("PROF_W", 912))
    b = int(os.environ.get("PROF_BATCH", 8))
    n_steps = int(os.environ.get("PROF_STEPS", 12))
    wires = os.environ.get("PROF_WIRES", "f32,u8").split(",")
    mean, std = 0.3089279, 0.25053555

    from bench import make_mammo_pool

    pool_u8, _, fill = make_mammo_pool(2 * b, h, w)
    print(f"# pool fill {fill:.2f}; {h}x{w} batch {b}, {n_steps} timed steps",
          file=sys.stderr)

    module = BreastClipClassifierModule(variant="efficientnet-b5", n_class=1,
                                        remat=True, dtype=jnp.bfloat16)
    variables = jax.jit(module.init)(
        jax.random.PRNGKey(0), jnp.ones((1, h, w, 1), jnp.float32))
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}
    labels = (np.arange(b) % 2).astype(np.float32)
    weights = np.ones((b,), np.float32)

    for wire in wires:
        tx = make_optimizer(lr=5e-5, weight_decay=1e-4, warmup_steps=10,
                            total_steps=1000)
        trainer = Trainer(module, {k: v for k, v in variables.items()}, tx,
                          loss_kind="bce", pos_weight=15.57, input_wire=wire,
                          norm_mean=mean, norm_std=std)

        def host_batch(i):
            u8 = np.ascontiguousarray(
                np.stack([pool_u8[(i * b + j) % len(pool_u8)] for j in range(b)]))
            if wire == "u8":
                return u8
            # host-side normalize, like the f32 ClassifierDataset path
            x = u8.astype(np.float32) / 255.0
            lo = x.reshape(b, -1).min(1)[:, None, None, None]
            hi = x.reshape(b, -1).max(1)[:, None, None, None]
            x = np.where(hi > lo, (x - lo) / np.maximum(hi - lo, 1e-12), 0.0)
            return ((x - mean) / std).astype(np.float32)

        # warmup/compile (not timed against the wire)
        t0 = time.perf_counter()
        trainer.train_batch(host_batch(0), labels)
        compile_s = time.perf_counter() - t0

        rows = []
        for i in range(1, n_steps + 1):
            imgs = host_batch(i)
            t0 = time.perf_counter()
            dev = jax.device_put(imgs)
            _ = np.asarray(dev.reshape(-1)[:1])  # force the transfer to finish
            t1 = time.perf_counter()
            # hand the device array to the trainer: its jnp.asarray is a no-op
            loss = trainer.train_batch(dev, labels)
            t2 = time.perf_counter()
            assert np.isfinite(loss)
            rows.append({"put_s": t1 - t0, "step_sync_s": t2 - t1,
                         "wire_bytes": imgs.nbytes + labels.nbytes + weights.nbytes})

        def mean_of(k):
            return float(np.mean([r[k] for r in rows]))

        total_s = mean_of("put_s") + mean_of("step_sync_s")
        print(json.dumps({
            "wire": wire,
            "img_per_s_e2e": round(b / total_s, 2),
            "put_s_mean": round(mean_of("put_s"), 4),
            "step_sync_s_mean": round(mean_of("step_sync_s"), 4),
            "wire_mb_per_step": round(mean_of("wire_bytes") / 1e6, 2),
            "compile_s": round(compile_s, 1),
            "batch": b, "image_size": [h, w], "steps_timed": n_steps,
        }), flush=True)


if __name__ == "__main__":
    main()
