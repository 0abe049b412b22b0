"""Measured training-step throughput of the classifier fine-tune stack on a real
TPU chip — the reference recipe's geometry (BreastClipClassifier B5, 1520x912
grayscale, AdamW + warmup-cosine, weighted BCE; `lumi_single_gpu_train_classifier.py`)
at batch 8 (the reference's batch size) and larger TPU-friendly batches, with and
without MBConv rematerialization.

Timing uses device-resident input batches (put once, reused) so the number is the
chip-side step rate — what a PCIe-attached host sees; this environment's relay wire
is measured separately in bench.py. block_until_ready is a no-op on this runtime, so
completion is observed by a 1-element host fetch of the loss.

Run on the TPU host: python tools/profile_train_step.py
  env knobs: PROF_BATCHES="8,32", PROF_REMAT="0,1", PROF_REPS=6
Results land in docs/PERF.md by hand — measurement tool, not a test.
"""
from __future__ import annotations

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

    h, w = 1520, 912
    batches = [int(b) for b in os.environ.get("PROF_BATCHES", "8,32").split(",")]
    remats = [int(r) for r in os.environ.get("PROF_REMAT", "0,1").split(",")]
    reps = int(os.environ.get("PROF_REPS", "6"))

    print(f"# BreastClipClassifier B5 fine-tune step, {h}x{w} bf16, AdamW "
          f"(weighted BCE pos_weight 15.57), real chip")
    for remat in remats:
        for b in batches:
            module = BreastClipClassifierModule(
                variant="efficientnet-b5", n_class=1, remat=bool(remat),
                dtype=jnp.bfloat16,
            )
            t0 = time.perf_counter()
            variables = jax.jit(module.init)(
                jax.random.PRNGKey(0), jnp.ones((1, h, w, 1), jnp.float32))
            variables = {"params": variables["params"],
                         "batch_stats": variables.get("batch_stats", {})}
            tx = make_optimizer(lr=5e-5, weight_decay=1e-4, warmup_steps=10,
                                total_steps=1000)
            trainer = Trainer(module, variables, tx, loss_kind="bce",
                              pos_weight=15.57)
            rng = np.random.default_rng(0)
            # pre-put the batch on device: jnp.asarray inside train_batch is then a
            # no-op, so the timed loop measures the CHIP-side step, not this
            # environment's relay upload (44 MB/step at batch 8 would dominate)
            images = jax.device_put(
                jnp.asarray(rng.normal(size=(b, h, w, 1)), jnp.float32))
            labels = np.asarray(rng.integers(0, 2, size=(b,)), np.float32)
            try:
                loss = trainer.train_batch(images, labels)  # compile + warmup
            except Exception as e:  # OOM at this batch/remat combination
                print(f"remat={remat} batch={b:3d}   FAILED: "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)
                continue
            compile_s = time.perf_counter() - t0
            # steady-state: reuse the same host batch (upload rides the timed loop
            # on this runtime; chip-side rate dominates once jit async pipelines)
            t0 = time.perf_counter()
            for _ in range(reps):
                loss = trainer.train_batch(images, labels)
            dt = (time.perf_counter() - t0) / reps
            print(f"remat={remat} batch={b:3d}   {dt*1e3:8.1f} ms/step   "
                  f"{b/dt:6.1f} img/s   loss={loss:.4f}   [compile {compile_s:.0f}s]",
                  flush=True)
            del trainer


if __name__ == "__main__":
    main()
