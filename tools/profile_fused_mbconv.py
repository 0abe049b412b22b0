"""A/B measurement of the fused expand+depthwise Pallas kernel vs the XLA subgraph
(VERDICT r3 "measure the fused-MBConv kernel instead of projecting it").

Geometries are the two hottest B5 stages from docs/PERF.md's per-stage ledger:
  stage 2 (blocks 3-7):  380 x 228, Cin 40,  expand 240, k5/s1  (~22 ms/block of a
                          ~16 ms VPU bound — the biggest marginal cost)
  stage 3 (blocks 8-12): 190 x 114, Cin 64,  expand 384, k5/s1

For each: numerics check (Pallas vs XLA, bf16 tolerance) then timed loops with
device-resident inputs (no wire). Decision gate: enable in the tower only if the
fused kernel is >1.1x on its subgraph; either way the measured numbers go to
docs/PERF.md.

Run on the TPU host: python tools/profile_fused_mbconv.py
(env: PROF_BATCH default 64, PROF_REPS default 8, PROF_T row-tile override)
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

    from mammodissect.ops.pallas_mbconv import (
        fold_bn,
        fused_expand_dw,
        xla_expand_dw,
    )

    B = int(os.environ.get("PROF_BATCH", 64))
    reps = int(os.environ.get("PROF_REPS", 8))
    t_override = os.environ.get("PROF_T")

    geoms = [
        ("stage2(b3-7)", 380, 228, 40, 240, 19),
        ("stage3(b8-12)", 190, 114, 64, 384, 19),
    ]

    for name, h, w, cin, cexp, t in geoms:
        t = int(t_override) if t_override else t
        rng = np.random.default_rng(0)
        x = jax.device_put(jnp.asarray(
            rng.normal(size=(B, h, w, cin)).astype(np.float32) * 0.1, jnp.bfloat16))
        w_exp = rng.normal(size=(cin, cexp)).astype(np.float32) * 0.05
        w_dw = rng.normal(size=(5, 5, cexp)).astype(np.float32) * 0.05
        s1, b1 = fold_bn(rng.uniform(0.5, 1.5, cexp), rng.normal(size=cexp) * 0.1,
                         rng.normal(size=cexp) * 0.1, rng.uniform(0.5, 1.5, cexp))
        s2, b2 = fold_bn(rng.uniform(0.5, 1.5, cexp), rng.normal(size=cexp) * 0.1,
                         rng.normal(size=cexp) * 0.1, rng.uniform(0.5, 1.5, cexp))
        args = (x, w_exp, s1, b1, w_dw, s2, b2)

        def timed(fn, label, **kw):
            t0 = time.perf_counter()
            out = fn(*args, **kw)
            _ = np.asarray(out[0, 0, 0, :1])  # sync: block_until_ready is a no-op here
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _i in range(reps):
                out = fn(*args, **kw)
            _ = np.asarray(out[0, 0, 0, :1])
            ms = (time.perf_counter() - t0) / reps * 1e3
            print(f"  {label:8s} {ms:8.2f} ms/call  (compile {compile_s:.1f}s)",
                  flush=True)
            return out, ms

        print(f"[{name}] B={B} {h}x{w} {cin}->{cexp} k5/s1 t={t}", flush=True)
        ref, ms_xla = timed(xla_expand_dw, "xla")
        got, ms_pal = timed(fused_expand_dw, "pallas", t=t)
        d = np.abs(np.asarray(ref[:2], np.float32) - np.asarray(got[:2], np.float32))
        scale = float(np.abs(np.asarray(ref[:2], np.float32)).mean())
        print(f"  numerics: max|diff| {d.max():.4g} mean {d.mean():.4g} "
              f"(ref scale {scale:.4g})", flush=True)
        print(f"  speedup xla/pallas = {ms_xla / ms_pal:.2f}x", flush=True)


if __name__ == "__main__":
    main()
