"""Per-stage timing of the B5 fused-forward on a real TPU chip.

The chip-side dissection forward runs ~177 img/s at 1520x912 bf16 (docs/PERF.md) with
~6-8% MXU utilization — the tower is VPU/HBM-bound. This tool localizes WHERE: it
compiles prefix towers (stem, then stem+blocks[:k] at each of B5's 7 stage
boundaries) and reports the marginal time of each stage, plus an A/B of the
depthwise convs against an equivalent masked DENSE conv (9*C^2 MACs instead of 9*C —
trades idle-MXU cycles for VPU cycles; bit-equivalent when the off-diagonal taps are
zero, so it is a legal drop-in if it wins).

Run on the TPU host:  python tools/profile_b5_stages.py  (env knobs: PROF_BATCH,
PROF_STAGES=prefix list; the dense-depthwise A/B runs by default, PROF_DENSE=0
skips it — it costs two extra full-res compiles and ~GBs of relay upload).
Results land in docs/PERF.md by hand — this is a measurement tool, not a test.
"""
from __future__ import annotations

import os
import sys
import time
from typing import Any, Tuple

import numpy as np

# `python tools/profile_b5_stages.py` puts tools/ (not the repo root) on sys.path,
# and PYTHONPATH=/root/repo breaks the TPU plugin discovery on this host — so
# bootstrap the import path here instead.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from mammodissect.utils.jit_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from mammodissect.models.efficientnet import (
        EFFICIENTNET_PARAMS,
        EfficientNet,
        MBConvBlock,
        StemConv,
    )
    from mammodissect.models.layers import SqueezeExcite, round_filters

    H, W = 1520, 912
    B = int(os.environ.get("PROF_BATCH", 64))
    variant = "efficientnet-b5"
    tower = EfficientNet(variant=variant, in_channels=1, dtype=jnp.bfloat16)
    blocks = tower.block_args
    stem_pad, pads = tower._paddings((H, W))
    stem_filters = round_filters(32, EFFICIENTNET_PARAMS[variant][0])

    class DenseDWBlock(nn.Module):
        """MBConvBlock with the depthwise conv replaced by a DENSE kxk conv of the
        same shape contract (timing probe: dense kernel values are irrelevant for
        wall-clock; a masked dense kernel would be numerically identical)."""

        args: Any
        padding: Any
        dtype: Any = jnp.bfloat16

        @nn.compact
        def __call__(self, x, train=False, drop_rate=0.0):
            ba = self.args
            inp = x
            c_in = x.shape[-1]
            c_exp = c_in * ba.expand_ratio

            def bn(name):
                return nn.BatchNorm(use_running_average=True, momentum=0.99,
                                    epsilon=1e-3, name=name, dtype=self.dtype)

            if ba.expand_ratio != 1:
                x = nn.Conv(c_exp, (1, 1), use_bias=False, name="expand_conv",
                            dtype=self.dtype)(x)
                x = jax.nn.silu(bn("bn0")(x))
            x = nn.Conv(c_exp, (ba.kernel_size, ba.kernel_size),
                        strides=(ba.stride, ba.stride), padding=self.padding,
                        use_bias=False, name="dense_dw", dtype=self.dtype)(x)
            x = jax.nn.silu(bn("bn1")(x))
            if ba.se_ratio and 0 < ba.se_ratio <= 1:
                x = SqueezeExcite(max(1, int(c_in * ba.se_ratio)),
                                  dtype=self.dtype, name="se")(x)
            x = nn.Conv(ba.output_filters, (1, 1), use_bias=False,
                        name="project_conv", dtype=self.dtype)(x)
            x = bn("bn2")(x)
            if ba.id_skip and ba.stride == 1 and c_in == ba.output_filters:
                x = x + inp
            return x

    def make_prefix(n_blocks: int, dense_below: int = 0):
        class Prefix(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = StemConv(stem_filters, padding=stem_pad, name="stem_conv",
                             dtype=jnp.bfloat16)(x)
                x = jax.nn.silu(nn.BatchNorm(use_running_average=True, momentum=0.99,
                                             epsilon=1e-3, name="stem_bn",
                                             dtype=jnp.bfloat16)(x))
                for i, ba in enumerate(blocks[:n_blocks]):
                    cls = DenseDWBlock if i < dense_below else MBConvBlock
                    kw = {} if i < dense_below else dict(bn_momentum=0.99, bn_eps=1e-3)
                    x = cls(ba, padding=pads[i], dtype=jnp.bfloat16,
                            name=f"blocks_{i}", **kw)(x, False, 0.0)
                # tiny fp32 residual: forces full materialization, cheap to fetch
                return jnp.mean(x.astype(jnp.float32), axis=(1, 2))

        return Prefix()

    rng = np.random.default_rng(0)
    x_host = np.asarray(rng.normal(size=(B, H, W, 1)), np.float32)

    def time_prefix(n_blocks: int, dense_below: int = 0, reps: int = 4) -> Tuple[float, float]:
        """(seconds per forward, compile seconds)."""
        mod = make_prefix(n_blocks, dense_below)
        t0 = time.perf_counter()
        # init at a small spatial size: param shapes depend only on channels, and a
        # full-res init would pay a second large compile per prefix
        variables = jax.jit(mod.init)(
            jax.random.PRNGKey(0), jnp.asarray(x_host[:1, :128, :128]))
        fwd = jax.jit(mod.apply)
        x_dev = jax.device_put(jnp.asarray(x_host))
        out = fwd(variables, x_dev)
        _ = np.asarray(out[0, :1])  # sync (block_until_ready is a no-op here)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fwd(variables, x_dev)
        _ = np.asarray(out[0, :1])
        return (time.perf_counter() - t0) / reps, compile_s

    stage_ends = [0]
    seen = 0
    from mammodissect.models.efficientnet import BASE_BLOCK_ARGS
    from mammodissect.models.layers import round_repeats

    for ba in BASE_BLOCK_ARGS:
        seen += round_repeats(ba.num_repeat, EFFICIENTNET_PARAMS[variant][1])
        stage_ends.append(seen)
    if os.environ.get("PROF_STAGES"):
        stage_ends = [int(s) for s in os.environ["PROF_STAGES"].split(",")]

    print(f"# B5 per-stage forward timing  batch={B}  {H}x{W} bf16  "
          f"(stage ends: {stage_ends})")
    prev_t = 0.0
    rows = []
    for n in stage_ends:
        t, c = time_prefix(n)
        rows.append((n, t))
        print(f"blocks[:{n:2d}]  {t*1e3:8.1f} ms/fwd   marginal {max(t-prev_t,0)*1e3:8.1f} ms"
              f"   ({B/t:7.1f} img/s cumulative)   [compile {c:.1f}s]", flush=True)
        prev_t = t

    if os.environ.get("PROF_DENSE", "1") != "0":
        # A/B: dense-masked depthwise through the first two stages (the low-channel,
        # high-resolution blocks where the VPU depthwise hurts most)
        n_ab = stage_ends[2] if len(stage_ends) > 2 else stage_ends[-1]
        t_dw, _ = time_prefix(n_ab, dense_below=0)
        t_dense, c = time_prefix(n_ab, dense_below=n_ab)
        print(f"\n# depthwise-vs-dense A/B over blocks[:{n_ab}]")
        print(f"depthwise {t_dw*1e3:8.1f} ms    dense {t_dense*1e3:8.1f} ms   "
              f"({'dense WINS' if t_dense < t_dw else 'depthwise wins'}; "
              f"ratio {t_dense/t_dw:.2f})   [dense compile {c:.1f}s]")


if __name__ == "__main__":
    main()
