"""Headline benchmark: Mammo-CLIP dissection throughput on one TPU chip.

Workload (BASELINE.md north-star): EfficientNet-B5 target at 1520x912 grayscale,
pooled activations of ALL 39 MBConv blocks harvested in one jitted forward
(the hot loop of `concept_vit/utils.py:151-200`), then soft-WPMI scoring of
762 concepts for every unit of the widest layer.

Prints ONE JSON line:
  {"metric": "dissect_images_per_sec_per_chip", "value": N, "unit": "img/s/chip",
   "vs_baseline": R}
vs_baseline is measured against the north-star rate implied by "10k-image D_probe,
full dissection < 5 min on v5e-8" => 33.3 img/s on 8 chips = 4.17 img/s/chip
(`/root/repo/BASELINE.json`). R > 1.0 beats the target.
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_IMG_PER_SEC_PER_CHIP = 10_000 / 300 / 8  # 4.166..., see module docstring


def main():
    from mammodissect.utils.jit_cache import enable_compilation_cache

    enable_compilation_cache()  # amortize the ~11-min cold B5 compile across runs

    import jax
    import jax.numpy as jnp

    from mammodissect.models.efficientnet import EfficientNetMammo
    from mammodissect.ops.similarity import soft_wpmi

    h, w = 1520, 912
    batch_size = 8
    n_batches = 8  # timed batches (after warmup)
    n_concepts = 762
    capture = tuple(range(39))

    model = EfficientNetMammo(variant="efficientnet-b5", in_channels=1, dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.ones((1, h, w, 1), jnp.float32)
    )

    @jax.jit
    def harvest(v, x):
        _, captured = model.apply(v, x, train=False, capture=capture, pool_mode="avg")
        return captured

    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.normal(size=(batch_size, h, w, 1)), jnp.float32)

    def force(out):
        # this environment's axon backend treats block_until_ready as a no-op;
        # a host fetch of one element per buffer is the only reliable completion wait
        return [np.asarray(v[0, 0]) for v in out.values()]

    # warmup/compile
    force(harvest(variables, batch))

    t0 = time.perf_counter()
    for i in range(n_batches):
        out = harvest(variables, batch)
    force(out)
    harvest_s = time.perf_counter() - t0
    n_images = batch_size * n_batches
    harvest_rate = n_images / harvest_s

    # scoring stage: widest-layer units (block 38 -> 512 channels) x 762 concepts
    target_feats = np.asarray(
        rng.normal(size=(2000, out["blocks.38"].shape[-1])), np.float32
    )
    clip_feats = np.asarray(rng.normal(size=(2000, n_concepts)), np.float32)
    _ = np.asarray(soft_wpmi(clip_feats, target_feats, top_k=100)[0, 0])
    t0 = time.perf_counter()
    _ = np.asarray(soft_wpmi(clip_feats, target_feats, top_k=100)[0, 0])
    score_s = time.perf_counter() - t0

    # end-to-end rate: harvest of n_images + soft-wpmi scoring of all 39 layers,
    # scoring cost scaled from the measured 2000-image single-layer run
    score_total = score_s * (n_images / 2000) * len(capture)
    value = n_images / (harvest_s + score_total)
    result = {
        "metric": "dissect_images_per_sec_per_chip",
        "value": round(float(value), 2),
        "unit": "img/s/chip",
        "vs_baseline": round(float(value / BASELINE_IMG_PER_SEC_PER_CHIP), 2),
        "detail": {
            "harvest_img_per_s": round(harvest_rate, 2),
            "soft_wpmi_s_per_layer_2k_imgs": round(score_s, 3),
            "image_size": [h, w],
            "layers": len(capture),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
