#!/bin/bash
# Zero-asset quickstart: the full dissect -> CSV -> analyze pipeline on synthetic
# data, runnable on CPU in under a minute (no checkpoints, no datasets, no TPU).
# Useful as a smoke test of an install and as a template for real runs — swap in
# a real probe/checkpoint per examples/run_mammoclip_dissect.sh.
set -euo pipefail
OUT="${OUT:-/tmp/mammodissect_quickstart}"
mkdir -p "$OUT"

# a tiny concept set (real runs: mammodissect.assets.concept_set_path(), 763 concepts)
printf 'mass\ncalcification\ndense tissue\nbenign finding\n' > "$OUT/concepts.txt"

JAX_PLATFORMS="${JAX_PLATFORMS:-cpu}" python -m mammodissect.cli.dissect \
  --target_model tiny_cnn \
  --clip_model random \
  --target_layers 'blocks.0,blocks.1' \
  --d_probe synthetic --probe_kwargs '{"n": 16, "h": 64, "w": 64, "c": 1}' \
  --concept_set "$OUT/concepts.txt" \
  --similarity_fn soft_wpmi --top_k 8 --batch_size 8 \
  --activation_dir "$OUT/activations" --result_dir "$OUT/results"

CSV=$(ls -t "$OUT"/results/*/*.csv | head -1)
echo "--- dissection CSV: $CSV"
head -3 "$CSV"

# headless Plots/ flow: thresholds + (with --categories/--figures) category maps
JAX_PLATFORMS="${JAX_PLATFORMS:-cpu}" python -m mammodissect.cli.analyze \
  --csv "$CSV" --out_dir "$OUT/processed"
echo "--- processed results in $OUT/processed:"
ls "$OUT/processed"
