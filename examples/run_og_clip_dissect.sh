#!/bin/bash
# G-dissect: OpenAI-CLIP dissector over CLIP's own 12 ViT layers
# (mirrors concept_vit/run_og_clip.sh)
LAYERS=$(python -c "print(','.join(f'layers.{i}' for i in range(12)))")
python -m mammodissect.cli.dissect \
  --target_model clip --clip_model ViT-B/16 \
  --target_layers "$LAYERS" \
  --d_probe "folder:${PROBE_DIR:-probe_images/}" \
  --probe_kwargs '{"image_shape": [224, 224, 3]}' \
  --concept_set "${CONCEPTS:-concepts.txt}" \
  --similarity_fn soft_wpmi --batch_size 200
