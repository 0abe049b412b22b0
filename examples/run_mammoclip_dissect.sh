#!/bin/bash
# Canonical M-Mammo-CLIP Dissect invocation: all 39 EfficientNet-B5 blocks over a
# VinDr-style CSV probe with the 762-concept set (mirrors the reference's
# concept_vit/run_clipdissect.sh). Reference layer spellings are accepted too.
LAYERS=$(python -c "print(','.join(f'blocks.{i}' for i in range(39)))")
python -m mammodissect.cli.dissect \
  --target_model breastclip \
  --Breast_clip_chkpt "${CKPT:-b5-model-best-epoch-7.tar}" \
  --clip_model breastclip \
  --target_layers "$LAYERS" \
  --d_probe "csv:${PROBE_CSV:-vindr_meta.csv}" \
  --probe_kwargs "{\"root\": \"${PROBE_ROOT:-images/}\"}" \
  --concept_set "${CONCEPTS:-$(python -c 'from mammodissect.assets import concept_set_path; print(concept_set_path())')}" \
  --similarity_fn soft_wpmi --top_k 100 --batch_size 64 --resident \
  --activation_dir saved_activations --result_dir results
# --resident: device-resident fast path (accumulate+score on device, chunk-spill
# resume); add --deadline_s N for a bounded run that resumes on the next invocation.

# Post-process + figures (headless Plots/ flow):
#   python -m mammodissect.cli.analyze --csv results/<run>/*_descriptions.csv --figures
