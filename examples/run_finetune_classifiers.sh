#!/bin/bash
# The four VinDr tasks + RSNA cancer fine-tunes (mirrors run_clipdissect.sh:12-36's
# classifier variants + Finetune/MammoCLIP.sh recipe)
for LABEL in Mass Suspicious_Calcification Focal_Asymmetry density; do
  python -m mammodissect.cli.finetune \
    --csv-file "${CSV:-vindr_meta.csv}" --data-dir "${DATA:-images/}" \
    --dataset vindr --label "$LABEL" \
    --arch upmc_breast_clip_det_b5_period_n_ft \
    --clip-chk-pt-path "${CKPT:-b5-model-best-epoch-7.tar}" \
    --epochs 30 --batch-size 8 --lr 5e-5 --weight-decay 1e-4 \
    --weighted-BCE y
done
