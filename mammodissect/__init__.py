"""mammodissect — a TPU-native (JAX/XLA/Pallas/pjit) concept-dissection + mammography
classifier framework with the capabilities of Suaiba/Mammo-CLIP-Dissect.

Layout (mirrors SURVEY.md §7 target architecture):
  configs/   typed dataclass configs + presets (replaces argparse + dicts + hydra trio)
  utils/     seed / paths / meters / registry / torch-checkpoint conversion
  ops/       similarity scoring (soft_wpmi, wpmi, rank_reorder, cos, cos^3), pooling, pallas kernels
  models/    Flax models: EfficientNet (B0..B7, `_blocks` addressing), BERT, CLIP ViT,
             BreastClip dual encoder, classifiers; tokenizers (WordPiece, CLIP BPE)
  parallel/  Mesh construction, sharding plans (dp/tp), collectives, GlobalEnv equivalent
  data/      probe registry, batch contract, transforms, host loader, prompt generation
  dissect/   activation harvest (functional capture, not hooks), cache, similarity driver, CSV
  train/     fine-tune engine: pjit train step, schedules, losses, orbax checkpoints
  metrics/   auroc / pr_auc / compute_auprc / pfbeta / accuracy (the reference's missing module)
  zs/        zero-shot eval (fills reference's missing src/zero_shot_eval_clip.py)
  analysis/  CSV post-processing (thresholds, categories) — headless Plots/ logic
  cli/       dissect / finetune / zseval entry points
"""

__version__ = "0.1.0"
