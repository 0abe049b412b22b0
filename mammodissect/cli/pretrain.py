"""BreastClip contrastive pretraining CLI (the upstream-Mammo-CLIP capability the
reference assumes; SURVEY.md §3.5)."""
from __future__ import annotations

import argparse
import json
import sys


def build_parser():
    p = argparse.ArgumentParser(description="Mammo-CLIP contrastive pretraining (TPU)")
    p.add_argument("--csv-file", dest="csv_file", required=True)
    p.add_argument("--root", default="")
    p.add_argument("--img-dir", dest="img_dir", default="")
    p.add_argument("--dataset", default="vindr", choices=["vindr", "upmc"])
    p.add_argument("--prompts-json", dest="prompts_json", default=None)
    p.add_argument("--vocab-file", dest="vocab_file", default=None)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", dest="batch_size", type=int, default=16)
    p.add_argument("--lr", type=float, default=5.0e-5)
    p.add_argument("--weight-decay", dest="weight_decay", type=float, default=1e-4)
    p.add_argument("--warmup-steps", dest="warmup_steps", type=int, default=100)
    p.add_argument("--img-size", dest="img_size", type=int, nargs=2, default=[1520, 912])
    p.add_argument("--i2i-weight", dest="i2i_weight", type=float, default=1.0)
    p.add_argument("--t2t-weight", dest="t2t_weight", type=float, default=0.5)
    p.add_argument("--label-smoothing", dest="label_smoothing", type=float, default=0.0)
    p.add_argument("--model-parallel", dest="model_parallel", type=int, default=1)
    p.add_argument("--image-variant", dest="image_variant", default="efficientnet-b5")
    p.add_argument("--bert-layers", dest="bert_layers", type=int, default=12)
    p.add_argument("--checkpoints", default="./checkpoints_pretrain")
    p.add_argument("--seed", type=int, default=10)
    return p


def main(argv=None):
    from mammodissect.utils.jit_cache import enable_compilation_cache

    enable_compilation_cache()
    import pandas as pd

    from mammodissect.data.imagetext import ImageTextDataset
    from mammodissect.train.pretrain import PretrainConfig, pretrain

    args = build_parser().parse_args(argv)
    if not args.prompts_json:
        # FINDING-labeled CSVs (vindr) generate text via the canonical prompt
        # templates, which the reference always supplies (`data_utils.py:119`,
        # `data/dataset/prompts.json`) — default to the vendored copy
        from mammodissect.assets import prompts_path

        args.prompts_json = prompts_path()
    with open(args.prompts_json) as f:
        prompt_json = json.load(f)
    cfg = PretrainConfig(
        csv_file=args.csv_file, root=args.root, img_dir=args.img_dir,
        dataset=args.dataset, prompts_json=args.prompts_json,
        vocab_file=args.vocab_file, epochs=args.epochs, batch_size=args.batch_size,
        lr=args.lr, weight_decay=args.weight_decay, warmup_steps=args.warmup_steps,
        img_size=tuple(args.img_size), i2i_weight=args.i2i_weight,
        t2t_weight=args.t2t_weight, label_smoothing=args.label_smoothing,
        model_parallel=args.model_parallel, image_variant=args.image_variant,
        bert_layers=args.bert_layers, checkpoints=args.checkpoints, seed=args.seed,
    )
    df = pd.read_csv(cfg.csv_file)
    ds = ImageTextDataset(df, root=cfg.root, img_dir=cfg.img_dir, dataset=cfg.dataset,
                          size_hw=tuple(cfg.img_size), prompt_json=prompt_json,
                          seed=cfg.seed)
    result = pretrain(cfg, ds)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
