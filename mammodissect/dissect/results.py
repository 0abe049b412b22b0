"""Results CSV writer — byte-compatible schema with the reference so Plots/ post-
processing ports directly: columns {layer, unit, description, similarity, images} with
list-typed description/similarity/images cells (`describe_broad_neurons.py:79,122-172`),
plus an `*_args.txt` JSON dump of the config beside the CSV (`:171-172`)."""
from __future__ import annotations

import dataclasses
import datetime
import json
import os

import pandas as pd


def result_basename(cfg) -> str:
    """Descriptive CSV name: the reference picks from a hardcoded matrix keyed on
    checkpoint presence x d_probe (`describe_broad_neurons.py:128-170`); we generate the
    same shape of name systematically."""
    pretrained = "mammo_pretrained" if cfg.breast_clip_ckpt else "not_mammo_pretrained"
    finetuned = "finetuned_" if cfg.finetuned_ckpt else ""
    probe = cfg.d_probe.split(":")[0]
    return f"{probe}_{finetuned}{pretrained}_{cfg.target_model}_descriptions"


# Documented divergences from the reference's scoring math, stamped into every run's
# args.txt so downstream consumers of the CSV see them without reading docs/PARITY.md.
_SIMILARITY_NOTES = {
    "rank_reorder": (
        "rank_reorder diverges from the reference (concept_vit/similarity.py:99-132) "
        "in two documented ways: (1) negative avg_clip is clamped to 1e-6 instead of "
        "producing NaN via (avg_clip)**0.5, so negative-mean concepts rank last "
        "rather than poisoning the row; (2) the random-permutation baseline uses a "
        "seeded PRNG (PRNGKey(0)) instead of torch's unseeded randperm, so scores "
        "are reproducible. Values are NOT numerically comparable to reference "
        "rank_reorder CSVs; rankings agree where the reference is finite."
    ),
}


def write_results(outputs: dict, cfg):
    df = pd.DataFrame(outputs)
    stamp = datetime.datetime.now().strftime("%y_%m_%d_%H_%M")
    save_dir = os.path.join(cfg.result_dir, f"{cfg.target_model}_{stamp}")
    os.makedirs(save_dir, exist_ok=True)
    base = result_basename(cfg)
    csv_path = os.path.join(save_dir, base + ".csv")
    df.to_csv(csv_path, index=False)
    args = dataclasses.asdict(cfg)
    if cfg.similarity_fn in _SIMILARITY_NOTES:
        args["similarity_fn_divergence_note"] = _SIMILARITY_NOTES[cfg.similarity_fn]
    with open(os.path.join(save_dir, base + "_args.txt"), "w") as f:
        json.dump(args, f, indent=2, default=str)
    return df, csv_path
