"""Dissection CLI — the TPU-native `describe_broad_neurons.py` / `describe_og_neurons.py`
/ `describe_clip_neurons.py` (reference flag surface at `describe_broad_neurons.py:15-49`).

Example (synthetic smoke run):
  python -m mammodissect.cli.dissect --target_model tiny_cnn --d_probe synthetic \
    --target_layers blocks.0,blocks.3 --concept_set concepts.txt \
    --clip_model random --result_dir /tmp/results --activation_dir /tmp/acts
"""
from __future__ import annotations

import argparse
import json
import sys

from mammodissect.dissect.engine import DissectConfig, run_dissection


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Mammo-CLIP Dissect (TPU)")
    p.add_argument("--clip_model", type=str, default="random",
                   help="dissector: breastclip | ViT-B/16 etc. | random")
    p.add_argument("--target_model", type=str, default="tiny_cnn")
    p.add_argument("--target_layers", type=str, default="blocks.0",
                   help="comma-separated; reference spellings like "
                        "'image_encoder._blocks[17]' are accepted")
    p.add_argument("--d_probe", type=str, default="synthetic")
    p.add_argument("--concept_set", type=str, default=None,
                   help="path to a concepts txt; defaults to the vendored canonical "
                        "762-concept set (assets/concepts/Specific_concepts_sorted.txt)")
    p.add_argument("--batch_size", type=int, default=200)
    p.add_argument("--pool_mode", type=str, default="avg", choices=["avg", "max"])
    p.add_argument("--similarity_fn", type=str, default="soft_wpmi",
                   choices=["soft_wpmi", "wpmi", "rank_reorder", "cos_similarity",
                            "cos_similarity_cubed"])
    p.add_argument("--top_k", type=int, default=100)
    p.add_argument("--num_top_concepts", type=int, default=10,
                   help="concepts per neuron in the CSV (reference: 10 for the "
                        "mammo drivers, 1 for describe_clip_neurons.py)")
    p.add_argument("--num_top_images", type=int, default=5)
    p.add_argument("--activation_dir", type=str, default="saved_activations")
    p.add_argument("--result_dir", type=str, default="results")
    p.add_argument("--save_prefix", type=str, default="")
    p.add_argument("--Breast_clip_chkpt", type=str, default=None)
    p.add_argument("--finetuned_img_classifier_chkpt", type=str, default=None)
    p.add_argument("--num_class", type=int, default=1)
    p.add_argument("--probe_kwargs", type=str, default="{}",
                   help="JSON dict forwarded to the probe factory (csv_file, root, ...)")
    p.add_argument("--target_kwargs", type=str, default="{}",
                   help="JSON dict forwarded to the target-model factory")
    p.add_argument("--dissector_kwargs", type=str, default="{}",
                   help="JSON dict forwarded to the dissector factory")
    p.add_argument("--device", type=str, default=None,
                   help="accepted for reference-flag compatibility; ignored (JAX "
                        "selects the TPU/CPU backend)")
    p.add_argument("--resident", action="store_true",
                   help="device-resident fused M-dissect: accumulate + score on "
                        "device, fetch only CSV-sized results; completed chunks "
                        "spill to --activation_dir so interrupted runs resume")
    p.add_argument("--deadline_s", type=float, default=None,
                   help="wall-clock budget for a --resident run: stop the harvest "
                        "at the next batch boundary, score what was harvested, and "
                        "resume from the spilled chunks on the next invocation")
    p.add_argument("--wire_pack", choices=("auto", "on", "off"), default="auto",
                   help="lossless packed uint8 wire for the --resident harvest: "
                        "send per-row nonzero spans instead of full frames "
                        "(mammograms are ~40-60%% black background); 'auto' packs "
                        "when the estimated packed fraction saves >=15%%, using "
                        "the probe's exact span-derived fraction when it knows "
                        "one, else a seeded random sample of 16 images. A sample "
                        "is still a sample — on a mixed-density probe it can "
                        "mis-decide; force 'on'/'off' when you know the content")
    p.add_argument("--naming", choices=("generated", "og"), default="generated",
                   help="'og' writes CSV/args files under describe_og_neurons.py's "
                        "exact hardcoded name matrix (for downstream Plots code "
                        "keyed on those filenames); default generates a "
                        "systematic stem")
    p.add_argument("--wandb", action="store_true",
                   help="log run config + status events to wandb (offline mode), "
                        "mirroring the reference driver's status stream "
                        "(describe_broad_neurons.py:14,77,99,121,173)")
    p.add_argument("--wandb_name", type=str, default=None,
                   help="wandb run name (reference default: the naming-matrix stem)")
    p.add_argument("--profile", type=str, default=None,
                   help="write a jax.profiler trace (Perfetto/XProf) to this dir")
    p.add_argument("--debug_nans", action="store_true",
                   help="fail loudly at the op producing any NaN (jax_debug_nans)")
    return p


def main(argv=None):
    from mammodissect.utils.jit_cache import enable_compilation_cache

    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    if args.concept_set is None:
        from mammodissect.assets import concept_set_path

        args.concept_set = concept_set_path()
    cfg = DissectConfig(
        target_model=args.target_model,
        target_layers=args.target_layers.split(","),
        d_probe=args.d_probe,
        concept_set=args.concept_set,
        clip_model=args.clip_model,
        batch_size=args.batch_size,
        pool_mode=args.pool_mode,
        similarity_fn=args.similarity_fn,
        top_k=args.top_k,
        num_top_concepts=args.num_top_concepts,
        num_top_images=args.num_top_images,
        activation_dir=args.activation_dir,
        result_dir=args.result_dir,
        save_prefix=args.save_prefix,
        breast_clip_ckpt=args.Breast_clip_chkpt,
        finetuned_ckpt=args.finetuned_img_classifier_chkpt,
        num_class=args.num_class,
        probe_kwargs=json.loads(args.probe_kwargs),
        target_kwargs=json.loads(args.target_kwargs),
        dissector_kwargs=json.loads(args.dissector_kwargs),
        resident=args.resident,
        deadline_s=args.deadline_s,
        wire_pack=args.wire_pack,
        naming=args.naming,
    )
    if args.debug_nans:
        from mammodissect.utils.profiling import enable_debug_nans

        enable_debug_nans()
    # wandb status-event stream, same event shapes as the reference driver
    # (`describe_broad_neurons.py:77,99,121,173`): per-layer similarity events are
    # derived from the engine's "[score] <layer>: ..." progress lines
    from mammodissect.train.loggers import WandbLogger

    wb = WandbLogger(project="broader_clip-dissect", name=args.wandb_name,
                     config=vars(args), enabled=args.wandb)

    def log(msg):
        print(msg)
        s = str(msg)
        if s.startswith("[score] "):
            wb.log({"layer": s[len("[score] "):].split(":")[0],
                    "similarity_calculated": True})
        elif s.startswith(("[harvest]", "[fused]", "[resident]")):
            wb.log({"status": "activations_saved"})

    if args.profile:
        from mammodissect.utils.profiling import trace

        with trace(args.profile):
            df, csv_path = run_dissection(cfg, log=log)
    else:
        df, csv_path = run_dissection(cfg, log=log)
    wb.log({"status": "all_layers_processed"})
    wb.log({"status": "results_saved"})
    wb.finish()
    print(f"Dissection done! {len(df)} units described. Results saved to {csv_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
