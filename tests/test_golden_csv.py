"""Golden BYTE-STABLE CSV regression test (SURVEY.md §4): a fully deterministic tiny
dissection (seeded synthetic probe, seeded random-projection dissector, seeded
tiny_cnn target, soft-WPMI) must reproduce the committed fixture byte-for-byte.

This pins the Plots-facing artifact contract (`describe_broad_neurons.py:79` schema +
pandas list-cell formatting): any refactor that changes the CSV bytes — column order,
float formatting, list stringification, row order, scoring numerics — fails here even
if every value-level test still passes.

The fixture was generated in this repo's pinned environment; scoring runs fp32 with
Precision.HIGHEST so the values are XLA:CPU-deterministic for a fixed program. To
regenerate after an INTENTIONAL contract change:
    REGEN_GOLDEN=1 python -m pytest tests/test_golden_csv.py -q
then commit the updated fixture with a note on what changed and why.
"""
import json
import os

import pytest

from mammodissect.dissect.engine import DissectConfig, run_dissection

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "assets", "golden")
GOLDEN_CSV = os.path.join(GOLDEN_DIR, "synthetic_tiny_descriptions.csv")
GOLDEN_ARGS_KEYS = os.path.join(GOLDEN_DIR, "synthetic_tiny_args_keys.json")

# pinned concept set: changing this list is a fixture regeneration event
CONCEPTS = [
    "mass", "calcification", "fatty tissue", "dog", "truck", "spiculated margin",
    "dense breast", "skin thickening", "bright spot", "dark background",
    "architectural distortion", "benign lesion",
]


def _run_golden_dissection(tmp_path):
    concept_file = tmp_path / "golden_concepts.txt"
    concept_file.write_text("\n".join(CONCEPTS))
    cfg = DissectConfig(
        target_model="tiny_cnn",
        target_layers=["blocks.0", "blocks.3"],
        d_probe="synthetic",
        concept_set=str(concept_file),
        clip_model="random",
        batch_size=16,
        similarity_fn="soft_wpmi",
        top_k=16,
        activation_dir=str(tmp_path / "acts"),
        result_dir=str(tmp_path / "results"),
        probe_kwargs={"n": 32, "h": 64, "w": 64, "c": 1, "seed": 0},
    )
    _, csv_path = run_dissection(cfg, log=lambda *a: None)
    args_path = csv_path.replace(".csv", "_args.txt")
    return csv_path, args_path


def test_golden_csv_bytes(tmp_path):
    csv_path, args_path = _run_golden_dissection(tmp_path)
    with open(csv_path, "rb") as f:
        got = f.read()
    with open(args_path) as f:
        got_keys = sorted(json.load(f).keys())

    if os.environ.get("REGEN_GOLDEN") == "1" or not os.path.exists(GOLDEN_CSV):
        created = not os.path.exists(GOLDEN_CSV)
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(GOLDEN_CSV, "wb") as f:
            f.write(got)
        with open(GOLDEN_ARGS_KEYS, "w") as f:
            json.dump(got_keys, f, indent=1)
        if created:
            pytest.fail(
                "golden CSV fixture did not exist — it has been generated at "
                f"{GOLDEN_CSV}; review and commit it, then rerun")
        return  # explicit regeneration requested

    with open(GOLDEN_CSV, "rb") as f:
        want = f.read()
    assert got == want, (
        "dissection CSV bytes diverged from the committed golden fixture — the "
        "Plots-facing artifact contract changed. If intentional, regenerate with "
        "REGEN_GOLDEN=1 and commit the new fixture; if not, find the refactor that "
        "moved the bytes (column order / float formatting / list stringification / "
        "row order / scoring numerics)."
    )

    with open(GOLDEN_ARGS_KEYS) as f:
        want_keys = json.load(f)
    assert got_keys == want_keys, (
        "args.txt key set changed — downstream run-metadata consumers key on these"
    )


class TestOgNamingMatrix:
    """The og driver's hardcoded artifact-name matrix, 1:1 against
    `concept_vit/describe_og_neurons.py:129-147` (VERDICT r4 missing #2)."""

    # (breast_clip_ckpt, finetuned_ckpt, d_probe) -> (csv filename, args filename)
    # — the expected strings are copied verbatim from the reference source
    CASES = {
        ("ckpt", "ft", "vindr"): (
            "clip_dissector_vindr_den_finetuned_breast_clip_classifier_descriptions.csv",
            "clip_dissector_vindr_den_finetuned_breast_clip_classifier_descriptions_args.txt"),
        ("ckpt", None, "vindr"): (
            "clip_dissector_vindr_mammo_pretrained_breast_clip_classifier_descriptions.csv",
            "clip_dissector_vindr_mammo_pretrained_breast_clip_classifier_descriptions_args.txt"),
        ("ckpt", None, "imagenet_subsets"): (
            "clip_dissector_imagenet_subsets_small_mammo_pretrained_breast_clip_classifier_descriptions.csv",
            "clip_dissector_imagenet_subsets_small_mammo_pretrained_breast_clip_classifier_descriptions_args.txt"),
        (None, None, "vindr"): (
            "clip_dissector_vindr_not_mammo_pretrained_breast_clip_descriptions.csv",
            "clip_dissector_vindr_not_mammo_pretrained_breast_clip_descriptions_args.txt"),
        # the reference's own csv/args stem MISMATCH, reproduced faithfully
        (None, None, "imagenet_subsets"): (
            "clip_dissector_clip_target_imagenet_subsets_small_not_mammo_pretrained_clip_descriptions.csv",
            "clip_dissector_clip_target_imagenet_subsets_small_not_mammo_pretrained_breast_clip_descriptions_args.txt"),
    }

    def test_matrix_matches_reference(self):
        from mammodissect.dissect.results import og_result_basename

        for (ckpt, ft, probe), (csv_name, args_name) in self.CASES.items():
            cfg = DissectConfig(d_probe=probe, breast_clip_ckpt=ckpt,
                                finetuned_ckpt=ft, naming="og")
            stem, args_stem = og_result_basename(cfg)
            assert stem + ".csv" == csv_name, (ckpt, ft, probe)
            assert args_stem + ".txt" == args_name, (ckpt, ft, probe)

    def test_names_verbatim_in_reference_source(self):
        src = "/root/reference/concept_vit/describe_og_neurons.py"
        if not os.path.exists(src):
            pytest.skip("reference tree not present")
        with open(src) as f:
            text = f.read()
        for csv_name, args_name in self.CASES.values():
            assert csv_name in text and args_name in text

    def test_write_results_og_mode(self, tmp_path):
        from mammodissect.dissect.results import write_results

        cfg = DissectConfig(d_probe="vindr", breast_clip_ckpt="x.tar",
                            result_dir=str(tmp_path), naming="og")
        outputs = {"unit": [0], "layer": ["blocks.0"], "description": [["mass"]],
                   "similarity": [[0.5]], "images": [[1, 2]]}
        _, csv_path = write_results(outputs, cfg)
        assert os.path.basename(csv_path) == self.CASES[("ckpt", None, "vindr")][0]
        run_dir = os.path.dirname(csv_path)
        assert self.CASES[("ckpt", None, "vindr")][1] in os.listdir(run_dir)


def test_clip_target_cache_names_disjoint():
    """CLIP-as-target cache files never collide with the CLIP-dissector's image-
    feature cache: target names always embed `_{layer}{pool-suffix}` while the
    dissector image cache has no layer component. This is the property the
    reference protects with its hardcoded path override for target_name == "clip"
    (`concept_vit/og_utils.py:456-457`); our systematic scheme needs no override."""
    from mammodissect.dissect.engine import get_save_names

    target, clip, text = get_save_names(
        clip_name="clip", target_name="clip", target_layer="blocks.0",
        d_probe="imagenet_subsets", concept_set="/a/concepts.txt",
        pool_mode="avg", save_dir="acts")
    assert len({target, clip, text}) == 3
