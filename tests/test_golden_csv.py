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
