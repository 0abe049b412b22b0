"""Golden end-to-end dissection test (SURVEY.md §4): tiny synthetic D_probe + tiny
concept set -> CSV with the exact reference schema {layer, unit, description,
similarity, images} (`describe_broad_neurons.py:79`)."""
import ast
import os

import numpy as np
import pandas as pd
import pytest

from mammodissect.data.probes import synthetic_probe
from mammodissect.dissect.capture import canonical_layer_name
from mammodissect.dissect.engine import DissectConfig, run_dissection, save_activations

CONCEPTS = ["mass", "calcification", "fatty tissue", "dog", "truck", "spiculated margin",
            "dense breast", "skin thickening", "bright spot", "dark background"]


@pytest.fixture(scope="module")
def concept_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("concepts") / "tiny_concepts.txt"
    p.write_text("\n".join(CONCEPTS))
    return str(p)


def make_cfg(tmp_path, concept_file, **kw):
    defaults = dict(
        target_model="tiny_cnn",
        target_layers=["blocks.0", "blocks.3"],
        d_probe="synthetic",
        concept_set=concept_file,
        clip_model="random",
        batch_size=16,
        similarity_fn="cos_similarity",
        activation_dir=str(tmp_path / "acts"),
        result_dir=str(tmp_path / "results"),
        probe_kwargs={"n": 32, "h": 64, "w": 64, "c": 1},
    )
    defaults.update(kw)
    return DissectConfig(**defaults)


def test_layer_name_canonicalization():
    assert canonical_layer_name("image_encoder._blocks[17]") == "blocks.17"
    assert canonical_layer_name("_blocks[3]") == "blocks.3"
    assert canonical_layer_name("blocks.5") == "blocks.5"
    assert canonical_layer_name("vision_model.encoder.layers[11]") == "layers.11"
    assert canonical_layer_name("layer4") == "layer4"
    assert canonical_layer_name("conv1") == "conv1"


def test_e2e_csv_schema(tmp_path, concept_file):
    cfg = make_cfg(tmp_path, concept_file)
    df, csv_path = run_dissection(cfg, log=lambda *a: None)
    assert os.path.exists(csv_path)
    assert list(df.columns) == ["layer", "unit", "description", "similarity", "images"]
    # 16 b0-block.0 channels + 24 block.3 channels? -> just check per-layer unit counts
    for layer, sub in df.groupby("layer"):
        assert list(sub["unit"]) == list(range(len(sub)))
    # description = list of 10 concepts, images = 5 probe indices
    first = df.iloc[0]
    assert len(first["description"]) == 10
    assert len(first["similarity"]) == 10
    assert len(first["images"]) == 5
    assert all(d in CONCEPTS for d in first["description"])
    assert all(0 <= i < 32 for i in first["images"])
    # similarities sorted descending
    assert sorted(first["similarity"], reverse=True) == list(first["similarity"])
    # csv round-trips with list-typed cells parsed (the Plots/ contract)
    df2 = pd.read_csv(csv_path)
    parsed = ast.literal_eval(df2.iloc[0]["description"])
    assert parsed == first["description"]
    # args.txt dumped beside the csv
    args_files = [f for f in os.listdir(os.path.dirname(csv_path)) if f.endswith("_args.txt")]
    assert len(args_files) == 1


def test_cache_resume(tmp_path, concept_file):
    """skip-if-exists memoization (`utils.py:648-657`): second save_activations call
    does no recompute (harvest log line says cached)."""
    cfg = make_cfg(tmp_path, concept_file)
    logs = []
    save_activations(cfg, log=logs.append)
    logs2 = []
    save_activations(cfg, log=logs2.append)
    assert any("cached" in str(l) for l in logs2)
    # cache files use the reference naming scheme
    acts = os.listdir(cfg.activation_dir)
    assert any("synthetic_tiny_cnn_blocks.0" in f for f in acts)


def test_e2e_against_manual_pipeline(tmp_path, concept_file):
    """The engine's scoring must equal a hand-run of the same stages."""
    from mammodissect.dissect.dissectors import get_dissector
    from mammodissect.dissect.targets import get_target_model
    from mammodissect.ops import cos_similarity

    cfg = make_cfg(tmp_path, concept_file, target_layers=["blocks.2"])
    probe = synthetic_probe(n=32, h=64, w=64, c=1)
    df, _ = run_dissection(cfg, log=lambda *a: None)

    target = get_target_model("tiny_cnn")
    captured = target.harvest(probe.images, ["blocks.2"], "avg")
    tf = captured["blocks.2"]
    dissector = get_dissector("random")
    img = dissector.embed_images(probe.images)
    txt = dissector.embed_texts(CONCEPTS)
    sim = np.asarray(cos_similarity(img @ txt.T, tf))
    want_top1 = [CONCEPTS[i] for i in sim.argmax(axis=1)]
    got_top1 = [d[0] for d in df["description"]]
    assert got_top1 == want_top1


def test_rank_reorder_divergence_stamped_in_args(tmp_path, concept_file):
    """rank_reorder's documented divergences from the reference (clamped negative
    avg_clip, seeded permutation RNG) must be visible in the run artifact itself —
    downstream consumers of the CSV read args.txt, not docs/PARITY.md."""
    import json

    cfg = make_cfg(tmp_path, concept_file, similarity_fn="rank_reorder",
                   target_layers=["blocks.0"])
    _, csv_path = run_dissection(cfg, log=lambda *a: None)
    with open(csv_path.replace(".csv", "_args.txt")) as f:
        args = json.load(f)
    note = args["similarity_fn_divergence_note"]
    assert "clamp" in note and "seeded" in note.lower()

    # other similarity fns carry no note (nothing diverges)
    cfg2 = make_cfg(tmp_path, concept_file, similarity_fn="cos_similarity",
                    target_layers=["blocks.0"],
                    result_dir=str(tmp_path / "results2"))
    _, csv_path2 = run_dissection(cfg2, log=lambda *a: None)
    with open(csv_path2.replace(".csv", "_args.txt")) as f:
        assert "similarity_fn_divergence_note" not in json.load(f)


def test_pool_mode_changes_cache_name(tmp_path, concept_file):
    from mammodissect.dissect.engine import get_save_names

    t_avg, _, _ = get_save_names("random", "m", "blocks.0", "synthetic", "c.txt", "avg", "d")
    t_max, _, _ = get_save_names("random", "m", "blocks.0", "synthetic", "c.txt", "max", "d")
    assert t_avg != t_max and t_max.endswith("_max.npy")
