"""Label maps, description eval, retrieval dataset, top-1 CLI mode."""
import numpy as np
import pytest

from mammodissect.data.labelmaps import (
    CIFAR100_FINE_TO_COARSE,
    cifar100_superclass,
    load_broden_labels,
    load_class_list,
)
from mammodissect.dissect.evalmetrics import (
    description_cos_similarity,
    mean_description_similarity,
)


def test_cifar_superclass_table():
    assert len(CIFAR100_FINE_TO_COARSE) == 100
    assert set(CIFAR100_FINE_TO_COARSE) == set(range(20))
    # each superclass has exactly 5 fine classes
    assert all(CIFAR100_FINE_TO_COARSE.count(c) == 5 for c in range(20))
    assert cifar100_superclass(0) == 4  # apple -> fruit_and_vegetables


def test_broden_and_class_list(tmp_path):
    p = tmp_path / "label.csv"
    p.write_text("number,name,category\n1,wall,material\n2,sky,scene\n")
    labels = load_broden_labels(str(p))
    assert labels == {1: "wall", 2: "sky"}
    q = tmp_path / "classes.txt"
    q.write_text("/a/abbey 0\n/b/beach 1\n")
    assert load_class_list(str(q)) == ["abbey", "beach"]


class FakeEmbedder:
    def __call__(self, texts):
        out = np.zeros((len(texts), 4))
        for i, t in enumerate(texts):
            out[i, hash(t.split()[-1]) % 4] = 1.0
        return out


def test_description_similarity_identical_is_one():
    emb = FakeEmbedder()
    sims = description_cos_similarity(["mass", "dog"], ["mass", "dog"], emb)
    np.testing.assert_allclose(sims, 1.0)
    assert mean_description_similarity(["mass"], ["mass"], emb) == pytest.approx(1.0)


def test_description_similarity_requires_alignment():
    with pytest.raises(ValueError):
        description_cos_similarity(["a"], ["a", "b"], FakeEmbedder())


def test_cli_top1_mode(tmp_path):
    """--num_top_concepts 1 reproduces describe_clip_neurons.py's top-1 CSV shape."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from mammodissect.cli.dissect import main

    concepts = tmp_path / "c.txt"
    concepts.write_text("a\nb\nc\nd\ne\n")
    main([
        "--target_model", "tiny_cnn", "--d_probe", "synthetic",
        "--target_layers", "blocks.1", "--concept_set", str(concepts),
        "--clip_model", "random", "--similarity_fn", "cos_similarity",
        "--num_top_concepts", "1", "--num_top_images", "3",
        "--result_dir", str(tmp_path / "r"), "--activation_dir", str(tmp_path / "a"),
        "--probe_kwargs", '{"n": 8, "h": 64, "w": 64, "c": 1}',
    ])
    import glob

    import pandas as pd

    csv = glob.glob(str(tmp_path / "r" / "*" / "*.csv"))[0]
    df = pd.read_csv(csv)
    import ast

    assert len(ast.literal_eval(df.iloc[0]["description"])) == 1
    assert len(ast.literal_eval(df.iloc[0]["images"])) == 3


def test_default_embedders_out_of_the_box():
    """get_cos_similarity runs with NO injected embedders (reference
    `utils.py:618-646` defaults: CLIP text tower + sentence encoder -> in-repo
    towers): identical texts score 1.0 under both, disjoint texts score lower."""
    from mammodissect.dissect.evalmetrics import default_text_embedder, get_cos_similarity

    clip_emb = default_text_embedder(
        "clip", vision_width=32, vision_layers=1, vision_heads=2, text_width=32,
        text_layers=1, text_heads=2, image_size=32, patch_size=16, embed_dim=16)
    bert_emb = default_text_embedder("bert", bert_layers=1)

    preds = ["calcification", "mass", "dog"]
    same = get_cos_similarity(preds, list(preds), clip_embedder=clip_emb,
                              sentence_embedder=bert_emb)
    assert same[0] == pytest.approx(1.0, abs=1e-5)
    assert same[1] == pytest.approx(1.0, abs=1e-5)
    diff = get_cos_similarity(preds, ["sky", "tree", "building"],
                              clip_embedder=clip_emb, sentence_embedder=bert_emb)
    assert diff[0] < same[0] and diff[1] < same[1]

    # sentence-transformers duck-typing: objects with .encode slot into the role
    class Enc:
        def encode(self, texts):
            rng = np.random.default_rng(0)
            return np.stack([rng.normal(size=8) for _ in texts])

    both = get_cos_similarity(preds, list(preds), clip_embedder=clip_emb,
                              sentence_embedder=Enc())
    assert both[1] == pytest.approx(1.0, abs=1e-5)


def test_default_embedder_warns_without_checkpoint(recwarn):
    """Random-init default embedders must announce themselves (scores from untrained
    towers are only exact-match-meaningful)."""
    import pytest as _pytest

    from mammodissect.dissect.evalmetrics import default_text_embedder

    with _pytest.warns(UserWarning, match="RANDOM-INIT"):
        default_text_embedder("bert", bert_layers=1)


def test_cli_wandb_status_stream(tmp_path, monkeypatch):
    """--wandb emits the reference driver's status-event shapes
    (`describe_broad_neurons.py:77,99,121,173`): activations_saved, per-layer
    similarity_calculated, all_layers_processed, results_saved — via a stubbed
    offline wandb module."""
    import sys
    import types

    events = []

    class _Run:
        def log(self, data):
            events.append(data)

        def finish(self):
            events.append({"finished": True})

    stub = types.ModuleType("wandb")
    stub.init = lambda **kw: _Run()
    monkeypatch.setitem(sys.modules, "wandb", stub)

    import jax

    jax.config.update("jax_platforms", "cpu")
    from mammodissect.cli.dissect import main

    concepts = tmp_path / "c.txt"
    concepts.write_text("a\nb\nc\nd\ne\n")
    main([
        "--target_model", "tiny_cnn", "--d_probe", "synthetic",
        "--target_layers", "blocks.1", "--concept_set", str(concepts),
        "--clip_model", "random", "--similarity_fn", "cos_similarity",
        "--result_dir", str(tmp_path / "r"), "--activation_dir", str(tmp_path / "a"),
        "--probe_kwargs", '{"n": 8, "h": 64, "w": 64, "c": 1}', "--wandb",
    ])
    assert {"status": "activations_saved"} in events
    assert {"layer": "blocks.1", "similarity_calculated": True} in events
    assert {"status": "all_layers_processed"} in events
    assert {"status": "results_saved"} in events
    assert events[-1] == {"finished": True}


def test_reference_models_dict_names_all_resolve():
    """Every spelling in the reference's HF target zoo (`concept_vit/data_utils.py:
    21-36` MODELS) resolves through get_target_model — incl. the -cub/-bloodmnist
    fine-tune aliases (same architectures; weights come via ckpt_path)."""
    from mammodissect.dissect.targets import TARGETS, get_target_model

    # construct one member of each architecture family (tiny geometry where the
    # factory accepts it) — the aliases below share the same registered factories
    tiny_vit = {"width": 32, "layers": 1, "heads": 2, "image_size": 32,
                "patch_size": 16}
    tiny_clip = {"vision_width": 64, "vision_layers": 1, "vision_heads": 2,
                 "image_size": 32, "patch_size": 16, "embed_dim": 16,
                 "text_width": 32, "text_layers": 1, "text_heads": 2}
    for n, kw in (("vit", tiny_vit), ("clip-cub", tiny_clip),
                  ("resnet-bloodmnist", {"input_size": 32})):
        t = get_target_model(n, **kw)
        assert hasattr(t, "harvest"), n
    # the rest share those factories; registration (after the lazy imports above)
    # is the contract — constructing all 13 default-size towers would be slow
    for n in ["dino", "clip", "resnet", "mae", "dino-cub", "vit-cub",
              "resnet-cub", "dino-bloodmnist", "vit-bloodmnist",
              "clip-bloodmnist"]:
        assert n in TARGETS, n


def test_compilation_cache_guard_refuses_cpu():
    """The persistent compile cache must never be enabled for CPU programs: once a
    TPU backend initializes, jax.default_backend() keeps reporting it even after
    jax.config.update('jax_platforms','cpu'), so the guard also consults the
    platform config — a regression here re-poisons the shared cache dir with
    machine-feature-pinned CPU AOT entries (cross-host loads risk SIGILL and
    swap conv algorithms, which is what flipped the multichip gate)."""
    import jax

    from mammodissect.utils.jit_cache import enable_compilation_cache

    # conftest pins jax_platforms='cpu' for the whole suite, which is exactly the
    # stale-default_backend configuration the guard must veto
    assert (getattr(jax.config, "jax_platforms", "") or "").split(",")[0] == "cpu"
    before = jax.config.jax_compilation_cache_dir
    assert enable_compilation_cache() is None
    assert jax.config.jax_compilation_cache_dir == before  # untouched
