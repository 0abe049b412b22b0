"""Prompt generation, zero-shot eval, config system, sharding-plan tests."""
import dataclasses
import json

import numpy as np
import pytest

from mammodissect.data.prompts import default_zs_prompts, generate_report_from_labels


PROMPT_JSON = {
    "Mass": {
        "pos_right": ["mass in right breast", "right mass"],
        "pos_left": ["mass in left breast"],
        "neg_right": ["no mass right"],
        "neg_left": ["no mass left"],
    },
    "No Finding": {
        "pos_right": ["unremarkable right"], "pos_left": ["unremarkable left"],
        "neg_right": [], "neg_left": [],
    },
}


class TestPrompts:
    def test_deterministic_first_template(self):
        r = generate_report_from_labels(
            [["Mass"], [], [], ["Mass"]], PROMPT_JSON, deterministic=True)
        assert r == "mass in right breast no mass left"

    def test_no_finding_suppresses_negatives(self):
        r = generate_report_from_labels(
            [["No Finding"], [], ["Mass"], ["Mass"]], PROMPT_JSON, deterministic=True)
        assert "no mass" not in r

    def test_random_reproducible_with_rng(self):
        rngs = [np.random.default_rng(5), np.random.default_rng(5)]
        outs = [generate_report_from_labels([["Mass"], [], [], []], PROMPT_JSON,
                                            rng=r) for r in rngs]
        assert outs[0] == outs[1]

    def test_random_dedupe_is_insertion_ordered(self):
        """Regression: the non-deterministic dedupe used list(set(...)), whose
        order depends on string-hash randomization — reports differed across
        processes despite the seeded Generator. With a no-op shuffle the output
        must follow pos_right, pos_left, neg_* insertion order exactly."""

        class _NoShuffle:
            def integers(self, n):
                return 0

            def shuffle(self, x):
                pass

        r = generate_report_from_labels(
            [["Mass"], ["Mass"], [], ["Mass"]], PROMPT_JSON,
            deterministic=False, rng=_NoShuffle())
        assert r == "mass in right breast mass in left breast no mass left"

    def test_aslist_nested_plain_string_cell(self):
        """Regression: a FINDING cell holding a bare word (not a list literal)
        crashed ast.literal_eval."""
        from mammodissect.data.imagetext import _aslist_nested

        assert _aslist_nested("mass") == ["mass"]
        assert _aslist_nested("[['a'], ['b'], ['c'], ['d']]") == [
            ["a"], ["b"], ["c"], ["d"]]


class TestZeroShot:
    def test_planted_signal_auroc(self):
        from mammodissect.data.probes import ArrayProbe
        from mammodissect.zs import zero_shot_eval

        rng = np.random.default_rng(0)
        n, d = 40, 16

        class FakeDissector:
            def embed_images(self, images):
                # embedding = mean brightness in dim 0
                v = np.zeros((images.shape[0], d), np.float32)
                v[:, 0] = images.mean(axis=(1, 2, 3))
                v[:, 1] = 1.0
                return v / np.linalg.norm(v, axis=1, keepdims=True)

            def embed_texts(self, texts):
                out = np.zeros((len(texts), d), np.float32)
                for i, t in enumerate(texts):
                    out[i, 0] = 1.0 if "there is a mass" in t else -1.0
                    out[i, 1] = 0.5
                return out / np.linalg.norm(out, axis=1, keepdims=True)

        labels = rng.integers(0, 2, n).astype(np.float64)
        imgs = rng.normal(0.2, 0.05, size=(n, 8, 8, 1)).astype(np.float32)
        imgs[labels == 1] += 0.5
        probe = ArrayProbe(imgs)
        res = zero_shot_eval(FakeDissector(), probe, {"Mass": labels},
                             {"Mass": default_zs_prompts()["Mass"]}, batch_size=16)
        assert res["Mass"]["auroc"] > 0.95


class TestConfigs:
    def test_load_with_overrides(self, tmp_path):
        from mammodissect.configs import load_config
        from mammodissect.dissect.engine import DissectConfig

        p = tmp_path / "cfg.json"
        p.write_text(json.dumps({"target_model": "tiny_cnn", "top_k": 42}))
        cfg = load_config(DissectConfig, str(p), overrides=["similarity_fn=wpmi", "top_k=7"])
        assert cfg.target_model == "tiny_cnn"
        assert cfg.top_k == 7
        assert cfg.similarity_fn == "wpmi"

    def test_unknown_key_rejected(self, tmp_path):
        from mammodissect.configs import load_config
        from mammodissect.dissect.engine import DissectConfig

        p = tmp_path / "cfg.json"
        p.write_text(json.dumps({"nonexistent_flag": 1}))
        with pytest.raises(ValueError, match="unknown config keys"):
            load_config(DissectConfig, str(p))

    def test_save_roundtrip(self, tmp_path):
        from mammodissect.configs import load_config, save_config
        from mammodissect.dissect.engine import DissectConfig

        cfg = DissectConfig(target_model="x", top_k=3)
        path = str(tmp_path / "out.json")
        save_config(cfg, path)
        cfg2 = load_config(DissectConfig, path)
        assert cfg2.target_model == "x" and cfg2.top_k == 3


class TestShardingPlan:
    def test_tp_rules_hit_bert_and_projections(self):
        import jax
        from mammodissect.parallel.mesh import make_mesh
        from mammodissect.parallel.sharding import param_shardings

        mesh = make_mesh(model_parallel=2)
        params = {
            "text_encoder": {"layers_0": {
                "attention": {"query": {"kernel": np.zeros((8, 8))}},
                "intermediate": {"kernel": np.zeros((8, 16))},
                "output": {"kernel": np.zeros((16, 8))},
            }},
            "image_projection": {"projection": {"kernel": np.zeros((8, 4))}},
            "stem": {"kernel": np.zeros((3, 3, 1, 8))},
        }
        plan = param_shardings(mesh, params, tensor_parallel=True)
        q = plan["text_encoder"]["layers_0"]["attention"]["query"]["kernel"]
        assert q.spec == jax.sharding.PartitionSpec(None, "model")
        o = plan["text_encoder"]["layers_0"]["output"]["kernel"]
        assert o.spec == jax.sharding.PartitionSpec("model", None)
        conv = plan["stem"]["kernel"]
        assert conv.spec == jax.sharding.PartitionSpec()

    def test_dp_plan_is_fully_replicated(self):
        import jax
        from mammodissect.parallel.mesh import make_mesh
        from mammodissect.parallel.sharding import param_shardings

        mesh = make_mesh()
        params = {"a": {"kernel": np.zeros((4, 4))}}
        plan = param_shardings(mesh, params, tensor_parallel=False)
        assert plan["a"]["kernel"].spec == jax.sharding.PartitionSpec()
