"""Fused M-dissect path: one forward yields activations + embeddings, numerically
matching the two-stage path."""
import os

import numpy as np
import pytest

from mammodissect.data.probes import ArrayProbe
from mammodissect.dissect.engine import DissectConfig, save_activations


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    probe = ArrayProbe(
        rng.integers(0, 256, size=(12, 64, 48, 1), dtype=np.uint8),
        mean=0.3, std=0.25,
    )
    small = {"image_shape": (64, 48, 1), "bert_layers": 2,
             "model_config": {
                 "name": "clip_custom", "temperature": 0.07,
                 "image_encoder": {"model_type": "cnn", "variant": "efficientnet-b0",
                                   "in_channels": 1},
                 "text_encoder": {"pooling": "eos"},
                 "projection_head": {"name": "linear", "proj_dim": 32}}}
    return probe, small


def test_fused_path_runs_and_matches_two_stage(setup, tmp_path):
    probe, small = setup
    layers = ["blocks.0", "blocks.4"]
    base = dict(target_model="breastclip", clip_model="breastclip",
                target_layers=layers, d_probe="synthetic_u8",
                concept_set="tests/assets/tiny_concepts.txt", batch_size=8,
                dissector_kwargs=small)

    # fused run
    cfg_f = DissectConfig(activation_dir=str(tmp_path / "fused"), **base)
    logs = []
    paths_f = save_activations(cfg_f, probe=probe, log=logs.append)
    assert any("[fused]" in str(l) for l in logs), logs

    # two-stage run: explicit target built from the same module/variables as the
    # dissector's image tower (reference two-stage semantics)
    from mammodissect.dissect.dissectors import get_dissector

    d = get_dissector("breastclip", **small)

    class TowerTarget:
        def harvest(self, images, layers, pool_mode="avg"):
            import jax, jax.numpy as jnp

            fn = lambda v, x: d.module.apply(
                v, x, train=False, capture=tuple(int(l.split(".")[1]) for l in layers),
                pool_mode=pool_mode, method=type(d.module).encode_image)[1]
            out = jax.jit(fn)(d.variables, jnp.asarray(images))
            return {k: np.asarray(v) for k, v in out.items()}

    cfg_s = DissectConfig(activation_dir=str(tmp_path / "twostage"), **base)
    logs2 = []
    paths_s = save_activations(cfg_s, probe=probe, target=TowerTarget(),
                               dissector=d, log=logs2.append)
    assert not any("[fused]" in str(l) for l in logs2)  # explicit target disables fuse

    for l in layers:
        a = np.load(paths_f[f"target:{l}"])
        b = np.load(paths_s[f"target:{l}"])
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
    ef = np.load(paths_f["clip"])
    es = np.load(paths_s["clip"])
    np.testing.assert_allclose(ef, es, rtol=1e-4, atol=1e-4)
