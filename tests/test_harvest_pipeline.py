"""u8 fast-path harvest pipeline vs the f32 fallback (must agree numerically)."""
import numpy as np
import pytest

from mammodissect.data.probes import ArrayProbe
from mammodissect.dissect.engine import harvest_probe
from mammodissect.dissect.targets import get_target_model


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    probe = ArrayProbe(
        rng.integers(0, 256, size=(20, 64, 64, 1), dtype=np.uint8),
        mean=0.3, std=0.25,
    )
    target = get_target_model("tiny_cnn")
    return probe, target


def test_u8_pipeline_matches_f32_path(setup):
    probe, target = setup
    layers = ["blocks.0", "blocks.3"]
    fast, n_fast = harvest_probe(target, probe, layers, "avg", batch_size=8)
    # force the fallback by hiding image_u8
    class F32View:
        def __init__(self, p):
            self._p = p
            self.image_shape = p.image_shape
        def __len__(self):
            return len(self._p)
        def image(self, i):
            return self._p.image(i)
    slow, n_slow = harvest_probe(target, F32View(probe), layers, "avg", batch_size=8)
    assert n_fast == n_slow == 20
    for l in layers:
        assert fast[l].shape == slow[l].shape == (20, fast[l].shape[1])
        np.testing.assert_allclose(fast[l], slow[l], rtol=1e-4, atol=1e-4)


def test_pipeline_depth_does_not_change_results(setup):
    probe, target = setup
    a, _ = harvest_probe(target, probe, ["blocks.1"], "max", 8, pipeline_depth=0)
    b, _ = harvest_probe(target, probe, ["blocks.1"], "max", 8, pipeline_depth=3)
    np.testing.assert_array_equal(a["blocks.1"], b["blocks.1"])


def test_partial_last_batch_trimmed(setup):
    probe, target = setup
    out, n = harvest_probe(target, probe, ["blocks.0"], "avg", batch_size=16)
    assert n == 20 and out["blocks.0"].shape[0] == 20
