"""Multi-chip DP dissection harvest: sharded over Mesh('data') == single-device.

The north-star workload (10k images x 39 layers on v5e-8, BASELINE.md) shards the
harvest batch axis over all local devices; these tests assert the SPMD program is
numerically equivalent to the single-device one. Per-image compute is independent,
but XLA fuses/vectorizes differently for different per-device batch extents — and
on CPU it can pick a different conv ALGORITHM for the sharded program (measured up
to ~1e-3 fp32 divergence on the resident path; the persistent compile cache can
also swap algorithms between runs). We assert atol 2e-3: real sharding/layout bugs
misplace whole rows (diff ~ activation magnitude, >0.1), compiler noise does not.
Also checks the engine attaches the mesh itself.
Runs on the 8-virtual-CPU-device mesh from conftest.py.
"""
import jax
import numpy as np
import pytest

from mammodissect.data.probes import ArrayProbe
from mammodissect.dissect.engine import harvest_probe
from mammodissect.dissect.targets import get_target_model
from mammodissect.parallel.mesh import make_mesh

LAYERS = ["blocks.0", "blocks.5", "blocks.10"]


def _u8_probe(n=12, hw=64):
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, size=(n, hw, hw, 1)).astype(np.uint8)
    return ArrayProbe(images=imgs, mean=0.3089279, std=0.25053)


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(jax.devices()[:8], model_parallel=1)


def test_sharded_u8_dispatch_matches_single_device(mesh8):
    probe = _u8_probe()
    u8 = np.stack([probe.image_u8(i) for i in range(8)])

    single = get_target_model("tiny_cnn")
    dev, names, widths = single.harvest_u8_dispatch(u8, LAYERS, "avg", probe.mean, probe.std)
    ref = np.asarray(dev)

    sharded = get_target_model("tiny_cnn")  # same seed -> identical weights
    sharded.set_mesh(mesh8)
    dev_s, names_s, widths_s = sharded.harvest_u8_dispatch(u8, LAYERS, "avg", probe.mean, probe.std)
    got = np.asarray(dev_s)

    assert names == names_s and widths == widths_s
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-3)


def test_sharded_f32_harvest_matches_single_device(mesh8):
    rng = np.random.default_rng(1)
    images = rng.normal(size=(8, 64, 64, 1)).astype(np.float32)

    single = get_target_model("tiny_cnn")
    ref = single.harvest(images, LAYERS, "max")

    sharded = get_target_model("tiny_cnn")
    sharded.set_mesh(mesh8)
    got = sharded.harvest(images, LAYERS, "max")

    for layer in ref:
        np.testing.assert_allclose(got[layer], ref[layer], rtol=0, atol=2e-3)


def test_engine_auto_attaches_mesh_and_rounds_batch():
    """harvest_probe auto-uses all local devices: mesh attached, odd batch size
    rounded to a device-count multiple, results identical to single-device."""
    probe = _u8_probe(n=11)

    single = get_target_model("tiny_cnn")
    u8 = np.zeros((16, 64, 64, 1), np.uint8)
    for i in range(11):
        u8[i] = probe.image_u8(i)
    dev, names, widths = single.harvest_u8_dispatch(u8, LAYERS, "avg", probe.mean, probe.std)
    ref_packed = np.asarray(dev)[:11]

    target = get_target_model("tiny_cnn")
    acc, n_images = harvest_probe(target, probe, LAYERS, "avg", batch_size=5)
    assert target.mesh is not None, "engine should attach the local-device mesh"
    assert n_images == 11

    off = 0
    for name, w in zip(names, widths):
        np.testing.assert_allclose(acc[name], ref_packed[:, off : off + w], rtol=0, atol=2e-3)
        off += w


def test_fused_breastclip_harvest_embed_sharded(mesh8, tmp_path):
    """The fused M-dissect path (harvest + probe embedding in one forward) under DP:
    sharded == unsharded for both the packed activations and the embeddings."""
    from mammodissect.models.breastclip import BreastClip, default_model_config

    cfg = default_model_config()
    cfg["image_encoder"]["variant"] = "efficientnet-b0"
    probe = _u8_probe(n=8)
    u8 = np.stack([probe.image_u8(i) for i in range(8)])

    kw = dict(model_config=cfg, image_shape=(64, 64, 1), bert_layers=1, vocab_size=64)
    single = BreastClip.create(**kw)
    p_ref, e_ref, names, widths = single.harvest_and_embed_u8_dispatch(
        u8, ["blocks.0", "blocks.3"], "avg", probe.mean, probe.std)

    sharded = BreastClip.create(**kw)
    sharded.set_mesh(mesh8)
    p_s, e_s, names_s, widths_s = sharded.harvest_and_embed_u8_dispatch(
        u8, ["blocks.0", "blocks.3"], "avg", probe.mean, probe.std)

    assert names == names_s and widths == widths_s
    np.testing.assert_allclose(np.asarray(p_s), np.asarray(p_ref), rtol=0, atol=2e-3)
    np.testing.assert_allclose(np.asarray(e_s), np.asarray(e_ref), rtol=0, atol=2e-3)
