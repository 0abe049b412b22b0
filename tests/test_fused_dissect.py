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


def test_resident_matches_staged(setup):
    """Device-resident fused dissect (accumulate on device, score on device, fetch only
    CSV-sized results) must reproduce the staged path's top concepts/values/images."""
    from mammodissect.dissect.dissectors import get_dissector
    from mammodissect.dissect.engine import (
        _fused_harvest_embed,
        fused_harvest_embed_resident,
        score_all_layers,
        score_resident,
    )

    probe, small = setup
    layers = [f"blocks.{i}" for i in range(8)]
    d = get_dissector("breastclip", **small)
    rng = np.random.default_rng(1)
    text_feats = rng.normal(size=(9, 32)).astype(np.float32)

    # staged: per-batch fetch + host concat + (host-loaded) one-program scoring
    feats, emb, n1 = _fused_harvest_embed(d, probe, layers, "avg", batch_size=8)

    act_chunks, emb_chunks, names, widths, n2 = fused_harvest_embed_resident(
        d, probe, layers, "avg", batch_size=8, sync_every=2, chunk_batches=1)
    assert n1 == n2 == len(probe)
    assert names == layers
    assert len(act_chunks) == 2  # 12 images / (1 batch * 8) capacity -> 2 chunks
    # accumulators hold the same activations/embeddings (padded rows beyond n are zero)
    packed_host = np.concatenate([feats[l] for l in layers], axis=1)
    got_a = np.concatenate([np.asarray(c) for c in act_chunks], axis=0)[:n2]
    got_e = np.concatenate([np.asarray(c) for c in emb_chunks], axis=0)[:n2]
    np.testing.assert_allclose(got_a, packed_host, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got_e, emb, rtol=1e-4, atol=1e-4)

    top_vals, top_idx, img_idx = score_resident(
        act_chunks, emb_chunks, n2, text_feats, widths, "soft_wpmi",
        top_k=10, num_top_concepts=3, num_top_images=4)

    # reference: staged scoring on host-normalized features
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        np.save(os.path.join(td, "img.npy"), emb)
        np.save(os.path.join(td, "txt.npy"), text_feats)
        sims = score_all_layers(
            feats, os.path.join(td, "img.npy"), os.path.join(td, "txt.npy"),
            "soft_wpmi", top_k=10)
    want_sim = np.concatenate([sims[l] for l in layers], axis=0)
    want_idx = np.argsort(-want_sim, axis=1, kind="stable")[:, :3]
    np.testing.assert_array_equal(top_idx, want_idx)
    np.testing.assert_allclose(
        top_vals, np.take_along_axis(want_sim, want_idx, axis=1), rtol=1e-4, atol=1e-4)
    want_img = np.argsort(-packed_host, axis=0, kind="stable")[:4].T
    np.testing.assert_array_equal(img_idx, want_img)


def test_run_dissection_resident_csv_matches_staged(setup, tmp_path):
    """--resident end-to-end: the CSV must match the staged pipeline's CSV. Runs on
    the 8-device CPU mesh — resident mode now composes with the data mesh (sharded
    accumulators) instead of bailing to the staged path — and spills completed chunks
    to the activation cache for resume."""
    import pandas as pd

    from mammodissect.dissect.engine import DissectConfig, run_dissection

    probe, small = setup
    base = dict(target_model="breastclip", clip_model="breastclip",
                target_layers=["blocks.0", "blocks.3"], d_probe="synthetic_u8",
                concept_set="tests/assets/tiny_concepts.txt", batch_size=8,
                dissector_kwargs=small, num_top_concepts=3, num_top_images=4)

    logs = []
    cfg_r = DissectConfig(activation_dir=str(tmp_path / "ra"),
                          result_dir=str(tmp_path / "rr"), resident=True, **base)
    df_r, _ = run_dissection(cfg_r, probe=probe, log=logs.append)
    assert any("[resident] dissected" in str(l) for l in logs), logs
    # chunk spill: the harvest landed in the activation cache (12 images fit in the
    # in-progress chunk -> the partial-chunk npz)
    assert list((tmp_path / "ra").glob("*_resident_*")), list((tmp_path / "ra").iterdir())

    cfg_s = DissectConfig(activation_dir=str(tmp_path / "sa"),
                          result_dir=str(tmp_path / "sr"), **base)
    df_s, _ = run_dissection(cfg_s, probe=probe, log=logs.append)

    pd.testing.assert_frame_equal(
        df_r.drop(columns=["similarity"]), df_s.drop(columns=["similarity"]))
    for a, b in zip(df_r["similarity"], df_s["similarity"]):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)

    # rerun: everything resumes from the spilled chunks (no recompute needed) and the
    # CSV is identical — the reference's skip-if-exists restartability
    # (`utils.py:648-657`) extended to the resident path
    logs3 = []
    df_r2, _ = run_dissection(cfg_r, probe=probe, log=logs3.append)
    assert any("resumed" in str(l) for l in logs3), logs3
    pd.testing.assert_frame_equal(
        df_r2.drop(columns=["similarity"]), df_r.drop(columns=["similarity"]))


def test_resident_sharded_matches_single_device(setup):
    """Mesh-sharded resident harvest == single-device resident harvest, row for row
    (accumulators row-sharded over Mesh('data'), params replicated)."""
    import jax

    from mammodissect.dissect.dissectors import get_dissector
    from mammodissect.dissect.engine import fused_harvest_embed_resident
    from mammodissect.parallel.mesh import auto_data_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    probe, small = setup
    layers = ["blocks.0", "blocks.2", "blocks.5"]

    d_single = get_dissector("breastclip", **small)
    a1, e1, names1, widths1, n1 = fused_harvest_embed_resident(
        d_single, probe, layers, "avg", batch_size=8, chunk_batches=1)

    d_mesh = get_dissector("breastclip", **small)
    d_mesh.set_mesh(auto_data_mesh())
    assert d_mesh.mesh is not None
    a2, e2, names2, widths2, n2 = fused_harvest_embed_resident(
        d_mesh, probe, layers, "avg", batch_size=8, chunk_batches=1)

    assert n1 == n2 and names1 == names2 and widths1 == widths2
    # sharded accumulators must hold a valid row-sharded layout
    assert any(len(c.sharding.device_set) > 1 for c in a2)
    cat = lambda cs: np.concatenate([np.asarray(c) for c in cs], axis=0)[:n1]
    # atol separates layout/sharding bugs (row misplacement => O(activation
    # magnitude) ~0.3) from XLA:CPU conv-ALGORITHM variance: the sharded and
    # unsharded programs compile different conv kernels whose fp32 outputs differ
    # up to ~1e-3 (measured on this B0 geometry), and the persistent compile cache
    # can swap algorithms between runs — bitwise equality across different XLA
    # programs is not a property the compiler offers.
    np.testing.assert_allclose(cat(a2), cat(a1), rtol=0, atol=5e-3)
    np.testing.assert_allclose(cat(e2), cat(e1), rtol=0, atol=2e-2)


def test_resident_deadline_then_resume_completes(setup, tmp_path):
    """An interrupted resident harvest (deadline hit mid-run) leaves complete chunks
    on disk; the rerun resumes from them and the final result equals a clean run."""
    import time as _time

    from mammodissect.dissect.dissectors import get_dissector
    from mammodissect.dissect.engine import fused_harvest_embed_resident

    probe, small = setup  # 12 images
    layers = ["blocks.0", "blocks.1"]
    d = get_dissector("breastclip", **small)

    # clean run for reference
    a0, e0, *_, n0 = fused_harvest_embed_resident(
        d, probe, layers, "avg", batch_size=4, chunk_batches=1)
    cat = lambda cs, n: np.concatenate([np.asarray(c) for c in cs], axis=0)[:n]
    want_a, want_e = cat(a0, n0), cat(e0, n0)

    # interrupted run: deadline already passed -> stops after the first batch
    cache = str(tmp_path / "cache")
    a1, e1, *_, n1 = fused_harvest_embed_resident(
        d, probe, layers, "avg", batch_size=4, chunk_batches=1,
        cache_dir=cache, cache_key="k", deadline=_time.monotonic())
    assert n1 == 4 < len(probe)  # partial
    assert os.path.exists(os.path.join(cache, "k_chunk0000_act.npy"))

    # resume: picks up chunk 0 from disk, harvests only the remaining 8 images
    logs = []
    a2, e2, *_, n2 = fused_harvest_embed_resident(
        d, probe, layers, "avg", batch_size=4, chunk_batches=1,
        cache_dir=cache, cache_key="k", log=logs.append)
    assert n2 == len(probe)
    assert any("resumed 1 cached chunks" in str(l) for l in logs), logs
    np.testing.assert_allclose(cat(a2, n2), want_a, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(cat(e2, n2), want_e, rtol=1e-5, atol=1e-5)


def test_score_resident_does_not_retrace(setup):
    """Repeated scoring calls hit one jit cache entry (the round-2 scorer was a fresh
    closure per call, silently retracing every 'measured' scoring pass)."""
    import mammodissect.dissect.engine as engine
    from mammodissect.dissect.dissectors import get_dissector
    from mammodissect.dissect.engine import (
        fused_harvest_embed_resident,
        score_resident,
    )

    probe, small = setup
    layers = ["blocks.0"]
    d = get_dissector("breastclip", **small)
    chunks = fused_harvest_embed_resident(d, probe, layers, "avg", batch_size=8,
                                          chunk_batches=2)
    act_chunks, emb_chunks, _names, widths, n = chunks
    text = np.random.default_rng(0).normal(size=(5, 32)).astype(np.float32)

    r1 = score_resident(act_chunks, emb_chunks, n, text, widths, "soft_wpmi", top_k=6)
    size_after_first = engine._score_resident_jit()._cache_size()
    r2 = score_resident(act_chunks, emb_chunks, n, text, widths, "soft_wpmi", top_k=6)
    assert engine._score_resident_jit()._cache_size() == size_after_first
    np.testing.assert_allclose(r1[0], r2[0])
    np.testing.assert_array_equal(r1[1], r2[1])


def test_run_dissection_deadline_partial_then_complete(setup, tmp_path):
    """--resident --deadline_s: an expired budget yields a PARTIAL CSV over the
    harvested images; the rerun (no deadline) resumes from the spilled chunks and
    matches an uninterrupted run."""
    import pandas as pd

    from mammodissect.dissect.engine import DissectConfig, run_dissection

    probe, small = setup  # 12 images
    base = dict(target_model="breastclip", clip_model="breastclip",
                target_layers=["blocks.0"], d_probe="synthetic_u8",
                concept_set="tests/assets/tiny_concepts.txt", batch_size=8,
                dissector_kwargs=small, num_top_concepts=2, num_top_images=2)

    logs = []
    cfg = DissectConfig(activation_dir=str(tmp_path / "a"),
                        result_dir=str(tmp_path / "r"), resident=True,
                        deadline_s=1e-9, **base)
    df_p, _ = run_dissection(cfg, probe=probe, log=logs.append)
    assert any("PARTIAL dissection" in str(l) for l in logs), logs
    assert len(df_p)  # still a valid CSV over the harvested subset

    cfg2 = DissectConfig(activation_dir=str(tmp_path / "a"),
                         result_dir=str(tmp_path / "r2"), resident=True, **base)
    logs2 = []
    df_c, _ = run_dissection(cfg2, probe=probe, log=logs2.append)
    assert any("resumed" in str(l) for l in logs2), logs2
    assert not any("PARTIAL" in str(l) for l in logs2)

    cfg3 = DissectConfig(activation_dir=str(tmp_path / "b"),
                         result_dir=str(tmp_path / "r3"), resident=True, **base)
    df_ref, _ = run_dissection(cfg3, probe=probe, log=lambda *_: None)
    pd.testing.assert_frame_equal(
        df_c.drop(columns=["similarity"]), df_ref.drop(columns=["similarity"]))


def test_resume_clamps_padding_when_tail_completes_chunk(setup, tmp_path):
    """Regression: a short final batch landing exactly on a chunk boundary left
    padding rows inside the last complete chunk; a rerun resumed with
    n_images = n_chunks * cap (> len(probe)), scoring garbage rows."""
    from mammodissect.data.probes import ArrayProbe
    from mammodissect.dissect.dissectors import get_dissector
    from mammodissect.dissect.engine import fused_harvest_embed_resident

    _, small = setup
    rng = np.random.default_rng(3)
    probe6 = ArrayProbe(rng.integers(0, 256, size=(6, 64, 48, 1), dtype=np.uint8),
                        mean=0.3, std=0.25)
    d = get_dissector("breastclip", **small)
    layers = ["blocks.0"]
    cache = str(tmp_path / "cache")

    # batch 4, cap = 2*4 = 8: images 5-6 land in batch 2 (2 valid + 2 padding),
    # which COMPLETES chunk 0 — no partial spilled
    a1, e1, *_, n1 = fused_harvest_embed_resident(
        d, probe6, layers, "avg", batch_size=4, chunk_batches=2,
        cache_dir=cache, cache_key="k6")
    assert n1 == 6

    # rerun: resumes from the complete chunk and must NOT report padded rows
    a2, e2, *_, n2 = fused_harvest_embed_resident(
        d, probe6, layers, "avg", batch_size=4, chunk_batches=2,
        cache_dir=cache, cache_key="k6")
    assert n2 == 6, n2
    cat = lambda cs, n: np.concatenate([np.asarray(c) for c in cs], axis=0)[:n]
    np.testing.assert_allclose(cat(a2, n2), cat(a1, n1), rtol=1e-5, atol=1e-5)


def test_resident_cache_key_covers_pool_mode(setup, tmp_path):
    """Regression: an interrupted avg-pool resident run's chunks were silently
    resumed by a max-pool rerun (identical geometry); the cache key now encodes
    pool_mode/layers/probe settings so the max run re-harvests."""
    import pandas as pd

    from mammodissect.dissect.engine import run_dissection

    probe, small = setup
    base = dict(target_model="breastclip", clip_model="breastclip",
                target_layers=["blocks.0"], d_probe="synthetic_u8",
                concept_set="tests/assets/tiny_concepts.txt", batch_size=4,
                dissector_kwargs=small, resident=True)

    def run(pool_mode, tag, deadline=None, act_dir="a"):
        cfg = DissectConfig(activation_dir=str(tmp_path / act_dir),
                            result_dir=str(tmp_path / tag), pool_mode=pool_mode,
                            deadline_s=deadline, **base)
        df, _ = run_dissection(cfg, probe=probe, log=lambda *_: None)
        return df

    run("avg", "avg_partial", deadline=0.0)  # interrupted: spills avg chunks
    df_max = run("max", "max_resumed")       # must NOT resume the avg chunks
    # ground truth from an untouched cache dir: equality proves no avg rows leaked
    df_max_fresh = run("max", "max_fresh", act_dir="b")
    pd.testing.assert_frame_equal(df_max.reset_index(drop=True),
                                  df_max_fresh.reset_index(drop=True))
