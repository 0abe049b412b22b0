"""REAL multi-process harvest: 2 jax.distributed processes (gloo on CPU), no
monkeypatching — the coverage the simulated tests in test_multihost.py cannot
give. This caught a real bug: the engine auto-attached a LOCAL-devices mesh, so
the global-batch u8 program received a half-sized input on every process
(make_array_from_process_local_data needs a process-spanning mesh).
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

LAYERS = ["blocks.0", "blocks.2"]


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def real_2proc_results(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("mh") / "res.npz")
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_real_multihost_worker.py")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # worker sets its own 2-device count
    procs = [subprocess.Popen([sys.executable, worker, str(i), "2", str(port), out],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=280)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("real 2-process worker timed out")
        logs.append(stdout)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-2000:]
    return np.load(out)


import functools


@functools.lru_cache(maxsize=1)
def _single_proc_reference():
    from mammodissect.data.probes import ArrayProbe
    from mammodissect.dissect.engine import harvest_probe
    from mammodissect.dissect.targets import get_target_model

    rng = np.random.default_rng(0)
    u8_imgs = rng.integers(0, 256, size=(11, 64, 64, 1)).astype(np.uint8)
    probe = ArrayProbe(images=u8_imgs, mean=0.3089279, std=0.25053)
    acc, n = harvest_probe(get_target_model("tiny_cnn"), probe, LAYERS, "avg",
                           batch_size=4)
    assert n == 11
    return acc


def test_real_2proc_u8_harvest_matches_single_process(real_2proc_results):
    """Global-mesh u8 dispatch + allgather + interleave-untangling + trim, driven
    by REAL process_count/process_index/collectives."""
    ref = _single_proc_reference()
    for l in LAYERS:
        got = real_2proc_results[f"u8_{l}"]
        assert got.shape == ref[l].shape
        # same tolerance rationale as test_sharded_harvest.py: layout bugs move
        # whole rows (~activation magnitude), XLA:CPU conv-algorithm variance
        # across differently-compiled programs is ~1e-3
        np.testing.assert_allclose(got, ref[l], rtol=0, atol=2e-3)


def test_real_2proc_f32_fallback_matches_single_process(real_2proc_results):
    """The non-u8 branch (per-host local harvest, tiled allgather, trim) under
    real collectives — the ADVICE-r2 fix that previously had only simulated
    coverage."""
    ref = _single_proc_reference()
    for l in LAYERS:
        got = real_2proc_results[f"f32_{l}"]
        assert got.shape == ref[l].shape
        np.testing.assert_allclose(got, ref[l], rtol=0, atol=2e-3)


def test_real_2proc_training_matches_single_process(real_2proc_results):
    """Two REAL distributed train steps: the global batch is assembled from each
    host's local slice (global_batch_from_local) and gradients allreduce through
    GSPMD. Loss step 1 checks batch assembly; loss step 2 also checks that step
    1's update (and BN stats) were identical to a single-process run. The eval
    prediction gather must return the full global batch."""
    import jax
    import jax.numpy as jnp

    from mammodissect.models.classifier import BreastClipClassifierModule
    from mammodissect.train.trainer import Trainer, make_optimizer

    module = BreastClipClassifierModule(variant="efficientnet-test", n_class=1)
    variables = jax.jit(module.init)(
        jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 1), jnp.float32))
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}
    tx = make_optimizer(lr=1e-2, weight_decay=1e-4, warmup_steps=1, total_steps=10)
    trainer = Trainer(module, variables, tx, loss_kind="bce", pos_weight=2.0)
    rng = np.random.default_rng(7)
    images = np.asarray(rng.normal(size=(8, 32, 32, 1)), np.float32)
    labels = np.asarray(rng.integers(0, 2, size=(8,)), np.float32)
    want_losses = [trainer.train_batch(images, labels) for _ in range(2)]
    _, want_preds = trainer.eval_batch(images, labels)

    got_losses = real_2proc_results["train_losses"]
    np.testing.assert_allclose(got_losses, want_losses, rtol=2e-3, atol=2e-3)
    got_preds = real_2proc_results["eval_preds"]
    assert got_preds.shape == np.asarray(want_preds).shape
    np.testing.assert_allclose(got_preds, np.asarray(want_preds),
                               rtol=0, atol=2e-3)
