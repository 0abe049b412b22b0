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
