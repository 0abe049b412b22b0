"""Multihost helper tests (single-process semantics + global batch assembly)."""
import numpy as np

import jax

from mammodissect.parallel.mesh import make_mesh
from mammodissect.parallel.multihost import (
    gather_predictions,
    global_batch_from_local,
    initialize,
)


def test_initialize_singleprocess_noop():
    initialize(num_processes=1)  # must not raise


def test_gather_predictions_trims():
    local = np.arange(10, dtype=np.float32)
    out = gather_predictions(local, total=7)
    np.testing.assert_array_equal(out, np.arange(7, dtype=np.float32))


def test_global_batch_from_local_shards_data_axis():
    mesh = make_mesh()  # 8 CPU devices on 'data'
    batch = {"x": np.arange(16, dtype=np.float32).reshape(16, 1)}
    g = global_batch_from_local(mesh, batch)
    assert g["x"].shape == (16, 1)
    # sharded over data axis: 8 shards of 2 rows
    assert len(g["x"].sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(g["x"]), batch["x"])


def test_host_sharded_probe_contract():
    """HostShardedProbe: balanced per-host lengths with DistributedSampler-style wrap
    padding; shards cover the probe contiguously and in order."""
    from mammodissect.data.probes import ArrayProbe, HostShardedProbe

    rng = np.random.default_rng(0)
    base = ArrayProbe(rng.integers(0, 255, size=(10, 4, 4, 1), dtype=np.uint8)
                      .astype(np.float32), mean=0.1, std=0.9)
    shards = [HostShardedProbe(base, index=i, count=4) for i in range(4)]
    assert all(len(s) == 3 for s in shards)  # ceil(10/4)
    assert shards[0].mean == base.mean and shards[0].std == base.std

    seen = [s.image(i) for s in shards for i in range(len(s))]
    # first 10 rows are the probe in order; the tail repeats the final image (pad)
    for i in range(10):
        np.testing.assert_array_equal(seen[i], base.image(i))
    for pad in seen[10:]:
        np.testing.assert_array_equal(pad, base.image(9))
