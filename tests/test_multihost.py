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
