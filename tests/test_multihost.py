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


class _SimulatedMultihostTarget:
    """Simulates the real n_procs>1 u8 harvest in ONE process: receives rank r's
    local slice of each global batch (what `make_array_from_process_local_data`
    would contribute), reassembles the GLOBAL batch from the base probe (what the
    host-spanning mesh materializes), and runs the same on-device u8 program a real
    SPMD harvest would run. Lets the engine's interleave-untangling reassembly
    (`harvest_probe`'s n_procs>1 branch) be asserted without a cluster."""

    def __init__(self, inner, base_probe, rank, nprocs):
        self.inner, self.base = inner, base_probe
        self.rank, self.nprocs = rank, nprocs
        self.calls = 0
        self.variables = inner.variables

    def harvest_u8_dispatch(self, images_u8, layers, pool_mode, mean, std):
        from mammodissect.data.probes import HostShardedProbe
        from mammodissect.dissect.capture import canonical_layer_name, layer_index

        local_bs = images_u8.shape[0]
        b = self.calls
        self.calls += 1
        # global batch b = concat over processes of their local slices
        shards = [HostShardedProbe(self.base, index=p, count=self.nprocs)
                  for p in range(self.nprocs)]
        g = np.zeros((self.nprocs * local_bs,) + tuple(images_u8.shape[1:]), np.uint8)
        for p, s in enumerate(shards):
            for j in range(local_bs):
                i = b * local_bs + j
                if i < len(s):
                    g[p * local_bs + j] = s.image_u8(i)
        # sanity: rank r's slice is exactly what the engine handed us
        np.testing.assert_array_equal(
            g[self.rank * local_bs : (self.rank + 1) * local_bs], images_u8)
        canon = [canonical_layer_name(l) for l in layers]
        capture = tuple(sorted({layer_index(c) for c in canon}))
        fn, names, widths = self.inner._fn_u8(
            capture, pool_mode, tuple(g.shape), float(mean), float(std))
        import jax

        flat = np.ascontiguousarray(g).reshape(-1)
        return fn(self.inner.variables, jax.device_put(flat)), names, widths


def _simulate_multihost_harvest(nprocs, n_images, batch_size, monkeypatch):
    import jax
    from jax.experimental import multihost_utils

    from mammodissect.data.probes import ArrayProbe
    from mammodissect.dissect.engine import harvest_probe
    from mammodissect.dissect.targets import get_target_model

    rng = np.random.default_rng(3)
    base = ArrayProbe(rng.integers(0, 256, size=(n_images, 32, 32, 1), dtype=np.uint8),
                      mean=0.3, std=0.25)
    layers = ["blocks.0", "blocks.2"]

    want, n_want = harvest_probe(get_target_model("tiny_cnn"), base, layers, "avg",
                                 batch_size)
    assert n_want == n_images

    # fresh instance (same seed -> same weights), kept mesh-free: the simulated
    # global batch size need not divide the test env's 8-device mesh
    inner = get_target_model("tiny_cnn")

    results = []
    for rank in range(nprocs):
        monkeypatch.setattr(jax, "process_count", lambda: nprocs)
        monkeypatch.setattr(jax, "process_index", lambda r=rank: r)
        # fake allgather: the simulated target already returns the global batch
        monkeypatch.setattr(multihost_utils, "process_allgather",
                            lambda x, tiled=True: np.asarray(x))
        target = _SimulatedMultihostTarget(inner, base, rank, nprocs)
        acc, n = harvest_probe(target, base, layers, "avg", batch_size)
        monkeypatch.undo()
        assert n == n_images
        results.append(acc)

    for rank, acc in enumerate(results):
        for l in layers:
            assert acc[l].shape == want[l].shape, (rank, l)
            np.testing.assert_allclose(acc[l], want[l], rtol=0, atol=1e-6,
                                       err_msg=f"rank {rank} layer {l}")


def test_simulated_2proc_harvest_matches_unsharded(monkeypatch):
    """2-process u8 harvest: per-batch allgather + interleave untangle + trim
    reassembles exactly the unsharded activations (even division)."""
    _simulate_multihost_harvest(2, 16, 8, monkeypatch)


def test_simulated_4proc_harvest_uneven_tail(monkeypatch):
    """4 processes, probe length not divisible by (procs x local batch): wrap-padded
    shard tails must be trimmed, not leak into the reassembled result."""
    _simulate_multihost_harvest(4, 21, 8, monkeypatch)


def test_simulated_3proc_prewrapped_probe_keeps_total(monkeypatch):
    """A caller-wrapped HostShardedProbe must not truncate the result to one shard
    (regression: n_total was computed from the wrapped probe's per-host length)."""
    import jax
    from jax.experimental import multihost_utils

    from mammodissect.data.probes import ArrayProbe, HostShardedProbe
    from mammodissect.dissect.engine import harvest_probe
    from mammodissect.dissect.targets import get_target_model

    nprocs, n_images = 3, 14
    rng = np.random.default_rng(5)
    base = ArrayProbe(rng.integers(0, 256, size=(n_images, 32, 32, 1), dtype=np.uint8),
                      mean=0.3, std=0.25)
    layers = ["blocks.0"]
    want, _ = harvest_probe(get_target_model("tiny_cnn"), base, layers, "avg", 6)
    inner = get_target_model("tiny_cnn")  # mesh-free instance for the simulation

    monkeypatch.setattr(jax, "process_count", lambda: nprocs)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    monkeypatch.setattr(multihost_utils, "process_allgather",
                        lambda x, tiled=True: np.asarray(x))
    target = _SimulatedMultihostTarget(inner, base, 1, nprocs)
    pre = HostShardedProbe(base, index=1, count=nprocs)
    acc, n = harvest_probe(target, pre, layers, "avg", 6)
    assert n == n_images  # NOT the per-host shard length (5)
    np.testing.assert_allclose(acc["blocks.0"], want["blocks.0"], rtol=0, atol=1e-6)


def test_simulated_2proc_f32_local_batch_respects_local_mesh(monkeypatch):
    """Regression: the f32 fallback must divide the global batch by process count
    BEFORE rounding against the LOCAL mesh. The old order (round then divide)
    produced a 3-row local batch on an 8-device data mesh — an XLA sharding crash
    (axis 0 partitioned 8 times, dimension size 3)."""
    import jax
    from jax.experimental import multihost_utils

    from mammodissect.data.probes import ArrayProbe
    from mammodissect.dissect.engine import harvest_probe
    from mammodissect.dissect.targets import get_target_model

    n_images = 10
    rng = np.random.default_rng(11)
    imgs = np.asarray(rng.normal(size=(n_images, 32, 32, 1)), np.float32)
    base = ArrayProbe(imgs)  # no mean/std: forces the f32 (non-u8) branch
    layers = ["blocks.0"]
    want, _ = harvest_probe(get_target_model("tiny_cnn"), base, layers, "avg", 6)

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    # tiled allgather stand-in: both "hosts" contribute this host's shard — rank 0's
    # rows land where the real gather would put them; the duplicate tail is trimmed
    monkeypatch.setattr(multihost_utils, "process_allgather",
                        lambda x, tiled=True: np.concatenate(
                            [np.asarray(x), np.asarray(x)], axis=0))
    target = get_target_model("tiny_cnn")  # engine attaches the local 8-device mesh
    acc, n = harvest_probe(target, base, layers, "avg", batch_size=6)
    assert n == n_images
    assert acc["blocks.0"].shape == want["blocks.0"].shape
    # rank 0's shard is the first ceil(10/2)=5 probe rows, in order
    np.testing.assert_allclose(acc["blocks.0"][:5], want["blocks.0"][:5],
                               rtol=0, atol=1e-5)


def test_resident_multihost_compose_simulated(monkeypatch, tmp_path):
    """--resident on a multi-host run composes (round-4): each host harvests its
    contiguous shard on LOCAL devices, the accumulators are allgathered back into
    probe order for scoring, and the CSV's top-activating-image ids are GLOBAL
    probe indices. Simulated 2-proc run must reproduce the single-process CSV."""
    import warnings

    import jax
    import pandas as pd
    from jax.experimental import multihost_utils

    from mammodissect.data.probes import ArrayProbe, HostShardedProbe
    from mammodissect.dissect.dissectors import get_dissector
    from mammodissect.dissect.engine import (
        DissectConfig,
        fused_harvest_embed_resident,
        run_dissection,
    )

    rng = np.random.default_rng(0)
    base = ArrayProbe(rng.integers(0, 256, size=(11, 32, 32, 1), dtype=np.uint8),
                      mean=0.3, std=0.25)
    small = {"image_shape": (32, 32, 1), "bert_layers": 1,
             "model_config": {
                 "name": "clip_custom", "temperature": 0.07,
                 "image_encoder": {"model_type": "cnn", "variant": "efficientnet-b0",
                                   "in_channels": 1},
                 "text_encoder": {"pooling": "eos"},
                 "projection_head": {"name": "linear", "proj_dim": 16}}}
    layers = ["blocks.0", "blocks.1"]
    base_cfg = dict(target_model="breastclip", clip_model="breastclip",
                    target_layers=layers, d_probe="synthetic_u8",
                    concept_set="tests/assets/tiny_concepts.txt", batch_size=4,
                    dissector_kwargs=small, resident=True,
                    num_top_concepts=2, num_top_images=3)

    # single-process reference CSV
    cfg_ref = DissectConfig(activation_dir=str(tmp_path / "a0"),
                            result_dir=str(tmp_path / "r0"), **base_cfg)
    df_ref, _ = run_dissection(cfg_ref, probe=base, log=lambda *a: None)

    # precompute every rank's local resident result (same seeded dissector) so the
    # fake allgather can hand each simulated rank the full gather
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        d_pre = get_dissector("breastclip", **small)
    from mammodissect.parallel.mesh import auto_data_mesh

    d_pre.set_mesh(auto_data_mesh())
    bs = cfg_ref.batch_size
    pre = {}
    for p in range(2):
        shard = HostShardedProbe(base, index=p, count=2)
        a, e, *_ , n_local = fused_harvest_embed_resident(
            d_pre, shard, layers, "avg",
            ((bs + len(jax.devices()) - 1) // len(jax.devices())) * len(jax.devices()))
        cat = lambda cs: np.concatenate([np.asarray(c) for c in cs], axis=0)
        pre[p] = (cat(a)[:n_local], cat(e)[:n_local], n_local)

    def fake_allgather(x, tiled=True):
        x = np.asarray(x)
        if x.shape == (1,):  # the counts gather
            return np.asarray([pre[0][2], pre[1][2]])
        which = 0 if x.shape[1] == pre[0][0].shape[1] else 1
        n_min = min(pre[0][2], pre[1][2])
        return np.concatenate([pre[p][which][:n_min] for p in range(2)], axis=0)

    dfs = []
    for rank in range(2):
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        monkeypatch.setattr(jax, "process_index", lambda r=rank: r)
        monkeypatch.setattr(multihost_utils, "process_allgather", fake_allgather)
        logs = []
        cfg = DissectConfig(activation_dir=str(tmp_path / f"a{rank+1}"),
                            result_dir=str(tmp_path / f"r{rank+1}"), **base_cfg)
        df, _ = run_dissection(cfg, probe=base, log=logs.append)
        monkeypatch.undo()
        assert any("multi-host: gathered 11 rows" in str(l) for l in logs), logs
        dfs.append(df)

    for df in dfs:
        pd.testing.assert_frame_equal(
            df.drop(columns=["similarity"]), df_ref.drop(columns=["similarity"]))
        for a, b in zip(df["similarity"], df_ref["similarity"]):
            np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)
        # image ids are GLOBAL probe indices
        assert all(0 <= i < 11 for row in df["images"] for i in row)


def test_iter_epoch_host_sharding_contract():
    """Multi-host epoch sharding (DistributedSampler parity): every host sees the
    same seeded order, shards are equal-length contiguous wrap-padded slices, the
    union covers the dataset, and eval reassembly (concat + trim) restores the
    unsharded prediction order."""
    from mammodissect.train.data import iter_epoch

    class DS:
        image_shape = (4, 4, 1)

        def __len__(self):
            return 11

        def image(self, i):
            return np.full((4, 4, 1), i, np.float32)

        def label(self, i):
            return float(i)

    ds, bs, hc = DS(), 4, 3
    per_host = []
    for hi in range(hc):
        rows = []
        batches = 0
        for b in iter_epoch(ds, bs, shuffle=False, host_index=hi, host_count=hc):
            rows.extend(b.labels[: b.n_valid].tolist())
            batches += 1
        per_host.append((rows, batches))
    # lockstep: identical batch counts; equal shard lengths (ceil(11/3) = 4)
    assert len({b for _, b in per_host}) == 1
    assert all(len(r) == 4 for r, _ in per_host)
    # reassembly = concat shards in host order, trim to the true length
    flat = [x for r, _ in per_host for x in r]
    np.testing.assert_array_equal(np.asarray(flat[:11]), np.arange(11, dtype=float))
    # the wrap rows at the global tail duplicate the head (DistributedSampler pad)
    np.testing.assert_array_equal(np.asarray(flat[11:]), [0.0])

    # shuffled epochs agree across hosts (same seed => same global permutation)
    orders = []
    for hi in range(hc):
        rows = []
        for b in iter_epoch(ds, bs, shuffle=True, seed=7, host_index=hi, host_count=hc):
            rows.extend(b.labels[: b.n_valid].tolist())
        orders.append(rows)
    union = sorted(set(int(x) for r in orders for x in r))
    assert union == list(range(11))


def test_train_eval_multihost_gather(monkeypatch):
    """_run_eval on a simulated 2-process run: each 'host' scores its shard and the
    gathered predictions equal the single-host pass (order + trim)."""
    import pandas as pd

    import mammodissect.train.experiments as ex
    from jax.experimental import multihost_utils

    class DS:
        image_shape = (4, 4, 1)

        def __len__(self):
            return 7

        def image(self, i):
            return np.full((4, 4, 1), i, np.float32)

        def label(self, i):
            return float(i % 2)

    class FakeTrainer:
        def eval_batch(self, images, labels, n_valid=None):
            # prediction = the image's constant value (identity on row id)
            return 0.0, images[:, 0, 0, 0]

    ds = DS()
    want_loss, want = ex._run_eval(FakeTrainer(), ds, 4, np.float32)
    np.testing.assert_array_equal(want, np.arange(7, dtype=np.float32))

    collected = {}
    for hi in range(2):
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        monkeypatch.setattr(jax, "process_index", lambda hi=hi: hi)
        monkeypatch.setattr(multihost_utils, "process_allgather",
                            lambda x, tiled=True, hi=hi: collected.setdefault(hi, np.asarray(x)))
        ex._run_eval(FakeTrainer(), ds, 4, np.float32)
    # per-host locals concat + trim == unsharded result
    both = np.concatenate([collected[0], collected[1]])[: len(ds)]
    np.testing.assert_array_equal(both, want)


def test_local_rows_dedups_model_axis_replicas(monkeypatch):
    """Regression: under model parallelism each data shard is replicated across the
    'model' axis; _local_rows must keep one copy per row range, not concatenate
    every addressable replica."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mammodissect.train.trainer import Trainer

    mesh = make_mesh(model_parallel=2)  # 8 CPU devices -> data=4, model=2
    x = jax.device_put(jnp.arange(8, dtype=jnp.float32),
                       NamedSharding(mesh, P("data")))
    assert len(x.addressable_shards) == 8  # 4 row-ranges x 2 model replicas
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    rows = Trainer._local_rows(x)
    np.testing.assert_array_equal(rows, np.arange(8, dtype=np.float32))
