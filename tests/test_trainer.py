"""Trainer core tests on the 8-device CPU mesh (SURVEY.md §4 distributed strategy):
DP train step must reduce loss and match single-device grads."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from mammodissect.models.classifier import frozen_param_labels
from mammodissect.parallel.mesh import make_mesh
from mammodissect.train.trainer import Trainer, make_optimizer


class TinyClf(nn.Module):
    n_class: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(4, (3, 3), name="image_encoder_conv")(x)
        x = jax.nn.relu(x)
        x = x.mean(axis=(1, 2))
        x = nn.BatchNorm(use_running_average=not train, name="bn")(x)
        return nn.Dense(self.n_class, name="head")(x)


def _data(n=64, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, 8, 8, 1)).astype(np.float32)
    y = (x.mean(axis=(1, 2, 3)) > 0).astype(np.float32)
    return x, y


@pytest.fixture(scope="module")
def setup():
    module = TinyClf()
    variables = module.init(jax.random.PRNGKey(0), jnp.ones((1, 8, 8, 1)))
    return module, variables


def test_loss_decreases_multidevice(setup):
    module, variables = setup
    mesh = make_mesh()  # all 8 CPU devices on the data axis
    tx = make_optimizer(lr=5e-2, weight_decay=1e-4, warmup_steps=2, total_steps=40)
    tr = Trainer(module, variables, tx, loss_kind="bce", mesh=mesh)
    x, y = _data()
    losses = [tr.train_batch(x, y) for _ in range(30)]
    assert losses[-1] < losses[0] * 0.7, losses[::10]


def test_multidevice_matches_single_device(setup):
    """Same data, same seed: grads/updates on an 8-device mesh == 1-device mesh."""
    module, variables = setup
    x, y = _data(n=16, seed=3)
    results = []
    for devs in (jax.devices()[:1], jax.devices()):
        tx = make_optimizer(lr=1e-2, weight_decay=0.0, warmup_steps=0, total_steps=10)
        tr = Trainer(module, variables, tx, loss_kind="bce", mesh=make_mesh(devs), seed=7)
        tr.train_batch(x, y)
        leaf = jax.tree_util.tree_leaves(tr.state.params)[0]
        results.append(np.asarray(leaf))
    np.testing.assert_allclose(results[0], results[1], atol=1e-5)


def test_eval_returns_trimmed_predictions(setup):
    module, variables = setup
    tx = make_optimizer(1e-3, 0.0, 0, 10)
    tr = Trainer(module, variables, tx, loss_kind="bce", mesh=make_mesh())
    x, y = _data(n=16)
    loss, preds = tr.eval_batch(x, y)
    assert preds.shape == (16,)
    assert np.isfinite(loss)
    assert ((preds >= 0) & (preds <= 1)).all()  # sigmoid probs for binary


def test_frozen_labels_zero_encoder_updates(setup):
    module, variables = setup
    labels = frozen_param_labels(variables["params"], freeze_encoder=False)
    # manually freeze the conv by relabeling (TinyClf has no 'image_encoder' top key)
    labels = dict(labels)
    labels["image_encoder_conv"] = jax.tree_util.tree_map(
        lambda _: "frozen", labels["image_encoder_conv"]
    )
    tx = make_optimizer(1e-2, 0.0, 0, 10, param_labels=labels)
    tr = Trainer(module, variables, tx, loss_kind="bce")
    before = np.asarray(tr.state.params["image_encoder_conv"]["kernel"])
    head_before = np.asarray(tr.state.params["head"]["kernel"])
    x, y = _data(n=16)
    tr.train_batch(x, y)
    np.testing.assert_array_equal(
        before, np.asarray(tr.state.params["image_encoder_conv"]["kernel"])
    )
    assert not np.allclose(head_before, np.asarray(tr.state.params["head"]["kernel"]))


def test_ce_mode_multiclass(setup):
    module = TinyClf(n_class=4)
    variables = module.init(jax.random.PRNGKey(1), jnp.ones((1, 8, 8, 1)))
    tx = make_optimizer(1e-2, 0.0, 0, 10)
    tr = Trainer(module, variables, tx, loss_kind="ce", mesh=make_mesh())
    x, _ = _data(n=16)
    y = np.random.default_rng(0).integers(0, 4, 16)
    loss, preds = tr.eval_batch(x, y)
    assert preds.shape == (16,)
    assert set(np.unique(preds)).issubset({0.0, 1.0, 2.0, 3.0})


def test_padded_tail_rows_do_not_affect_gradients():
    """Regression: the tail batch of an epoch is padded to static shape; padded
    rows beyond n_valid must contribute NOTHING to loss or gradients (torch's
    short tail batch has no such rows). Two steps from identical state with
    different garbage in the padded rows must produce identical params.

    BN-free module: BatchNorm batch statistics necessarily see all rows — that
    residual is handled by iter_epoch wrap-padding REAL rows (tested below)."""

    class NoBN(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            x = nn.Conv(4, (3, 3), name="c")(x)
            x = jax.nn.relu(x).mean(axis=(1, 2))
            return nn.Dense(1, name="head")(x)

    module = NoBN()
    variables = module.init(jax.random.PRNGKey(0), jnp.ones((1, 8, 8, 1)))
    mesh = make_mesh()
    x, y = _data(8)

    def one_step(pad_fill):
        tx = make_optimizer(lr=5e-2, weight_decay=0.0, warmup_steps=0, total_steps=10)
        tr = Trainer(module, variables, tx, loss_kind="bce", mesh=mesh)
        imgs = x.copy()
        labels = y.copy()
        imgs[5:] = pad_fill
        labels[5:] = 1.0 - labels[5:]
        loss = tr.train_batch(imgs, labels, n_valid=5)
        return loss, jax.device_get(tr.state.params)

    l1, p1 = one_step(0.0)
    l2, p2 = one_step(77.0)
    assert l1 == l2
    jax.tree_util.tree_map(np.testing.assert_array_equal, p1, p2)


def test_iter_epoch_tail_wrap_pads_real_rows():
    """Regression: the tail batch padded with all-zero images/labels, feeding
    fake negatives into BatchNorm statistics; it must wrap real rows instead."""
    from mammodissect.train.data import iter_epoch

    class DS:
        image_shape = (4, 4, 1)

        def __len__(self):
            return 5

        def image(self, i):
            return np.full((4, 4, 1), float(i + 1), np.float32)

        def label(self, i):
            return float(i + 1)

    batches = list(iter_epoch(DS(), 4, shuffle=False))
    tail = batches[-1]
    assert tail.n_valid == 1
    assert tail.labels[0] == 5.0
    # padded rows repeat the real tail row, not zeros
    assert (tail.labels[1:] == 5.0).all()
    assert (tail.images[1:] == 5.0).all()
