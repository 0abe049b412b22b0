"""Inference-mode 'y' and linear-probe arch coverage (fast: tiny images, 1 epoch)."""
import os

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from mammodissect.train.experiments import (
    FinetuneConfig,
    inference_loop,
    split_folds,
    train_loop,
)


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    root = tmp_path_factory.mktemp("fm")
    rng = np.random.default_rng(0)
    rows = []
    for i in range(16):
        arr = (rng.random((32, 24)) * 255).astype("uint8")
        Image.fromarray(arr).save(root / f"i{i}.png")
        rows.append({"image_path": f"i{i}.png", "cancer": i % 2,
                     "split": "training" if i < 12 else "test"})
    csv = root / "m.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    return str(csv), str(root)


def cfg_for(data, tmp_path, **kw):
    csv, root = data
    base = dict(csv_file=csv, data_dir=root, dataset="vindr", label="cancer",
                arch="t_test_ft", epochs=1, batch_size=8, lr=1e-3, warmup_epochs=0,
                img_size=(32, 24), dtype="float32", checkpoints=str(tmp_path / "ck"),
                output_path=str(tmp_path / "o"), tensorboard_path=str(tmp_path / "tb"),
                train_eval=False, print_freq=1000)
    base.update(kw)
    return FinetuneConfig(**base)


def test_inference_mode_y_rebuilds_and_scores(data, tmp_path):
    cfg = cfg_for(data, tmp_path)
    df = pd.read_csv(cfg.csv_file)
    tr, va = split_folds(cfg, df)
    train_loop(cfg, tr, va, log=lambda *a: None)
    ckpt = os.path.join(
        cfg.checkpoints,
        f"{cfg.model_base_name}_seed_{cfg.seed}_fold0_best_{cfg.label}_ver{cfg.VER}")
    assert os.path.exists(ckpt)
    cfg_inf = cfg_for(data, tmp_path, inference_mode="y", finetuned_ckpt_path=ckpt)
    out = inference_loop(cfg_inf, va, log=lambda *a: None)
    assert "prediction" in out.columns and len(out) == len(va)
    assert np.isfinite(out["prediction"]).all()


def test_linear_probe_freezes_encoder(data, tmp_path):
    """'*_lp' arch: encoder params must not change during training
    (`breast_clip_classifier.py:41-49` freeze parity)."""
    import jax

    from mammodissect.train.experiments import build_model
    from mammodissect.models.classifier import frozen_param_labels
    from mammodissect.train.trainer import Trainer, make_optimizer

    cfg = cfg_for(data, tmp_path, arch="t_test_lp")
    module, variables = build_model(cfg)
    labels = frozen_param_labels(variables["params"], True)
    tx = make_optimizer(1e-2, 0.0, 0, 10, param_labels=labels)
    tr = Trainer(module, variables, tx, loss_kind="bce")
    enc_before = np.asarray(jax.tree_util.tree_leaves(
        tr.state.params["image_encoder"])[0])
    head_before = np.asarray(tr.state.params["classifier"]["fc"]["kernel"])
    x = np.random.default_rng(0).normal(size=(8, 32, 24, 1)).astype(np.float32)
    y = np.asarray([0, 1] * 4, np.float32)
    tr.train_batch(x, y)
    enc_after = np.asarray(jax.tree_util.tree_leaves(tr.state.params["image_encoder"])[0])
    np.testing.assert_array_equal(enc_before, enc_after)
    assert not np.allclose(head_before,
                           np.asarray(tr.state.params["classifier"]["fc"]["kernel"]))
