"""Fine-tune engine e2e (SURVEY.md §4 integration strategy): one run on synthetic PNGs
with a learnable signal — loss decreases, checkpoint round-trips, inference modes work."""
import os

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from mammodissect.train.experiments import (
    FinetuneConfig,
    do_experiments,
    split_folds,
    train_loop,
    loaded_inference_loop,
)


@pytest.fixture(scope="module")
def synth_data(tmp_path_factory):
    """PNG dataset where label == (bright center blob present)."""
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    rows = []
    for i in range(48):
        label = i % 2
        arr = rng.normal(0.4, 0.1, size=(32, 24)).clip(0, 1)
        if label:
            arr[12:22, 8:16] += 0.5
        p = root / f"img_{i}.png"
        Image.fromarray((arr.clip(0, 1) * 255).astype("uint8")).save(p)
        rows.append({
            "image_path": p.name, "cancer": label, "split": "training" if i < 32 else "test",
            "patient_id": i // 2, "laterality": "L" if i % 2 else "R", "fold": i % 2,
        })
    df = pd.DataFrame(rows)
    csv = root / "meta.csv"
    df.to_csv(csv, index=False)
    return str(csv), str(root)


def base_cfg(synth_data, tmp_path, **kw):
    csv, root = synth_data
    defaults = dict(
        csv_file=csv, data_dir=root, dataset="vindr", label="cancer",
        arch="t_test_ft", epochs=2, batch_size=8, lr=1e-3, warmup_epochs=0,
        img_size=(32, 24), checkpoints=str(tmp_path / "ckpt"),
        output_path=str(tmp_path / "out"), tensorboard_path=str(tmp_path / "tb"),
        dtype="float32", print_freq=1000, seed=1,
        bn_momentum=0.7,  # short smoke run: running stats must converge in ~20 steps
        pad_mode="same",  # toy 32x24 geometry is far from the 224-traced static chain
    )
    defaults.update(kw)
    return FinetuneConfig(**defaults)


def test_split_folds_vindr_split_column(synth_data, tmp_path):
    cfg = base_cfg(synth_data, tmp_path)
    df = pd.read_csv(cfg.csv_file)
    tr, va = split_folds(cfg, df)
    assert len(tr) == 32 and len(va) == 16


def test_split_folds_rsna_fold_column(synth_data, tmp_path):
    cfg = base_cfg(synth_data, tmp_path, dataset="rsna", cur_fold=0)
    df = pd.read_csv(cfg.csv_file)
    tr, va = split_folds(cfg, df)
    assert set(tr["fold"]) == {1} and set(va["fold"]) == {0}


def test_train_loop_learns_and_checkpoints(synth_data, tmp_path):
    cfg = base_cfg(synth_data, tmp_path, epochs=10)
    df = pd.read_csv(cfg.csv_file)
    tr, va = split_folds(cfg, df)
    logs = []
    result = train_loop(cfg, tr, va, log=logs.append)
    assert "prediction" in result.columns
    # best checkpoint was written
    ckpts = os.listdir(cfg.checkpoints)
    assert len(ckpts) >= 1
    # the planted signal is learnable: AUROC well above chance on the valid fold
    from mammodissect import metrics as M

    auroc = M.auroc(result["cancer"].values, result["prediction"].values)
    assert auroc > 0.8, (auroc, logs[-3:])


def test_do_experiments_and_loaded_inference(synth_data, tmp_path):
    cfg = base_cfg(synth_data, tmp_path, epochs=2)
    oof = do_experiments(cfg, log=lambda *a: None)
    assert "prediction" in oof.columns
    assert os.path.exists(os.path.join(cfg.output_path, "oof_predictions.csv"))
    # loaded-inference re-scores the saved ckpt predictions + FP/FN dumps
    ckpt = os.path.join(
        cfg.checkpoints,
        f"{cfg.model_base_name}_seed_{cfg.seed}_fold0_best_{cfg.label}_ver{cfg.VER}",
    )
    cfg2 = base_cfg(synth_data, tmp_path, inference_mode="load", finetuned_ckpt_path=ckpt)
    df = pd.read_csv(cfg2.csv_file)
    _, va = split_folds(cfg2, df)
    out, metrics = loaded_inference_loop(cfg2, va, log=lambda *a: None)
    assert "optimal_threshold" in metrics
    assert os.path.exists(os.path.join(cfg2.output_path, "fold0_false_positives.csv"))


def test_multiclass_density_mode(synth_data, tmp_path):
    """density -> 4-class CE path (`experiments.py:122,164`)."""
    csv, root = synth_data
    df = pd.read_csv(csv)
    df["density"] = np.arange(len(df)) % 4
    csv2 = os.path.join(str(tmp_path), "density.csv")
    df.to_csv(csv2, index=False)
    cfg = base_cfg(synth_data, tmp_path, label="density", epochs=1, csv_file=csv2)
    assert cfg.n_class == 4 and cfg.multiclass
    tr, va = split_folds(cfg, df)
    result = train_loop(cfg, tr, va, log=lambda *a: None)
    assert set(np.unique(result["prediction"])) <= {0.0, 1.0, 2.0, 3.0}
