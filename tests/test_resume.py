"""Checkpoint resume: params + optimizer state + step survive a save/restore cycle
and training continues from the saved epoch."""
import os

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from mammodissect.train.experiments import FinetuneConfig, split_folds, train_loop


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    root = tmp_path_factory.mktemp("rs")
    rng = np.random.default_rng(0)
    rows = []
    for i in range(16):
        arr = rng.normal(0.4, 0.1, size=(32, 24)).clip(0, 1)
        if i % 2:
            arr[10:20, 8:16] += 0.4
        Image.fromarray((arr.clip(0, 1) * 255).astype("uint8")).save(root / f"i{i}.png")
        rows.append({"image_path": f"i{i}.png", "cancer": i % 2,
                     "split": "training" if i < 12 else "test"})
    csv = root / "m.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    return str(csv), str(root)


def test_resume_continues_training(data, tmp_path):
    csv, root = data
    common = dict(csv_file=csv, data_dir=root, dataset="vindr", label="cancer",
                  arch="t_test_ft", batch_size=8, lr=1e-3, warmup_epochs=0,
                  img_size=(32, 24), dtype="float32", train_eval=False,
                  bn_momentum=0.7, print_freq=1000, seed=3,
                  output_path=str(tmp_path / "o"),
                  tensorboard_path=str(tmp_path / "tb"))
    df = pd.read_csv(csv)

    # run 2 epochs and keep the best checkpoint
    cfg1 = FinetuneConfig(epochs=2, checkpoints=str(tmp_path / "ck1"), **common)
    tr, va = split_folds(cfg1, df)
    train_loop(cfg1, tr, va, log=lambda *a: None)
    ckpt = os.path.join(
        cfg1.checkpoints,
        f"{cfg1.model_base_name}_seed_{cfg1.seed}_fold0_best_cancer_ver{cfg1.VER}")
    assert os.path.exists(ckpt)

    # resume into a 4-epoch schedule: must start past epoch 0 and keep the step count
    cfg2 = FinetuneConfig(epochs=4, checkpoints=str(tmp_path / "ck2"),
                          resume_from=ckpt, **common)
    logs = []
    result = train_loop(cfg2, tr, va, log=logs.append)
    resume_lines = [l for l in logs if "[resume]" in str(l)]
    assert resume_lines, logs[:3]
    # restored a nonzero step and continued
    assert "restored step" in resume_lines[0]
    assert int(resume_lines[0].split("step ")[1].split(",")[0]) >= 1
    assert "prediction" in result.columns
