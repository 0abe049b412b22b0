"""ImageText dataset + pretraining loop e2e on the 8-device CPU mesh (tiny shapes)."""
import json
import os

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from mammodissect.data.imagetext import ImageTextDataset, load_dataset

PROMPTS = {
    "Mass": {"pos_right": ["mass right"], "pos_left": ["mass left"],
             "neg_right": ["no mass right"], "neg_left": ["no mass left"]},
    "No Finding": {"pos_right": ["clear right"], "pos_left": ["clear left"],
                   "neg_right": [], "neg_left": []},
}


@pytest.fixture(scope="module")
def multiview_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("mv")
    rng = np.random.default_rng(0)
    rows = []
    for pid in range(10):
        os.makedirs(root / str(pid), exist_ok=True)
        for img in ("cc0.png", "mlo0.png"):
            arr = (rng.random((32, 24)) * 255).astype("uint8")
            Image.fromarray(arr).save(root / str(pid) / img)
        rows.append({
            "patient_id": pid,
            "view": "['CC', 'MLO']",
            "CC": "['cc0.png']",
            "MLO": "['mlo0.png']",
            "CC_FINDING": "[['Mass'], [], [], ['Mass']]",
            "MLO_FINDING": "[['No Finding'], [], ['Mass'], []]",
        })
    return pd.DataFrame(rows), str(root)


def test_multiview_sampling_and_generated_text(multiview_data):
    df, root = multiview_data
    ds = ImageTextDataset(df, root=root, dataset="vindr", size_hw=(32, 24),
                          prompt_json=PROMPTS, split="train", seed=3)
    item = ds[0]
    assert item["image"].shape == (32, 24, 1)
    assert item["image_view"].shape == (32, 24, 1)
    assert isinstance(item["text"], str) and len(item["text"]) > 0
    # 'No Finding' suppression: MLO text never mentions negatives
    ds_det = ImageTextDataset(df, root=root, dataset="vindr", size_hw=(32, 24),
                              prompt_json=PROMPTS, split="valid")
    texts = {ds_det[0]["text"], ds_det[0]["text2"]}
    assert any("mass" in t or "clear" in t for t in texts)


def test_collated_batches_contract(multiview_data):
    from mammodissect.models.tokenizers import WordPieceTokenizer

    df, root = multiview_data
    ds = ImageTextDataset(df, root=root, size_hw=(32, 24), prompt_json=PROMPTS)
    tok = WordPieceTokenizer.toy(words=["mass", "right", "left", "no", "clear"])
    batches = list(ds.batches(tok, batch_size=4, max_length=16))
    assert len(batches) == 2  # 10 rows, drop_last
    b = batches[0]
    assert b["images"].shape == (4, 32, 24, 1)
    assert b["image_views"].shape == (4, 32, 24, 1)
    assert b["input_ids"].shape == (4, 16)
    assert b["input_ids2"].shape == (4, 16)


def test_load_dataset_factory(multiview_data):
    df, root = multiview_data
    ds = load_dataset("imagetext", df=df, root=root, size_hw=(32, 24),
                      prompt_json=PROMPTS)
    assert len(ds) == 10
    with pytest.raises(KeyError):
        load_dataset("no_such_type")


def test_pretrain_loop_e2e(multiview_data, tmp_path):
    """One tiny pretraining run on the 8-device mesh: loss finite, ckpt written."""
    from mammodissect.train.pretrain import PretrainConfig, pretrain

    df, root = multiview_data
    ds = ImageTextDataset(df, root=root, size_hw=(32, 24), prompt_json=PROMPTS, seed=1)
    cfg = PretrainConfig(
        epochs=2, batch_size=8, lr=1e-3, warmup_steps=2, img_size=(32, 24),
        image_variant="efficientnet-test", bert_layers=2, model_parallel=2,
        checkpoints=str(tmp_path / "ck"), tensorboard_path=str(tmp_path / "tb"),
        dtype="float32", log_freq=1, text_max_length=16,
    )
    logs = []
    result = pretrain(cfg, ds, log=logs.append)
    assert np.isfinite(result["last_loss"])
    assert os.path.isdir(result["final_checkpoint"])
    assert result["steps"] == 2  # 10//8=1 step/epoch x 2 epochs


def test_collated_batches_host_sharding(multiview_data):
    """Multi-host contrastive batching: batch_size is GLOBAL; each host's slices of
    every seeded batch are disjoint, lockstep, and together cover exactly the
    unsharded batch's rows (index-level contract — item materialization itself is
    stochastic through the augmentation RNG, as with DataLoader workers)."""
    from mammodissect.models.tokenizers import WordPieceTokenizer

    df, root = multiview_data
    tok = WordPieceTokenizer.toy(words=["mass", "right", "left", "no", "clear"])

    def record(host_index, host_count):
        ds = ImageTextDataset(df, root=root, size_hw=(32, 24), prompt_json=PROMPTS)
        seen, batch_marks = [], []
        orig = type(ds).__getitem__

        class Rec(type(ds)):
            def __getitem__(self, i):
                seen.append(int(i))
                return orig(self, i)

        ds.__class__ = Rec
        for _ in ds.batches(tok, batch_size=4, max_length=16, seed=5,
                            host_index=host_index, host_count=host_count):
            batch_marks.append(len(seen))
        return seen, batch_marks

    full, marks_full = record(0, 1)
    s0, marks0 = record(0, 2)
    s1, marks1 = record(1, 2)
    assert len(marks0) == len(marks1) == len(marks_full)  # lockstep batch counts
    prev = 0
    for k, mark in enumerate(marks_full):
        want = full[prev:mark]
        got0 = s0[k * 2 : k * 2 + 2]
        got1 = s1[k * 2 : k * 2 + 2]
        assert got0 + got1 == want  # per-batch host slices partition the global batch
        prev = mark
