"""u8 training wire (VERDICT r4 weak #3): the post-transform uint8 host->device
wire with device-side min-max + mean/std normalization must (a) reproduce the
host normalization bit-for-bit on identical u8 input, and (b) match the f32
wire's fine-tune quality (AUROC) on a learnable synthetic task — the reference's
own input contract is uint8 through the transforms
(`Datasets/dataset_concepts.py:206-215`), so this is a wire change, not a
recipe change."""
import numpy as np
import pandas as pd
import pytest
from PIL import Image

from mammodissect.data import transforms as T


def test_u8_minmax_meanstd_matches_host_normalize():
    import jax

    from mammodissect.ops.normalize import u8_minmax_meanstd

    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, size=(4, 16, 12, 1), dtype=np.uint8)
    u8[1] = 7  # constant image: the hi == lo guard must map it to (0 - m)/s
    mean, std = 0.3089279, 0.25053555
    dev = np.asarray(jax.jit(u8_minmax_meanstd, static_argnums=(1, 2))(u8, mean, std))
    host = np.stack([T.minmax_meanstd(u8[i].astype(np.float32), mean, std)
                     for i in range(len(u8))])
    np.testing.assert_allclose(dev, host, atol=1e-6)


def test_to_u8_quantization_bound():
    rng = np.random.default_rng(1)
    arr = rng.random((8, 6, 1)).astype(np.float32)
    q = T.to_u8(arr)
    assert q.dtype == np.uint8
    np.testing.assert_allclose(q / 255.0, arr, atol=0.5 / 255.0 + 1e-7)


@pytest.fixture(scope="module")
def synth_pngs(tmp_path_factory):
    root = tmp_path_factory.mktemp("wire_imgs")
    rng = np.random.default_rng(0)
    rows = []
    for i in range(48):
        label = i % 2
        arr = rng.normal(0.4, 0.1, size=(32, 24)).clip(0, 1)
        if label:
            arr[12:22, 8:16] += 0.5
        p = root / f"img_{i}.png"
        Image.fromarray((arr.clip(0, 1) * 255).astype("uint8")).save(p)
        rows.append({"image_path": p.name, "cancer": label,
                     "split": "training" if i < 32 else "test",
                     "patient_id": i // 2, "laterality": "L" if i % 2 else "R",
                     "fold": i % 2})
    return pd.DataFrame(rows), str(root)


def test_classifier_dataset_u8_wire_dtypes(synth_pngs):
    from mammodissect.train.data import ClassifierDataset, iter_epoch

    df, root = synth_pngs
    for train in (False, True):
        ds = ClassifierDataset(df, root=root, size_hw=(32, 24), train=train,
                               wire="u8")
        img = ds.image(0)
        assert img.dtype == np.uint8 and img.shape == (32, 24, 1), train
        batch = next(iter_epoch(ds, 8))
        assert batch.images.dtype == np.uint8
    # f32 stays f32
    ds = ClassifierDataset(df, root=root, size_hw=(32, 24), wire="f32")
    assert ds.image(0).dtype == np.float32
    with pytest.raises(ValueError):
        ClassifierDataset(df, root=root, wire="u16")


def test_eval_u8_wire_predictions_match_host_normalized(synth_pngs):
    """Same uint8 pixels through (a) host normalize + f32 wire and (b) u8 wire +
    device normalize must produce identical eval predictions (the two paths
    differ only in WHERE the normalize runs)."""
    import optax

    from mammodissect.train.data import ClassifierDataset
    from mammodissect.train.experiments import FinetuneConfig, build_model
    from mammodissect.train.trainer import Trainer

    df, root = synth_pngs
    mean, std = 0.3089279, 0.25053555
    module, variables = build_model(FinetuneConfig(
        arch="t_test_ft", img_size=(32, 24), dtype="float32", pad_mode="same"))
    tx = optax.sgd(1e-3)
    mk = lambda wire: Trainer(module, dict(variables), tx, loss_kind="bce",
                              input_wire=wire, norm_mean=mean, norm_std=std)
    ds_u8 = ClassifierDataset(df, root=root, size_hw=(32, 24), mean=mean, std=std,
                              wire="u8")
    imgs_u8 = np.stack([ds_u8.image(i) for i in range(8)])
    # host-normalized f32 from the SAME u8 pixels (not the float-resize path)
    imgs_f32 = np.stack([T.minmax_meanstd(imgs_u8[i].astype(np.float32), mean, std)
                         for i in range(8)]).astype(np.float32)
    labels = df["cancer"].to_numpy()[:8].astype(np.float32)
    _, preds_u8 = mk("u8").eval_batch(imgs_u8, labels)
    _, preds_f32 = mk("f32").eval_batch(imgs_f32, labels)
    np.testing.assert_allclose(preds_u8, preds_f32, atol=1e-6)


def test_finetune_auroc_parity_u8_vs_f32(synth_pngs, tmp_path):
    """The measured parity check VERDICT r4 asked for: a synthetic fine-tune run
    per wire, AUROC compared. The u8 wire's post-augment quantization must not
    cost learnability."""
    from sklearn.metrics import roc_auc_score

    from mammodissect.train.experiments import FinetuneConfig, split_folds, train_loop

    df, root = synth_pngs
    aurocs = {}
    for wire in ("f32", "u8"):
        cfg = FinetuneConfig(
            csv_file="unused", data_dir=root, dataset="vindr", label="cancer",
            arch="t_test_ft", epochs=10, batch_size=8, lr=1e-3, warmup_epochs=0,
            img_size=(32, 24), checkpoints=str(tmp_path / f"ckpt_{wire}"),
            output_path=str(tmp_path / f"out_{wire}"),
            tensorboard_path=str(tmp_path / f"tb_{wire}"),
            dtype="float32", print_freq=1000, seed=1, bn_momentum=0.7,
            pad_mode="same", input_wire=wire,
        )
        tr, va = split_folds(cfg, df)
        result = train_loop(cfg, tr, va, log=lambda *_: None)
        aurocs[wire] = roc_auc_score(result["cancer"], result["prediction"])
    assert aurocs["f32"] >= 0.9 and aurocs["u8"] >= 0.9, aurocs
    assert abs(aurocs["f32"] - aurocs["u8"]) <= 0.05, aurocs


def test_pretrain_step_u8_wire(tmp_path):
    """One contrastive step with a u8-wire ImageTextDataset: the step normalizes
    images/image_views on device and the loss is finite."""
    import os

    from mammodissect.data.imagetext import ImageTextDataset
    from mammodissect.train.pretrain import PretrainConfig, pretrain

    root = tmp_path / "mv"
    rng = np.random.default_rng(0)
    rows = []
    prompts = {"Mass": {"pos_right": ["mass right"], "pos_left": ["mass left"],
                        "neg_right": ["no mass right"], "neg_left": ["no mass left"]}}
    for pid in range(8):
        os.makedirs(root / str(pid), exist_ok=True)
        for img in ("cc0.png", "mlo0.png"):
            Image.fromarray((rng.random((32, 24)) * 255).astype("uint8")).save(
                root / str(pid) / img)
        rows.append({"patient_id": pid, "view": "['CC', 'MLO']",
                     "CC": "['cc0.png']", "MLO": "['mlo0.png']",
                     "CC_FINDING": "[['Mass'], [], [], ['Mass']]",
                     "MLO_FINDING": "[['Mass'], [], [], ['Mass']]"})
    ds = ImageTextDataset(pd.DataFrame(rows), root=str(root), size_hw=(32, 24),
                          prompt_json=prompts, seed=1, wire="u8")
    item = ds[0]
    assert item["image"].dtype == np.uint8
    cfg = PretrainConfig(epochs=1, batch_size=8, img_size=(32, 24), bert_layers=1,
                         image_variant="efficientnet-test", dtype="float32", log_freq=1,
                         checkpoints=str(tmp_path / "ck"),
                         tensorboard_path=str(tmp_path / "tb"))
    result = pretrain(cfg, ds, log=lambda *_: None)
    assert np.isfinite(result["last_loss"])


def test_load_for_wire_matrix(synth_pngs):
    """Pin the shared (train x wire) load matrix: both dataset loaders delegate
    to load_for_wire, so its four branches ARE the training input contract."""
    import os

    df, root = synth_pngs
    path = os.path.join(root, df.iloc[0]["image_path"])
    mean, std = 0.3089279, 0.25053555
    size = (16, 12)

    # eval/u8: uint8-resized load (the reference's pre-normalize eval pipeline)
    e_u8 = T.load_for_wire(path, size, mean, std, train=False, wire="u8",
                           rng=np.random.default_rng(0))
    assert e_u8.dtype == np.uint8 and e_u8.shape == (16, 12, 1)
    np.testing.assert_array_equal(e_u8, T.load_image_u8_resized(path, size))

    # eval/f32: the fused resize+normalize loader (native cv2-style bilinear when
    # built, PIL fallback otherwise — interpolation-level parity is pinned by
    # test_native.py; here we pin the branch ROUTING)
    e_f32 = T.load_for_wire(path, size, mean, std, train=False, wire="f32",
                            rng=np.random.default_rng(0))
    assert e_f32.dtype == np.float32 and e_f32.shape == (16, 12, 1)
    ref = T.gray_resize_normalize(T.load_image(path, grayscale=True), size,
                                  mean, std)
    np.testing.assert_array_equal(e_f32, ref)

    # train/u8 vs train/f32: SAME augmentation stream (identical rng seed), so
    # the u8 wire is exactly the f32 image quantized to the 1/255 grid
    t_u8 = T.load_for_wire(path, size, mean, std, train=True, wire="u8",
                           rng=np.random.default_rng(7))
    t_f32 = T.load_for_wire(path, size, mean, std, train=True, wire="f32",
                            rng=np.random.default_rng(7))
    assert t_u8.dtype == np.uint8 and t_f32.dtype == np.float32
    aug = T.augment_train(T.resize(T.load_image(path, grayscale=True), size),
                          np.random.default_rng(7))
    np.testing.assert_array_equal(t_u8, T.to_u8(aug))
    np.testing.assert_allclose(t_f32, T.minmax_meanstd(aug, mean, std), atol=1e-6)
