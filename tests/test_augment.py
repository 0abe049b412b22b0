"""Train-augmentation parity with the reference recipe (VERDICT r3 missing #1/#2):
albumentations Compose([HFlip, VFlip, Affine(rotate 20, translate 0.1, scale
[0.8,1.2], shear 20), ElasticTransform(alpha 10, sigma 15)], p=1.0) for the
classifier/pretrain path (`/root/reference/data/data_utils.py:25-67`,
`Datasets/dataset_utils.py:42-55`, `configs/transform/clahe.yaml:6-12`), and the
box-aware imgaug pipeline for the detection path (`Datasets/dataset_utils.py:64-71`)."""
import numpy as np
import pytest

from mammodissect.data import transforms as T


class ScriptedRng:
    """rng stub: .random() pops from `randoms`, .uniform(a, b) pops from `uniforms`
    (scalar calls only — elastic is disabled in scripted tests)."""

    def __init__(self, randoms, uniforms):
        self.randoms = list(randoms)
        self.uniforms = list(uniforms)

    def random(self):
        return self.randoms.pop(0)

    def uniform(self, a, b, size=None):
        assert size is None
        return self.uniforms.pop(0)


def _stripe_image(h=64, w=64):
    arr = np.zeros((h, w, 1), np.float32)
    arr[:, 30:34] = 1.0  # vertical stripe
    return arr


def test_affine_shear_actually_shears():
    """A pure x-shear must displace rows proportionally to their distance from the
    center row — the component the round-3 recipe omitted entirely."""
    arr = _stripe_image()
    fwd = T.affine_matrix(0.0, 0.0, 0.0, 1.0, 20.0, cx=32.0, cy=32.0)
    out = T.apply_affine(arr, fwd)
    top_cols = np.nonzero(out[4, :, 0] > 0.5)[0]
    mid_cols = np.nonzero(out[32, :, 0] > 0.5)[0]
    bot_cols = np.nonzero(out[60, :, 0] > 0.5)[0]
    assert len(top_cols) and len(mid_cols) and len(bot_cols)
    # center row unmoved; tan(20 deg) ~ 0.36 -> ~10 px displacement at +-28 rows
    assert abs(mid_cols.mean() - 31.5) < 1.5
    shift_top = top_cols.mean() - mid_cols.mean()
    shift_bot = bot_cols.mean() - mid_cols.mean()
    assert shift_top * shift_bot < 0  # opposite directions about the center
    assert 6 < abs(shift_top) < 14 and 6 < abs(shift_bot) < 14


def test_affine_identity_matrix_is_noop():
    arr = np.random.default_rng(0).normal(size=(32, 24, 1)).astype(np.float32)
    out = T.apply_affine(arr, np.eye(3))
    np.testing.assert_allclose(out, arr, atol=1e-5)


def test_elastic_deform_envelope():
    """alpha=10/sigma=15 must produce a smooth, small (sub-pixel-to-few-pixel)
    warp: the image changes but stays close; alpha=0 is the identity."""
    rng = np.random.default_rng(0)
    arr = rng.normal(size=(96, 80, 1)).astype(np.float32)
    out = T.elastic_deform(arr, np.random.default_rng(1), alpha=10.0, sigma=15.0)
    assert out.shape == arr.shape and out.dtype == np.float32
    assert not np.allclose(out, arr)  # it did something
    # the displacement field is gaussian_filter(U(-1,1), 15)*10 — amplitude < 0.5 px:
    # on a SMOOTH image (unit ramp over the width) the value change is bounded by
    # |displacement| * gradient, i.e. < 0.5 / 80
    ramp = np.tile(np.linspace(0, 1, 80, dtype=np.float32), (96, 1))[..., None]
    out_r = T.elastic_deform(ramp, np.random.default_rng(1), alpha=10.0, sigma=15.0)
    assert float(np.abs(out_r - ramp).max()) < 0.5 / 80 * 1.5
    out0 = T.elastic_deform(arr, np.random.default_rng(1), alpha=0.0, sigma=15.0)
    np.testing.assert_allclose(out0, arr, atol=1e-5)


def test_augment_train_envelope(monkeypatch):
    """Every sampled affine parameter stays in the reference ranges, the elastic
    stage runs with alpha=10/sigma=15, and the compose gate p works."""
    calls = {"affine": [], "elastic": []}
    real_affine = T.affine_matrix

    def spy_affine(angle, tx, ty, scale, shear, cx, cy):
        calls["affine"].append((angle, tx, ty, scale, shear))
        return real_affine(angle, tx, ty, scale, shear, cx, cy)

    def spy_elastic(arr, rng, alpha, sigma):
        calls["elastic"].append((alpha, sigma))
        return arr

    monkeypatch.setattr(T, "affine_matrix", spy_affine)
    monkeypatch.setattr(T, "elastic_deform", spy_elastic)

    rng = np.random.default_rng(0)
    arr = np.random.default_rng(1).normal(size=(40, 32, 1)).astype(np.float32)
    for _ in range(60):
        out = T.augment_train(arr, rng)
        assert out.shape == arr.shape
    # inner transforms are 0.5-gated: both stages fired a plausible number of times
    assert 15 <= len(calls["affine"]) <= 45
    assert 15 <= len(calls["elastic"]) <= 45
    for angle, tx, ty, scale, shear in calls["affine"]:
        assert abs(angle) <= 20.0 and abs(shear) <= 20.0
        assert 0.8 <= scale <= 1.2
        assert abs(tx) <= 0.1 * 32 and abs(ty) <= 0.1 * 40
    assert all(a == 10.0 and s == 15.0 for a, s in calls["elastic"])

    # p=0: identity, always
    out = T.augment_train(arr, rng, p=0.0)
    np.testing.assert_array_equal(out, arr)


def test_augment_detection_flip_moves_boxes():
    arr = _stripe_image(40, 60)
    boxes = np.array([[10.0, 5.0, 20.0, 15.0]], np.float32)
    # scripted: fliplr fires, flipud doesn't, affine params are identity
    rng = ScriptedRng(randoms=[0.0, 0.9], uniforms=[0.0, 0.0, 0.0, 1.0, 0.0])
    out, bx = T.augment_detection(arr, boxes, rng, elastic_alpha=0.0)
    np.testing.assert_allclose(bx, [[60 - 20, 5.0, 60 - 10, 15.0]], atol=1e-4)
    np.testing.assert_allclose(out, arr[:, ::-1], atol=1e-5)

    rng = ScriptedRng(randoms=[0.9, 0.0], uniforms=[0.0, 0.0, 0.0, 1.0, 0.0])
    _, bx = T.augment_detection(arr, boxes, rng, elastic_alpha=0.0)
    np.testing.assert_allclose(bx, [[10.0, 40 - 15, 20.0, 40 - 5]], atol=1e-4)


def test_augment_detection_box_tracks_bright_region():
    """The transformed box must keep covering the object it annotates: a bright
    rectangle's mass stays inside the transformed box through the full pipeline
    (flips + affine with shear + elastic)."""
    h, w = 120, 100
    arr = np.zeros((h, w, 1), np.float32)
    arr[40:70, 30:60] = 1.0
    boxes = np.array([[30.0, 40.0, 60.0, 70.0]], np.float32)
    for seed in range(6):
        rng = np.random.default_rng(seed)
        out, bx = T.augment_detection(arr, boxes, rng)
        x1, y1, x2, y2 = bx[0]
        # pad 2 px for bilinear bleed, clip to frame for the mass integral
        xi1, yi1 = max(int(x1) - 2, 0), max(int(y1) - 2, 0)
        xi2, yi2 = min(int(np.ceil(x2)) + 2, w), min(int(np.ceil(y2)) + 2, h)
        total = float(out.sum())
        if total < 1.0:
            continue  # object pushed (almost) out of frame: nothing to cover
        inside = float(out[yi1:yi2, xi1:xi2].sum())
        assert inside / total > 0.98, (seed, inside, total, bx)


def test_transform_boxes_affine_known_matrix():
    fwd = T.affine_matrix(90.0, 0.0, 0.0, 1.0, 0.0, cx=0.0, cy=0.0)
    # 90 deg rotation about origin: (x, y) -> (x cos90 - y sin90, x sin90 + y cos90)
    bx = T.transform_boxes_affine(np.array([[1.0, 0.0, 2.0, 0.0]]), fwd)
    np.testing.assert_allclose(bx, [[0.0, 1.0, 0.0, 2.0]], atol=1e-6)


def test_detection_dataset_train_augments(tmp_path):
    """DetectionDataset(train=True) applies the box-aware pipeline before the
    min-max/mean-std normalization; eval path is untouched by the rng."""
    import pandas as pd
    from PIL import Image

    from mammodissect.train.detection_data import DetectionDataset

    img = np.zeros((80, 64), np.uint8)
    img[20:50, 10:40] = 200
    p = tmp_path / "a.png"
    Image.fromarray(img).save(p)
    df = pd.DataFrame({
        "image_path": [p.name, p.name],
        "xmin": [10, 12], "ymin": [20, 22], "xmax": [40, 30], "ymax": [50, 33],
        "finding": ["Mass", "Mass"],
    })
    kw = dict(df=df, root=str(tmp_path), size_hw=(80, 64), max_boxes=4)
    ds_eval = DetectionDataset(train=False, **kw)
    it_e = ds_eval[0]
    assert it_e["n_boxes"] == 2
    np.testing.assert_allclose(it_e["boxes"][0, :4], [10, 20, 40, 50], atol=1e-4)

    ds_train = DetectionDataset(train=True, seed=0, **kw)
    it_t = ds_train[0]
    assert it_t["image"].shape == it_e["image"].shape
    assert it_t["n_boxes"] == 2
    # augmentation moved something (affine always applies on the detection path)
    assert not np.allclose(it_t["boxes"][:2, :4], it_e["boxes"][:2, :4], atol=0.25) \
        or not np.allclose(it_t["image"], it_e["image"], atol=1e-3)
    # normalization contract intact: standardized values, padding rows stay -1
    assert it_t["boxes"][2, 0] == -1.0
    assert np.isfinite(it_t["image"]).all()
