"""Probe registry coverage: csv filters (EMBED subsets), combined concat, txt list."""
import numpy as np
import pandas as pd
import pytest
from PIL import Image

from mammodissect.data.probes import ConcatProbe, get_probe, synthetic_probe


@pytest.fixture(scope="module")
def csv_probe_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("probes")
    rng = np.random.default_rng(0)
    rows = []
    for i in range(8):
        Image.fromarray((rng.random((20, 16)) * 255).astype("uint8")).save(
            root / f"p{i}.png")
        rows.append({"image_path": f"p{i}.png", "Marker": i % 2, "Implant_type": 0,
                     "split": "training" if i < 6 else "test"})
    csv = root / "m.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    return str(csv), str(root)


def test_csv_filters_select_embed_subsets(csv_probe_data):
    csv, root = csv_probe_data
    p_all = get_probe(f"csv:{csv}", root=root, size_hw=(20, 16))
    assert len(p_all) == 8
    p_marker = get_probe(f"csv:{csv}", root=root, size_hw=(20, 16),
                         filters={"Marker": 1})
    assert len(p_marker) == 4
    # reference probe name with built-in filter
    p_named = get_probe("embed_marker_84", csv_file=csv, root=root)
    assert len(p_named) == 4


def test_csaw_split_selection(csv_probe_data):
    csv, root = csv_probe_data
    p = get_probe("csaw", csv_file=csv, root=root)
    assert len(p) == 6  # training rows


def test_combined_probe(csv_probe_data):
    a = synthetic_probe(n=5, h=20, w=16, c=1)
    b = synthetic_probe(n=3, h=20, w=16, c=1, seed=1)
    c = ConcatProbe([a, b])
    assert len(c) == 8
    np.testing.assert_array_equal(c.image(5), b.image(0))
    with pytest.raises(ValueError):
        ConcatProbe([a, synthetic_probe(n=2, h=10, w=16, c=1)])


def test_combined_spec_string(csv_probe_data):
    p = get_probe("combined:synthetic+synthetic", n=4, h=16, w=16, c=1)
    assert len(p) == 8


def test_txt_probe(tmp_path, csv_probe_data):
    csv, root = csv_probe_data
    lst = tmp_path / "list.txt"
    lst.write_text("p0.png 3\np1.png 7\n")
    p = get_probe(f"txt:{lst}", root=root, image_shape=(24, 24, 3))
    assert len(p) == 2
    assert p.label(1) == 7
    img = p.image(0)
    assert img.shape == (24, 24, 3)


def test_synthetic_u8_probe_spec():
    """CLI-reachable uint8 probe: image_u8 fast path + mammography constants."""
    from mammodissect.data.probes import get_probe

    p = get_probe("synthetic_u8", n=12, h=32, w=24, c=1)
    assert len(p) == 12 and p.image_shape == (32, 24, 1)
    assert p.image_u8(0).dtype == np.uint8
    assert abs(p.mean - 0.3089279) < 1e-6
    # normalized float view consistent with the on-device u8 math
    x = p.image(3)
    assert x.dtype == np.float32 and x.shape == (32, 24, 1)
    # deterministic across constructions
    q = get_probe("synthetic_u8", n=12, h=32, w=24, c=1)
    np.testing.assert_array_equal(p.image_u8(5), q.image_u8(5))
