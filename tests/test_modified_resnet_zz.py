"""ModifiedResNet (CLIP RN tower), grouped imagetext dataset, report segmentation."""
import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp


def test_modified_resnet_forward_and_pool():
    from mammodissect.models.modified_resnet import ModifiedResNet

    m = ModifiedResNet(variant="RN50", input_size=64)
    x = jnp.ones((1, 64, 64, 3), jnp.float32)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    emb, cap = m.apply(v, x, capture=("conv1", "layer4"))
    assert emb.shape == (1, 1024)  # RN50 embed dim
    assert cap["conv1"].shape == (1, 64)
    assert cap["layer4"].shape == (1, 2048)


def test_modified_resnet_target_registry():
    from mammodissect.dissect.targets import get_target_model
    import mammodissect.models.modified_resnet  # noqa: F401

    t = get_target_model("clip_rn50", input_size=64)
    out = t.harvest(np.zeros((2, 64, 64, 3), np.float32), ["layer1", "layer2"])
    assert out["layer1"].shape == (2, 256)
    e = t.embed_images(np.zeros((2, 64, 64, 3), np.float32))
    np.testing.assert_allclose(np.linalg.norm(e, axis=1), 1.0, rtol=1e-5)


def test_segment_report():
    from mammodissect.data.imagetext import segment_report

    text = "There is a mass.  No calcification seen!\nBIRADS 2. ok"
    segs = segment_report(text)
    assert segs == ["There is a mass.", "No calcification seen!", "BIRADS 2."]


def test_grouped_dataset(tmp_path):
    from PIL import Image

    from mammodissect.data.imagetext import GroupedImageTextDataset

    rng = np.random.default_rng(0)
    rows = []
    for pid in range(4):
        for lat in ("L", "R"):
            d = tmp_path / str(pid)
            d.mkdir(exist_ok=True)
            for img in (f"{lat}cc.png", f"{lat}mlo.png"):
                Image.fromarray((rng.random((16, 12)) * 255).astype("uint8")).save(d / img)
            # two rows per (patient, laterality) group -> grouping dedupes
            for _ in range(2):
                rows.append({
                    "patient_id": pid, "laterality": lat,
                    "view": "['CC', 'MLO']",
                    "CC": f"['{lat}cc.png']", "MLO": f"['{lat}mlo.png']",
                    "REPORT": "['There is a mass. No suspicious calcification.']",
                })
    df = pd.DataFrame(rows)
    ds = GroupedImageTextDataset(df, root=str(tmp_path), size_hw=(16, 12), split="valid")
    assert len(ds) == 8  # 4 patients x 2 lateralities, deduped from 16 rows
    item = ds[0]
    assert item["image"].shape == (16, 12, 1)
    assert item["text"] == "There is a mass."
    assert item["text2"] == "No suspicious calcification."


def test_attnpool_grid_mismatch_raises():
    """Regression: feeding a ModifiedResNet built for 224 a smaller image
    silently truncated the row-major 7x7 positional table onto the smaller grid
    (misaligned every row); the torch reference errors — so do we."""
    import jax
    import jax.numpy as jnp
    import pytest as _pytest

    from mammodissect.models.modified_resnet import ModifiedResNet

    m = ModifiedResNet(variant="RN50", input_size=64)  # spacial_dim 2
    variables = jax.jit(m.init)(jax.random.PRNGKey(0),
                                jnp.ones((1, 64, 64, 3), jnp.float32))
    with _pytest.raises(ValueError, match="does not match spacial_dim"):
        m.apply(variables, jnp.ones((1, 32, 32, 3), jnp.float32))
