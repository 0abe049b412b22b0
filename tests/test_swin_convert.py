"""Swin torch->flax conversion: numerical parity against an HF SwinModel constructed
from config (random init, no hub access needed)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mammodissect.models.swin import SwinEncoder, swin_torch_to_flax, SWIN_SPECS
from mammodissect.utils.torch_convert import merge_into


def test_swin_conversion_numerical():
    try:
        import torch
        from transformers import SwinConfig, SwinModel
    except Exception:
        pytest.skip("transformers Swin unavailable")

    torch.manual_seed(0)
    cfg = SwinConfig(
        image_size=32, patch_size=4, num_channels=1, embed_dim=8,
        depths=[2, 2], num_heads=[2, 4], window_size=2, mlp_ratio=4.0,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        drop_path_rate=0.0, use_absolute_embeddings=False,
    )
    tm = SwinModel(cfg, add_pooling_layer=True).eval()
    x = np.random.default_rng(0).normal(size=(2, 32, 32, 1)).astype(np.float32)
    with torch.no_grad():
        out = tm(torch.tensor(x.transpose(0, 3, 1, 2)))
        want = out.pooler_output.numpy()

    SWIN_SPECS["hf-test"] = dict(embed=8, depths=(2, 2), heads=(2, 4))
    m = SwinEncoder(variant="hf-test", patch_size=4, window=2, in_channels=1)
    variables = jax.jit(m.init)(jax.random.PRNGKey(0), jnp.asarray(x))
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    converted = swin_torch_to_flax(sd, prefix="")
    merged, mismatches = merge_into(variables["params"], converted)
    shape_mm = [m_ for m_ in mismatches if m_[0] == "shape"]
    assert not shape_mm, shape_mm

    got, _ = m.apply({"params": merged}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-3)


def test_image_aligner_dataset(tmp_path):
    import pandas as pd
    from PIL import Image

    from mammodissect.data.imagetext import ImageAlignerDataset

    rng = np.random.default_rng(0)
    for n in ("a.png", "b.png"):
        Image.fromarray((rng.random((16, 12)) * 255).astype("uint8")).save(tmp_path / n)
    df = pd.DataFrame([{
        "clip_image_path": "a.png", "clf_image_path": "b.png",
        "age": 52, "CLIP_bin": 1, "concept_0.25": 0.7,
    }])
    ds = ImageAlignerDataset(df, root=str(tmp_path), size_hw=(16, 12))
    item = ds[0]
    assert item["clip_image"].shape == (16, 12, 1)
    assert item["clf_image"].shape == (16, 12, 1)
    assert item["age"] == 52 and item["concept_0.25"] == 0.7
