"""Torch→Flax conversion tests: build real torch modules with the reference's layer
names, convert, and assert numerical equivalence of the JAX forward."""
import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from mammodissect.utils.torch_convert import (
    bert_torch_to_flax,
    conv_to_flax,
    efficientnet_torch_to_flax,
    linear_to_flax,
    merge_into,
)


def test_conv_layout_equivalence():
    """torch Conv2d(NCHW, OIHW) == flax Conv(NHWC, HWIO) after transposes."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 5, 7, 3)).astype(np.float32)  # NHWC
    tconv = tnn.Conv2d(3, 4, kernel_size=3, padding=1, bias=True)
    with torch.no_grad():
        want = tconv(torch.tensor(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    from flax import linen as nn

    fconv = nn.Conv(4, (3, 3), padding=((1, 1), (1, 1)))
    params = {
        "params": {
            "kernel": conv_to_flax(tconv.weight.detach().numpy()),
            "bias": tconv.bias.detach().numpy(),
        }
    }
    got = np.asarray(fconv.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_depthwise_conv_equivalence():
    rng = np.random.default_rng(1)
    c = 6
    x = rng.normal(size=(1, 8, 8, c)).astype(np.float32)
    tconv = tnn.Conv2d(c, c, kernel_size=3, padding=1, groups=c, bias=False)
    with torch.no_grad():
        want = tconv(torch.tensor(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    from flax import linen as nn

    fconv = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=c, use_bias=False)
    params = {"params": {"kernel": conv_to_flax(tconv.weight.detach().numpy())}}
    got = np.asarray(fconv.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_efficientnet_key_mapping_shapes():
    """Synthesize a lukemelas-style state dict for one block and check the tree layout."""
    sd = {}
    def add_conv(name, o, i, k):
        sd[name + ".weight"] = np.zeros((o, i, k, k), np.float32)
    def add_bn(name, c):
        for suf, shape in [("weight", c), ("bias", c), ("running_mean", c), ("running_var", c)]:
            sd[f"{name}.{suf}"] = np.zeros(shape, np.float32)

    add_conv("_conv_stem", 32, 1, 3); add_bn("_bn0", 32)
    add_conv("_blocks.0._depthwise_conv", 32, 1, 3); add_bn("_blocks.0._bn1", 32)
    add_conv("_blocks.0._se_reduce", 8, 32, 1); sd["_blocks.0._se_reduce.bias"] = np.zeros(8, np.float32)
    add_conv("_blocks.0._se_expand", 32, 8, 1); sd["_blocks.0._se_expand.bias"] = np.zeros(32, np.float32)
    add_conv("_blocks.0._project_conv", 16, 32, 1); add_bn("_blocks.0._bn2", 16)
    add_conv("_conv_head", 1280, 16, 1); add_bn("_bn1", 1280)

    params, stats, unused = efficientnet_torch_to_flax(sd)
    assert params["stem_conv"]["kernel"].shape == (3, 3, 1, 32)
    assert params["blocks_0"]["depthwise_conv"]["kernel"].shape == (3, 3, 1, 32)
    assert params["blocks_0"]["se"]["se_reduce"]["kernel"].shape == (1, 1, 32, 8)
    assert stats["blocks_0"]["bn2"]["mean"].shape == (16,)
    assert params["head_conv"]["kernel"].shape == (1, 1, 16, 1280)
    assert unused == []


def test_bert_conversion_numerical():
    """Convert a 1-layer HF BertModel and compare last_hidden_state."""
    try:
        from transformers import BertConfig, BertModel
    except Exception:
        pytest.skip("transformers unavailable")
    cfg = BertConfig(vocab_size=50, hidden_size=16, num_hidden_layers=1,
                     num_attention_heads=2, intermediate_size=32,
                     max_position_embeddings=20, hidden_act="gelu")
    tm = BertModel(cfg).eval()
    ids = torch.tensor([[2, 5, 7, 9, 0, 0]])
    mask = torch.tensor([[1, 1, 1, 1, 0, 0]])
    with torch.no_grad():
        want = tm(input_ids=ids, attention_mask=mask).last_hidden_state.numpy()

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, unused = bert_torch_to_flax(sd)
    from mammodissect.models.bert import BertEncoder

    enc = BertEncoder(vocab_size=50, hidden_size=16, num_layers=1, num_heads=2,
                      intermediate_size=32, max_position_embeddings=20)
    init = enc.init(jax.random.PRNGKey(0), jnp.asarray(ids.numpy()), jnp.asarray(mask.numpy()))
    merged, mismatches = merge_into(init["params"], params)
    shape_mismatches = [m for m in mismatches if m[0] == "shape"]
    assert not shape_mismatches, shape_mismatches
    got = np.asarray(
        enc.apply({"params": merged}, jnp.asarray(ids.numpy()), jnp.asarray(mask.numpy()))
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_merge_into_structure_mismatch_recorded():
    """Regression: a dict in `updates` where `variables` holds a leaf array
    crashed with TypeError instead of recording a mismatch (strict=False)."""
    from mammodissect.utils.torch_convert import merge_into

    v = {"params": {"w": np.zeros((2, 2), np.float32)}}
    u = {"params": {"w": {"kernel": np.ones((2, 2), np.float32)}}}
    out, mismatches = merge_into(v, u)
    assert ("structure", "params/w dict vs leaf") in mismatches
    np.testing.assert_array_equal(out["params"]["w"], v["params"]["w"])


def test_linear_equivalence():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(3, 5)).astype(np.float32)
    tl = tnn.Linear(5, 4)
    with torch.no_grad():
        want = tl(torch.tensor(x)).numpy()
    got = x @ linear_to_flax(tl.weight.detach().numpy()) + tl.bias.detach().numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)
