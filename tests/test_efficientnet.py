"""EfficientNet structure + capture tests (reference: 39 B5 `_blocks`
`concept_vit/run_clipdissect.sh:6-9`; head dim 2048 `model/modules/__init__.py:46`)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mammodissect.models.efficientnet import (
    EFFICIENTNET_PARAMS,
    EfficientNet,
    EfficientNetMammo,
    expand_block_args,
)


def test_b5_has_39_blocks_and_2048_head():
    w, d, _, _ = EFFICIENTNET_PARAMS["efficientnet-b5"]
    blocks = expand_block_args(w, d)
    assert len(blocks) == 39
    assert EfficientNet(variant="efficientnet-b5").out_dim == 2048


def test_b0_has_16_blocks_and_1280_head():
    w, d, _, _ = EFFICIENTNET_PARAMS["efficientnet-b0"]
    assert len(expand_block_args(w, d)) == 16
    assert EfficientNet(variant="efficientnet-b0").out_dim == 1280


@pytest.fixture(scope="module")
def b0_setup():
    model = EfficientNet(variant="efficientnet-b0", in_channels=1)
    x = jnp.ones((2, 64, 64, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables, x


def test_forward_shapes_and_capture(b0_setup):
    model, variables, x = b0_setup
    feats, captured = model.apply(variables, x, capture=(0, 3, 15), pool_mode="avg")
    assert feats.shape == (2, 2, 2, 1280)  # 64 / 2^5 = 2
    assert set(captured) == {"blocks.0", "blocks.3", "blocks.15"}
    for v in captured.values():
        assert v.ndim == 2 and v.shape[0] == 2
    assert captured["blocks.15"].shape[1] == 320  # b0 final block channels


def test_capture_max_vs_avg_differ(b0_setup):
    model, variables, x = b0_setup
    x = jax.random.normal(jax.random.PRNGKey(1), x.shape)
    _, cap_avg = model.apply(variables, x, capture=(3,), pool_mode="avg")
    _, cap_max = model.apply(variables, x, capture=(3,), pool_mode="max")
    a, m = cap_avg["blocks.3"], cap_max["blocks.3"]
    assert not np.allclose(np.asarray(a), np.asarray(m))
    assert (np.asarray(m) >= np.asarray(a) - 1e-6).all()


def test_train_mode_updates_batch_stats(b0_setup):
    model, variables, x = b0_setup
    (feats, _), mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(2)}
    )
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(np.asarray(b), np.asarray(a)) for b, a in zip(before, after))


def test_mammo_encoder_pooled_dim():
    model = EfficientNetMammo(variant="efficientnet-b0", in_channels=1)
    x = jnp.ones((1, 64, 64, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    pooled, captured = model.apply(variables, x, capture=(1,))
    assert pooled.shape == (1, 1280)
    assert "blocks.1" in captured


def test_v2_s_variant():
    from mammodissect.models.efficientnet import v2_block_args

    blocks = v2_block_args()
    assert len(blocks) == 40
    assert blocks[0].fused and not blocks[-1].fused
    model = EfficientNet(variant="efficientnetv2-s", in_channels=1)
    assert model.out_dim == 1280
    x = jnp.ones((1, 64, 64, 1), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    feats, cap = model.apply(variables, x, capture=(2, 39))
    assert feats.shape == (1, 2, 2, 1280)
    assert cap["blocks.39"].shape == (1, 256)


def test_odd_input_sizes_supported():
    """1520x912-style non-square inputs must trace with static shapes; use a small
    odd-sized stand-in to keep CI fast."""
    model = EfficientNet(variant="efficientnet-b0", in_channels=1)
    x = jnp.ones((1, 95, 57, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    feats, _ = model.apply(variables, x)
    assert feats.shape[0] == 1 and feats.shape[-1] == 1280


def test_s2d_stem_parity():
    """Space-to-depth stem == plain stem, bit-level (same params, rearranged compute;
    the MXU-occupancy fast path must not change any number)."""
    import jax
    import jax.numpy as jnp

    from mammodissect.models.efficientnet import EfficientNet

    x = np.random.default_rng(0).normal(size=(2, 64, 48, 3)).astype(np.float32)
    plain = EfficientNet(variant="efficientnet-b0", in_channels=3, pad_mode="same")
    fast = EfficientNet(variant="efficientnet-b0", in_channels=3, pad_mode="same",
                        s2d_stem=True)
    v = jax.jit(plain.init)(jax.random.PRNGKey(0), jnp.asarray(x))
    want, _ = jax.jit(lambda vv, xx: plain.apply(vv, xx))(v, jnp.asarray(x))
    got, _ = jax.jit(lambda vv, xx: fast.apply(vv, xx))(v, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)

    # odd input dims fall back to the plain conv (still identical)
    x_odd = x[:, :63, :47]
    w2, _ = jax.jit(lambda vv, xx: plain.apply(vv, xx))(v, jnp.asarray(x_odd))
    g2, _ = jax.jit(lambda vv, xx: fast.apply(vv, xx))(v, jnp.asarray(x_odd))
    np.testing.assert_allclose(np.asarray(g2), np.asarray(w2), atol=1e-5, rtol=1e-5)
