"""Swin encoder tests: geometry, shifted-window masking, capture, odd input sizes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mammodissect.models.swin import (
    SwinEncoder,
    _rel_pos_index,
    _shift_mask,
)


def test_rel_pos_index_properties():
    idx = _rel_pos_index(3)
    assert idx.shape == (9, 9)
    assert idx.min() >= 0 and idx.max() < 25  # (2*3-1)^2
    assert (np.diag(idx) == idx[0, 0]).all()  # zero offset everywhere on diagonal


def test_shift_mask_blocks_cross_region_attention():
    mask = _shift_mask(14, 14, 7, 3)
    assert mask.shape == (4, 49, 49)
    assert (mask == 0).any() and (mask < -1e8).any()
    # the first (interior) window has no cross-region pairs
    assert (mask[0] == 0).all()


@pytest.fixture(scope="module")
def tiny_swin():
    m = SwinEncoder(variant="swin-tiny", in_channels=1, window=4)
    x = jnp.ones((1, 64, 48, 1), jnp.float32)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    return m, v


def test_forward_shapes_and_capture(tiny_swin):
    m, v = tiny_swin
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 48, 1))
    pooled, cap = m.apply(v, x, capture=(0, 3))
    assert pooled.shape == (2, 768)  # embed 96 * 8
    assert cap["layers.0"].shape == (2, 96)
    assert cap["layers.3"].shape == (2, 768)
    assert m.out_dim == 768


def test_non_window_multiple_input(tiny_swin):
    """Inputs whose grids aren't window multiples must pad internally."""
    m, v = tiny_swin
    x = jnp.ones((1, 60, 44, 1), jnp.float32)
    pooled, _ = m.apply(v, x)
    assert pooled.shape == (1, 768)
    assert bool(jnp.isfinite(pooled).all())


def test_shifted_differs_from_unshifted():
    """The shift must change the computation (mask + roll actually wired in)."""
    from mammodissect.models.swin import SwinBlock

    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 16))
    b0 = SwinBlock(16, 2, window=4, shift=0)
    b1 = SwinBlock(16, 2, window=4, shift=2)
    v = b0.init(jax.random.PRNGKey(0), x)
    y0 = b0.apply(v, x)
    y1 = b1.apply(v, x)  # same params, shifted windows
    assert not np.allclose(np.asarray(y0), np.asarray(y1))
