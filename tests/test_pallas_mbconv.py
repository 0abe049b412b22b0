"""Fused expand+depthwise Pallas kernel (ops/pallas_mbconv.py): interpret-mode
numerics vs the XLA subgraph it replaces. Wall-clock A/B happens on the real chip
(tools/profile_fused_mbconv.py); this pins correctness."""
import numpy as np
import pytest

import jax.numpy as jnp

from mammodissect.ops.pallas_mbconv import fold_bn, fused_expand_dw, xla_expand_dw


def _setup(b=2, h=38, w=28, cin=40, cexp=240, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(b, h, w, cin)).astype(np.float32) * 0.1
    w_exp = rng.normal(size=(cin, cexp)).astype(np.float32) * 0.05
    w_dw = rng.normal(size=(5, 5, cexp)).astype(np.float32) * 0.05
    s1, b1 = fold_bn(rng.uniform(0.5, 1.5, cexp), rng.normal(size=cexp) * 0.1,
                     rng.normal(size=cexp) * 0.1, rng.uniform(0.5, 1.5, cexp))
    s2, b2 = fold_bn(rng.uniform(0.5, 1.5, cexp), rng.normal(size=cexp) * 0.1,
                     rng.normal(size=cexp) * 0.1, rng.uniform(0.5, 1.5, cexp))
    return (jnp.asarray(x), w_exp, s1, b1, w_dw, s2, b2)


@pytest.mark.parametrize("t", [19, 38])
def test_fused_expand_dw_matches_xla(t):
    args = _setup()
    want = np.asarray(xla_expand_dw(*args), np.float32)
    got = np.asarray(fused_expand_dw(*args, t=t, interpret=True), np.float32)
    assert got.shape == want.shape
    # bf16-level agreement: both paths run bf16 inputs with f32 accumulation; the
    # border-halo masking must reproduce XLA's SAME zero padding exactly
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-2)


def test_fused_expand_dw_border_rows_exact():
    """The halo mask: border outputs depend only on in-bounds pixels (XLA's SAME
    zeros) — a wrong mask shows up as O(bn_bias) drift on the first/last rows."""
    args = _setup(b=1, h=19, w=28)
    want = np.asarray(xla_expand_dw(*args), np.float32)
    got = np.asarray(fused_expand_dw(*args, t=19, interpret=True), np.float32)
    np.testing.assert_allclose(got[:, :2], want[:, :2], atol=2e-3, rtol=2e-2)
    np.testing.assert_allclose(got[:, -2:], want[:, -2:], atol=2e-3, rtol=2e-2)
    np.testing.assert_allclose(got[:, :, :2], want[:, :, :2], atol=2e-3, rtol=2e-2)
    np.testing.assert_allclose(got[:, :, -2:], want[:, :, -2:], atol=2e-3, rtol=2e-2)


def test_fold_bn_matches_batchnorm_math():
    rng = np.random.default_rng(1)
    gamma, beta = rng.uniform(0.5, 1.5, 8), rng.normal(size=8)
    mean, var = rng.normal(size=8), rng.uniform(0.5, 1.5, 8)
    x = rng.normal(size=(4, 8)).astype(np.float32)
    scale, bias = fold_bn(gamma, beta, mean, var, eps=1e-3)
    want = gamma * (x - mean) / np.sqrt(var + 1e-3) + beta
    np.testing.assert_allclose(x * scale + bias, want, rtol=1e-5, atol=1e-5)
