"""Pooling rule tests (reference contract `concept_vit/utils.py:27-52`; SURVEY.md §4)."""
import numpy as np
import pytest

from mammodissect.ops import gem_pool, pool_activation


def test_cnn_avg_nhwc():
    x = np.arange(2 * 3 * 4 * 5, dtype=np.float32).reshape(2, 3, 4, 5)
    got = np.asarray(pool_activation(x, "avg", data_format="NHWC"))
    np.testing.assert_allclose(got, x.mean(axis=(1, 2)), rtol=1e-6)


def test_cnn_max_nchw():
    x = np.random.default_rng(0).normal(size=(2, 5, 3, 4)).astype(np.float32)
    got = np.asarray(pool_activation(x, "max", data_format="NCHW"))
    np.testing.assert_allclose(got, x.max(axis=(2, 3)), rtol=1e-6)


def test_vit_cls_token():
    x = np.random.default_rng(1).normal(size=(2, 7, 16)).astype(np.float32)
    for mode in ("avg", "max"):
        np.testing.assert_array_equal(np.asarray(pool_activation(x, mode)), x[:, 0])


def test_fc_identity():
    x = np.random.default_rng(2).normal(size=(4, 8)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(pool_activation(x, "avg")), x)


def test_bad_mode():
    with pytest.raises(ValueError):
        pool_activation(np.zeros((1, 2)), "sum")


def test_gem_matches_reference_formula():
    x = np.abs(np.random.default_rng(3).normal(size=(2, 4, 4, 8))).astype(np.float32)
    p = 3.0
    want = (np.clip(x, 1e-6, None) ** p).mean(axis=(1, 2)) ** (1 / p)
    np.testing.assert_allclose(np.asarray(gem_pool(x, p)), want, rtol=1e-5)


def test_gem_p1_is_mean():
    x = np.abs(np.random.default_rng(4).normal(size=(1, 3, 3, 2))).astype(np.float32) + 0.1
    np.testing.assert_allclose(np.asarray(gem_pool(x, 1.0)), x.mean(axis=(1, 2)), rtol=1e-5)
