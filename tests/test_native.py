"""Native C++ fastimage extension: build, numerical oracle, batch path, fallback."""
import numpy as np
import pytest

from mammodissect import native


def np_bilinear(src, dh, dw):
    """cv2-style bilinear (pixel centers, no antialias) oracle."""
    sh, sw = src.shape
    sy = np.clip((np.arange(dh) + 0.5) * sh / dh - 0.5, 0, sh - 1)
    sx = np.clip((np.arange(dw) + 0.5) * sw / dw - 0.5, 0, sw - 1)
    y0 = sy.astype(int); x0 = sx.astype(int)
    y1 = np.minimum(y0 + 1, sh - 1); x1 = np.minimum(x0 + 1, sw - 1)
    fy = (sy - y0)[:, None]; fx = (sx - x0)[None, :]
    top = src[y0][:, x0] * (1 - fx) + src[y0][:, x1] * fx
    bot = src[y1][:, x0] * (1 - fx) + src[y1][:, x1] * fx
    return top * (1 - fy) + bot * fy


@pytest.mark.skipif(not native.available(), reason="no g++ / build failed")
class TestNative:
    def test_matches_numpy_oracle(self):
        rng = np.random.default_rng(0)
        src = rng.random((37, 23)).astype(np.float32)
        got = native.resize_normalize(src, (16, 12), mean=0.3, std=0.25)[..., 0]
        r = np_bilinear(src, 16, 12)
        want = ((r - r.min()) / (r.max() - r.min()) - 0.3) / 0.25
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_batch_matches_single(self):
        rng = np.random.default_rng(1)
        batch = rng.random((5, 30, 20)).astype(np.float32)
        got = native.batch_resize_normalize(batch, (12, 8), 0.3, 0.25, n_threads=3)
        for i in range(5):
            single = native.resize_normalize(batch[i], (12, 8), 0.3, 0.25)
            np.testing.assert_allclose(got[i], single, atol=1e-6)

    def test_constant_image_no_nan(self):
        src = np.full((10, 10), 0.5, np.float32)
        out = native.resize_normalize(src, (4, 4), 0.3, 0.25)
        assert np.isfinite(out).all()

    def test_matches_python_fallback_closely(self):
        """Native (cv2-style) vs PIL fallback differ only at interpolation level."""
        from mammodissect.data import transforms as T

        # smooth image (random noise is the pathological case for antialiased-vs-point
        # bilinear comparison; mammograms are smooth)
        yy, xx = np.mgrid[0:64, 0:48].astype(np.float32)
        src = (np.sin(yy / 9) + np.cos(xx / 7))[..., None] * 0.25 + 0.5
        nat = T.gray_resize_normalize(src, (32, 24), 0.3, 0.25, prefer_native=True)
        pil = T.gray_resize_normalize(src, (32, 24), 0.3, 0.25, prefer_native=False)
        assert nat.shape == pil.shape == (32, 24, 1)
        # same scale, highly correlated
        c = np.corrcoef(nat.ravel(), pil.ravel())[0, 1]
        assert c > 0.98, c


def test_fallback_path_always_works():
    from mammodissect.data import transforms as T

    src = np.random.default_rng(3).random((20, 16, 1)).astype(np.float32)
    out = T.gray_resize_normalize(src, (10, 8), 0.3, 0.25, prefer_native=False)
    assert out.shape == (10, 8, 1) and np.isfinite(out).all()
