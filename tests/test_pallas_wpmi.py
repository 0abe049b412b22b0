"""Pallas soft-WPMI kernel vs the XLA path (interpret mode on CPU; the same kernel
compiles for TPU via Mosaic)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mammodissect.ops.pallas_wpmi import pallas_fits, soft_wpmi_gather_logsum


def reference_pde(clip_sm, inds, p_in, min_prob=1e-7):
    out = np.zeros((inds.shape[0], clip_sm.shape[1]), np.float32)
    for u in range(inds.shape[0]):
        rows = clip_sm[inds[u]]
        out[u] = np.sum(np.log(1.0 + p_in[:, None] * (rows - 1.0) + min_prob), axis=0)
    return out


@pytest.mark.parametrize("u,c,n,k", [(8, 128, 64, 10), (13, 200, 50, 7)])
def test_kernel_matches_reference(u, c, n, k):
    rng = np.random.default_rng(0)
    clip_sm = jax.nn.softmax(jnp.asarray(rng.normal(size=(n, c)), jnp.float32) * 4, axis=1)
    inds = rng.integers(0, n, size=(u, k)).astype(np.int32)
    p_in = np.linspace(0.998, 0.97, k).astype(np.float32)
    got = np.asarray(
        soft_wpmi_gather_logsum(clip_sm, jnp.asarray(inds), jnp.asarray(p_in),
                                interpret=True)
    )
    want = reference_pde(np.asarray(clip_sm), inds, p_in)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_full_soft_wpmi_pallas_path():
    from mammodissect.ops.similarity import soft_wpmi

    rng = np.random.default_rng(1)
    clip = rng.normal(size=(64, 140)).astype(np.float32)
    target = rng.normal(size=(64, 12)).astype(np.float32)
    base = np.asarray(soft_wpmi(clip, target, top_k=16))
    # monkeypatch interpret mode through the pallas entry
    import mammodissect.ops.pallas_wpmi as P

    orig = P.soft_wpmi_gather_logsum

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    P.soft_wpmi_gather_logsum = interp
    try:
        fused = np.asarray(soft_wpmi(clip, target, top_k=16, use_pallas=True))
    finally:
        P.soft_wpmi_gather_logsum = orig
    np.testing.assert_allclose(fused, base, rtol=1e-4, atol=1e-4)


def test_fits_heuristic():
    assert pallas_fits(10_000)
    assert not pallas_fits(100_000)
