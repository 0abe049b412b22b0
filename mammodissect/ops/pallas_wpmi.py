"""Fused Pallas kernel for the soft-WPMI gather + log-reduce (the BASELINE.md stretch
goal; reference hot loop `concept_vit/similarity.py:59-65`).

Computes pde[u, c] = sum_k log(1 + p[k] * (clip_sm[inds[u, k], c] - 1) + eps)
for U units x C concepts with top-k activating-image indices per unit.

Design (TPU):
  grid = (C_tiles, U_tiles), C innermost-resident: for each 128-wide concept tile the
  FULL clip_sm[:, tile] column block ([N, 128] f32, ~5 MB at N=10k) is staged into VMEM
  once, then every unit tile gathers its k rows from VMEM (no HBM round-trip per
  gather — the XLA fallback's gather reads HBM). Indices + the decay schedule ride in
  SMEM via PrefetchScalarGridSpec so row addresses are known before the body runs.
  The log() runs on the VPU over [1, 128] rows accumulated in fp32.

Falls back to the XLA path (similarity.soft_wpmi use_pallas=False) when the column
block would overflow VMEM."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

C_TILE = 128
U_TILE = 8
# staged column block must fit VMEM (~16 MB/core) alongside out/index buffers
VMEM_BUDGET_BYTES = 10 * 1024 * 1024
# the flattened index buffer ([U_pad * k] int32) rides as scalar prefetch (SMEM);
# bound it to the per-layer widths the kernel was measured on — the all-layer
# concatenation (U_total ~7k x k=100 ~ 2.8 MB) must fall back to the XLA path
SMEM_BUDGET_BYTES = 512 * 1024


def _kernel(inds_ref, p_ref, clip_ref, out_ref, *, k: int, u_tile: int, min_prob: float):
    import jax.experimental.pallas as pl

    ju = pl.program_id(1)  # unit-tile index

    def u_body(u, _):
        gu = ju * u_tile + u

        def k_body(kk, acc):
            idx = inds_ref[gu * k + kk]
            row = clip_ref[pl.ds(idx, 1), :]  # [1, C_TILE]
            pk = p_ref[kk]
            return acc + jnp.log(1.0 + pk * (row - 1.0) + min_prob)

        acc = jax.lax.fori_loop(
            0, k, k_body, jnp.zeros((1, clip_ref.shape[1]), jnp.float32)
        )
        out_ref[pl.ds(u, 1), :] = acc
        return 0

    jax.lax.fori_loop(0, u_tile, u_body, 0)


@functools.partial(jax.jit, static_argnames=("min_prob", "interpret"))
def soft_wpmi_gather_logsum(clip_sm, inds, p_in, min_prob: float = 1e-7,
                            interpret: bool = False):
    """clip_sm [N, C] f32 (softmaxed), inds [U, k] int32, p_in [k] f32 -> pde [U, C]."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, c = clip_sm.shape
    u, k = inds.shape

    c_pad = -(-c // C_TILE) * C_TILE
    u_pad = -(-u // U_TILE) * U_TILE
    clip_p = jnp.pad(clip_sm.astype(jnp.float32), ((0, 0), (0, c_pad - c)))
    # padded units gather row 0 harmlessly
    inds_p = jnp.pad(inds.astype(jnp.int32), ((0, u_pad - u), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(c_pad // C_TILE, u_pad // U_TILE),
        in_specs=[
            pl.BlockSpec((n, C_TILE), lambda i, j, *_: (0, i)),
        ],
        out_specs=pl.BlockSpec((U_TILE, C_TILE), lambda i, j, *_: (j, i)),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, k=k, u_tile=U_TILE, min_prob=min_prob),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((u_pad, c_pad), jnp.float32),
        interpret=interpret,
    )(inds_p.reshape(-1), p_in.astype(jnp.float32), clip_p)
    return out[:u, :c]


def pallas_fits(n_images: int, n_units: int | None = None, top_k: int = 100) -> bool:
    if n_images * C_TILE * 4 > VMEM_BUDGET_BYTES:
        return False
    if n_units is not None:
        u_pad = -(-n_units // U_TILE) * U_TILE
        if u_pad * min(top_k, n_images) * 4 > SMEM_BUDGET_BYTES:
            return False
    return True
