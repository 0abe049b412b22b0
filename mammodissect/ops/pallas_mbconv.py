"""Fused MBConv front half (expand 1x1 conv + BN + SiLU + 5x5 depthwise + BN + SiLU)
as a Pallas TPU kernel — the VERDICT-r3 "measure, don't project" experiment.

Motivation (docs/PERF.md per-stage ledger): B5 stage 2 (blocks 3-7, 380x228, expand
240) is the hottest stage at ~22 ms/block vs a ~16 ms VPU compute bound; the residual
is HBM passes. XLA materializes the expanded tensor ([B, 380, 228, 240] bf16,
~41.6 MB/image) to HBM between the 1x1 expand and the depthwise conv; this kernel
keeps it in VMEM per spatial tile:

  grid = (B, H/T): per program, DMA a (T+4)-row halo slab of the (pre-padded) input
  from HBM, run the expand as ONE [rows*W, Cin] @ [Cin, Cexp] MXU matmul (f32 accum),
  fold BN1 + SiLU, then the 5x5/s1 depthwise as 25 shifted VPU FMAs into an f32
  accumulator, fold BN2 + SiLU, write the [T, W, Cexp] output tile.

The SE block that follows needs a global spatial mean of this output, so the fusion
stops here (fusing SE would force either a second full recompute or an HBM round-trip
anyway — see docs/PERF.md round-3 analysis). The kernel is numerically equivalent to
the XLA subgraph at bf16-in/f32-accumulate precision.

Reference MBConv semantics: `model/modules/efficientnet_custom.py:36-140`
(expand -> depthwise -> SE -> project). Used for A/B measurement by
tools/profile_fused_mbconv.py; only enabled in the tower if measured >1.1x.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

K = 5  # depthwise kernel size (stage-2/3/5/6 blocks are k5)
HALO = K - 1


def fold_bn(gamma, beta, mean, var, eps: float = 1e-3):
    """Inference BatchNorm as y = x * scale + bias (f32)."""
    scale = np.asarray(gamma, np.float32) / np.sqrt(np.asarray(var, np.float32) + eps)
    bias = np.asarray(beta, np.float32) - np.asarray(mean, np.float32) * scale
    return scale, bias


def _kernel(x_hbm, wexp_ref, bn1s_ref, bn1b_ref, wdw_ref, bn2s_ref, bn2b_ref,
            out_ref, x_vmem, sem, *, t: int, w: int, cin: int, cexp: int):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    i = pl.program_id(1)

    # halo slab of the pre-padded input: rows [i*T, i*T + T + HALO)
    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * t, t + HALO)], x_vmem, sem)
    cp.start()
    cp.wait()

    rows = (t + HALO) * (w + HALO)
    xe = x_vmem[:].reshape(rows, cin)
    e = jnp.dot(xe, wexp_ref[:], preferred_element_type=jnp.float32)
    e = e * bn1s_ref[:] + bn1b_ref[:]
    e = e * jax.nn.sigmoid(e)  # SiLU, f32
    e = e.reshape(t + HALO, w + HALO, cexp)
    # SAME-pad semantics: XLA zero-pads the EXPANDED tensor for the depthwise conv,
    # but our halo slab padded the INPUT — the border zeros just became
    # silu(bn1_bias) through the 1x1+BN. Zero the out-of-bounds halo positions so
    # the depthwise sees exactly XLA's zeros.
    pad = HALO // 2
    n_rows_total = pl.num_programs(1) * t  # = H
    gy = i * t + jax.lax.broadcasted_iota(jnp.int32, (t + HALO, w + HALO), 0)
    gx = jax.lax.broadcasted_iota(jnp.int32, (t + HALO, w + HALO), 1)
    valid = ((gy >= pad) & (gy < n_rows_total + pad)
             & (gx >= pad) & (gx < w + pad))
    # minor-dim insertion on an i1 vector is unsupported by Mosaic — cast the mask
    # to f32 FIRST, then broadcast; x*1.0/x*0.0 gives the exact zeros SAME needs
    e = (e * valid.astype(jnp.float32)[:, :, None]).astype(jnp.bfloat16)

    acc = jnp.zeros((t, w, cexp), jnp.float32)
    for dy in range(K):  # unrolled: 25 shifted VPU FMAs
        for dx in range(K):
            acc = acc + (e[dy : dy + t, dx : dx + w, :].astype(jnp.float32)
                         * wdw_ref[dy, dx, :])
    y = acc * bn2s_ref[:] + bn2b_ref[:]
    y = y * jax.nn.sigmoid(y)
    out_ref[:] = y.astype(out_ref.dtype)[None]


@functools.partial(
    jax.jit,
    static_argnames=("t", "interpret"),
)
def fused_expand_dw(x, w_exp, bn1_scale, bn1_bias, w_dw, bn2_scale, bn2_bias,
                    t: int = 19, interpret: bool = False):
    """x [B, H, W, Cin] bf16 -> [B, H, W, Cexp] bf16 (expand+BN+SiLU+dw5x5/s1+BN+SiLU).

    t: spatial row-tile height; H must be divisible by t.
    Weights: w_exp [Cin, Cexp]; w_dw [5, 5, Cexp]; bn scale/bias [Cexp] f32."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bsz, h, w, cin = x.shape
    cexp = w_exp.shape[1]
    assert h % t == 0, (h, t)
    pad = HALO // 2
    # Mosaic DMA slices and VMEM tiles want 128-aligned minor dims: pad channels.
    # MXU lanes are 128-wide regardless, so the padded matmul costs the same; the
    # padded expand channels carry zero BN scale/bias -> silu(0) = 0 -> sliced off.
    cin_p = -(-cin // 128) * 128
    cexp_p = -(-cexp // 128) * 128
    x_pad = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, cin_p - cin)))
    w_exp_p = jnp.pad(jnp.asarray(w_exp), ((0, cin_p - cin), (0, cexp_p - cexp)))
    w_dw_p = jnp.pad(jnp.asarray(w_dw), ((0, 0), (0, 0), (0, cexp_p - cexp)))

    def padded_vec(v):
        return jnp.pad(jnp.asarray(v, jnp.float32), (0, cexp_p - cexp)).reshape(1, cexp_p)

    grid = (bsz, h // t)
    kernel = functools.partial(_kernel, t=t, w=w, cin=cin_p, cexp=cexp_p)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, cexp_p), jnp.bfloat16),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x_pad stays in HBM; manual DMA
            pl.BlockSpec((cin_p, cexp_p), lambda b, i: (0, 0)),
            pl.BlockSpec((1, cexp_p), lambda b, i: (0, 0)),
            pl.BlockSpec((1, cexp_p), lambda b, i: (0, 0)),
            pl.BlockSpec((K, K, cexp_p), lambda b, i: (0, 0, 0)),
            pl.BlockSpec((1, cexp_p), lambda b, i: (0, 0)),
            pl.BlockSpec((1, cexp_p), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t, w, cexp_p), lambda b, i: (b, i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((t + HALO, w + HALO, cin_p), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(
        x_pad.astype(jnp.bfloat16),
        w_exp_p.astype(jnp.bfloat16),
        padded_vec(bn1_scale),
        padded_vec(bn1_bias),
        w_dw_p.astype(jnp.float32),
        padded_vec(bn2_scale),
        padded_vec(bn2_bias),
    )
    return out[..., :cexp]


@functools.partial(jax.jit, static_argnames=())
def xla_expand_dw(x, w_exp, bn1_scale, bn1_bias, w_dw, bn2_scale, bn2_bias):
    """The same subgraph the tower runs through XLA (A/B reference): 1x1 conv as
    matmul + BN + SiLU, then lax depthwise conv + BN + SiLU, bf16 with f32 accum."""
    from jax import lax

    bsz, h, w, cin = x.shape
    cexp = w_exp.shape[1]
    e = jnp.dot(x.astype(jnp.bfloat16).reshape(-1, cin), w_exp.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    e = e * bn1_scale + bn1_bias
    e = e * jax.nn.sigmoid(e)
    e = e.reshape(bsz, h, w, cexp).astype(jnp.bfloat16)
    dw = lax.conv_general_dilated(
        e, w_dw.astype(jnp.bfloat16).reshape(K, K, 1, cexp),
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=cexp,
        preferred_element_type=jnp.float32,
    )
    y = dw * bn2_scale + bn2_bias
    y = y * jax.nn.sigmoid(y)
    return y.astype(jnp.bfloat16)
