"""EfficientNet (B0–B7) in Flax, NHWC, TPU-first — the Mammo-CLIP image encoder family.

Re-implements the capability of the reference's vendored lukemelas EfficientNet
(`model/modules/efficientnet_custom.py`): MBConv blocks with expand→depthwise→SE→project
(+ drop-connect, `:36-140`), the `_blocks` flat list whose 39 B5 entries are the dissection
hook targets (`:181-198`, `concept_vit/run_clipdissect.sh:6-9`), and `extract_features`
(`:287-303`). Design differences (TPU-idiomatic, not a translation):

- NHWC layout. Padding is reference-faithful *static* SAME: the reference builds its
  convs with padding precomputed from the variant's canonical resolution
  (`Conv2dStaticSamePadding`, `efficient_net_custom_utils.py:248-277`; traced at
  image_size=456 for B5 via `get_model_params`) and then feeds 1520x912 — so wherever
  an intermediate size's parity differs from the 456 chain at a stride-2 conv, the
  actual padding differs from true SAME by a one-pixel shift (e.g. B5 block 13's
  depthwise at 1520x912 pads (1,1) where true SAME pads (0,1)). We replicate the traced
  chain as explicit static padding tuples (`pad_mode="static"`, the default), which is
  also XLA-friendly; `pad_mode="same"` gives true input-size SAME (the reference's
  `Conv2dDynamicSamePadding` behavior when image_size=None).
- Grayscale probes are broadcast to the tower's in_channels on device: the canonical
  'tf_efficientnet_b5_ns-detect' tower is 3-channel (`from_pretrained` default
  in_channels, `model/modules/__init__.py:41-46`) and the probe datasets feed it
  PIL-RGB copies of grayscale PNGs (`image_classification_zs.py:65-75`).
- Forward is a single traced program; activation "hooks" are a static `capture` tuple of
  block indices — each captured block's output is pooled (avg/max over spatial) *inside*
  the jitted forward, so harvesting all 39 layers is one XLA program with [B, C]-sized
  residuals instead of 39 Python-side hook round-trips (`concept_vit/utils.py:80-81`).
- BatchNorm carries running stats in the `batch_stats` collection
  (momentum 0.99 / eps 1e-3, TF defaults, matching `efficient_net_custom_utils.py:457+`).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mammodissect.models.layers import (
    GeM,
    SqueezeExcite,
    drop_connect,
    round_filters,
    round_repeats,
)
from mammodissect.ops.pooling import pool_activation

# Base (B0) block args — the decoded form of the reference's BlockDecoder strings
# ('r1_k3_s11_e1_i32_o16_se0.25', ..., `efficient_net_custom_utils.py:500-520`).
@dataclasses.dataclass(frozen=True)
class BlockArgs:
    num_repeat: int
    kernel_size: int
    stride: int
    expand_ratio: int
    input_filters: int
    output_filters: int
    se_ratio: float
    id_skip: bool = True
    fused: bool = False  # EfficientNetV2 fused-MBConv


BASE_BLOCK_ARGS: Tuple[BlockArgs, ...] = (
    BlockArgs(1, 3, 1, 1, 32, 16, 0.25),
    BlockArgs(2, 3, 2, 6, 16, 24, 0.25),
    BlockArgs(2, 5, 2, 6, 24, 40, 0.25),
    BlockArgs(3, 3, 2, 6, 40, 80, 0.25),
    BlockArgs(3, 5, 1, 6, 80, 112, 0.25),
    BlockArgs(4, 5, 2, 6, 112, 192, 0.25),
    BlockArgs(1, 3, 1, 6, 192, 320, 0.25),
)

# (width_coefficient, depth_coefficient, resolution, dropout_rate) per variant
# (reference `efficient_net_custom_utils.py:457-478` efficientnet_params).
EFFICIENTNET_PARAMS: Dict[str, Tuple[float, float, int, float]] = {
    "efficientnet-b0": (1.0, 1.0, 224, 0.2),
    "efficientnet-b1": (1.0, 1.1, 240, 0.2),
    "efficientnet-b2": (1.1, 1.2, 260, 0.3),
    "efficientnet-b3": (1.2, 1.4, 300, 0.3),
    "efficientnet-b4": (1.4, 1.8, 380, 0.4),
    "efficientnet-b5": (1.6, 2.2, 456, 0.4),
    "efficientnet-b6": (1.8, 2.6, 528, 0.5),
    "efficientnet-b7": (2.0, 3.1, 600, 0.5),
    # 7-block smoke-test variant (1 block/stage, minimal widths): same architecture
    # family, ~2.3x less graph to trace than b0 — for tests and quick sanity runs
    "efficientnet-test": (0.35, 0.1, 64, 0.2),
}


def v2_block_args() -> Tuple[BlockArgs, ...]:
    """Flat EfficientNetV2-S block list (no width/depth scaling)."""
    out = []
    for (r, k, s, e, i, o, se, fused) in V2_S_BLOCK_ARGS:
        out.append(BlockArgs(1, k, s, e, i, o, se, fused=fused))
        for _ in range(r - 1):
            out.append(BlockArgs(1, k, 1, e, o, o, se, fused=fused))
    return tuple(out)


def _pad1d(i: int, k: int, s: int) -> int:
    """TF-SAME total padding for one spatial dim (dilation 1):
    max((ceil(i/s)-1)*s + k - i, 0) — `efficient_net_custom_utils.py:240-244`."""
    o = -(-i // s)
    return max((o - 1) * s + k - i, 0)


def static_same_padding(size, k: int, s: int):
    """Explicit ((top,bottom),(left,right)) padding matching the reference's
    Conv2dStaticSamePadding built at `size` (`efficient_net_custom_utils.py:255-272`:
    ZeroPad2d(pad//2, pad-pad//2) per dim)."""
    ph = _pad1d(size[0], k, s)
    pw = _pad1d(size[1], k, s)
    return ((ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2))


def expand_block_args(
    width_coefficient: float, depth_coefficient: float
) -> Tuple[BlockArgs, ...]:
    """Per-variant flat block list: width-round filters, depth-round repeats; repeated
    blocks after the first get stride 1 and input=output (`efficientnet_custom.py:181-198`).
    For B5 this yields the 39 blocks dissection targets."""
    out = []
    for ba in BASE_BLOCK_ARGS:
        in_f = round_filters(ba.input_filters, width_coefficient)
        out_f = round_filters(ba.output_filters, width_coefficient)
        repeats = round_repeats(ba.num_repeat, depth_coefficient)
        out.append(dataclasses.replace(ba, input_filters=in_f, output_filters=out_f, num_repeat=1))
        for _ in range(repeats - 1):
            out.append(
                dataclasses.replace(
                    ba, input_filters=out_f, output_filters=out_f, stride=1, num_repeat=1
                )
            )
    return tuple(out)


# EfficientNetV2-S stage spec (fused-MBConv early stages, MBConv+SE later) — covers
# the reference's 'efficientnetv2-s'/'efficientnetv2-detect' encoder option
# (`model/modules/__init__.py:35-40`, arch strings in `Classifiers/`).
# fields: (num_repeat, kernel, stride, expand, in, out, se_ratio, fused)
V2_S_BLOCK_ARGS: Tuple[Tuple, ...] = (
    (2, 3, 1, 1, 24, 24, 0.0, True),
    (4, 3, 2, 4, 24, 48, 0.0, True),
    (4, 3, 2, 4, 48, 64, 0.0, True),
    (6, 3, 2, 4, 64, 128, 0.25, False),
    (9, 3, 1, 6, 128, 160, 0.25, False),
    (15, 3, 2, 6, 160, 256, 0.25, False),
)


class FusedMBConvBlock(nn.Module):
    """Fused-MBConv (EfficientNetV2): expand 3x3 conv replaces expand-1x1+depthwise."""

    args: "BlockArgs"
    bn_momentum: float = 0.99
    bn_eps: float = 1e-3
    padding: Any = "SAME"  # main (strided) conv padding: "SAME" or explicit tuple
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, drop_rate: float = 0.0):
        ba = self.args
        inp = x
        c_in = x.shape[-1]
        c_exp = c_in * ba.expand_ratio

        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=self.bn_momentum,
                                epsilon=self.bn_eps, name=name, dtype=self.dtype)

        if ba.expand_ratio != 1:
            x = nn.Conv(c_exp, (ba.kernel_size, ba.kernel_size),
                        strides=(ba.stride, ba.stride), padding=self.padding,
                        use_bias=False, name="expand_conv", dtype=self.dtype)(x)
            x = jax.nn.silu(bn("bn0")(x))
            x = nn.Conv(ba.output_filters, (1, 1), use_bias=False, name="project_conv",
                        dtype=self.dtype)(x)
            x = bn("bn2")(x)
        else:
            x = nn.Conv(ba.output_filters, (ba.kernel_size, ba.kernel_size),
                        strides=(ba.stride, ba.stride), padding=self.padding,
                        use_bias=False, name="project_conv", dtype=self.dtype)(x)
            x = jax.nn.silu(bn("bn2")(x))

        if ba.id_skip and ba.stride == 1 and c_in == ba.output_filters:
            rng = self.make_rng("dropout") if (train and drop_rate > 0.0) else None
            x = drop_connect(x, drop_rate, deterministic=not train, rng=rng) + inp
        return x


class MBConvBlock(nn.Module):
    """Mobile inverted bottleneck: expand(1x1) → depthwise(kxk) → SE → project(1x1),
    skip + drop-connect when stride 1 and channels match (`efficientnet_custom.py:36-140`)."""

    args: BlockArgs
    bn_momentum: float = 0.99
    bn_eps: float = 1e-3
    padding: Any = "SAME"  # depthwise conv padding: "SAME" or explicit static tuple
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False, drop_rate: float = 0.0) -> jax.Array:
        ba = self.args
        inp = x
        c_in = x.shape[-1]
        c_exp = c_in * ba.expand_ratio

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=self.bn_eps,
                name=name,
                dtype=self.dtype,
            )

        if ba.expand_ratio != 1:
            x = nn.Conv(c_exp, (1, 1), use_bias=False, name="expand_conv", dtype=self.dtype)(x)
            x = bn("bn0")(x)
            x = jax.nn.silu(x)

        x = nn.Conv(
            c_exp,
            (ba.kernel_size, ba.kernel_size),
            strides=(ba.stride, ba.stride),
            padding=self.padding,
            feature_group_count=c_exp,
            use_bias=False,
            name="depthwise_conv",
            dtype=self.dtype,
        )(x)
        x = bn("bn1")(x)
        x = jax.nn.silu(x)

        if ba.se_ratio and 0 < ba.se_ratio <= 1:
            num_squeezed = max(1, int(c_in * ba.se_ratio))
            x = SqueezeExcite(num_squeezed, dtype=self.dtype, name="se")(x)

        x = nn.Conv(
            ba.output_filters, (1, 1), use_bias=False, name="project_conv", dtype=self.dtype
        )(x)
        x = bn("bn2")(x)

        if ba.id_skip and ba.stride == 1 and c_in == ba.output_filters:
            rng = self.make_rng("dropout") if (train and drop_rate > 0.0) else None
            x = drop_connect(x, drop_rate, deterministic=not train, rng=rng) + inp
        return x


class StemConv(nn.Module):
    """The 3x3/s2 stem conv with an optional SPACE-TO-DEPTH fast path.

    With C_in as low as 1-3 channels a 3x3 conv uses 9-27 of the MXU's 128 input
    lanes and streams the full-resolution tensor from HBM. When enabled (and the
    input dims are even with the (0,1) pad the B5 static chain produces at
    1520x912), the input is rearranged [B,H,W,C] -> [B,H/2,W/2,4C] and the kernel
    is scattered into an equivalent 2x2/s1 conv — bit-identical outputs, 4x the
    input-channel occupancy, half the spatial extent per dim. The parameter stays
    the canonical [3,3,C,F] HWIO layout (checkpoint converters untouched)."""

    features: int
    padding: Any  # explicit ((t,b),(l,r)) tuple or "SAME"
    s2d: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, c_in, self.features),
            jnp.float32,
        )
        h, w = int(x.shape[1]), int(x.shape[2])
        pad = self.padding
        if pad == "SAME":  # TF-SAME for k3/s2: (0,1) on even dims, (1,1) on odd
            pad = tuple(((0, 1) if d % 2 == 0 else (1, 1)) for d in (h, w))
        if self.s2d and h % 2 == 0 and w % 2 == 0 and pad == ((0, 1), (0, 1)):
            # strided slices + concat, NOT a 6-D reshape: on TPU the (…, 2, …, 2, C)
            # intermediate would materialize with (8,128)-tile padding (~16x blowup)
            xs = jnp.concatenate(
                [x[:, u::2, v::2] for u in (0, 1) for v in (0, 1)], axis=-1
            )  # channel layout (u, v, c), c fastest
            # scatter k[di,dj] -> ks[p,q,(u,v)] with di=2p+u, dj=2q+v (zero at di/dj=3)
            ks = jnp.zeros((2, 2, 2, 2, c_in, self.features), kernel.dtype)
            for p in range(2):
                for q in range(2):
                    for u in range(2):
                        for v in range(2):
                            if 2 * p + u < 3 and 2 * q + v < 3:
                                ks = ks.at[p, q, u, v].set(kernel[2 * p + u, 2 * q + v])
            # s2d channel layout (u, v, c), fastest-varying c — matches xs reshape
            ks = ks.reshape(2, 2, 4 * c_in, self.features)
            return jax.lax.conv_general_dilated(
                xs.astype(self.dtype), ks.astype(self.dtype), (1, 1),
                ((0, 1), (0, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype), (2, 2), tuple(pad),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class EfficientNet(nn.Module):
    """EfficientNet backbone with dissection capture.

    __call__(x NHWC, train, capture=(i, ...), pool_mode) ->
        (features [B, H', W', head_dim], {"blocks.i": pooled [B, C_i]})

    `head_dim` is round_filters(1280) — 2048 for B5, matching the reference's
    Mammo-CLIP image feature dim (`model/modules/__init__.py:46`)."""

    variant: str = "efficientnet-b5"
    in_channels: int = 1  # grayscale; the canonical '-detect' tower uses 3 (RGB copies)
    drop_connect_rate: float = 0.2
    bn_momentum: float = 0.99
    bn_eps: float = 1e-3
    # "static": reference-faithful padding traced at pad_size (default: the variant's
    # canonical resolution, e.g. 456 for B5 — what `from_name` bakes in). "same": true
    # input-size SAME (XLA native; == the reference's dynamic-padding variant).
    pad_mode: str = "static"
    pad_size: Any = None  # int or (h, w); None -> variant resolution (square)
    s2d_stem: bool = False  # space-to-depth stem fast path (see StemConv)
    remat: bool = False  # rematerialize MBConv blocks (jax.checkpoint): trades ~30%
    # backward FLOPs for O(depth) less activation HBM — enables larger fine-tune
    # batches at 1520x912 (the TPU analogue of torch gradient checkpointing)
    dtype: Any = jnp.float32

    @property
    def is_v2(self) -> bool:
        return self.variant.startswith("efficientnetv2")

    @property
    def block_args(self) -> Tuple[BlockArgs, ...]:
        if self.is_v2:
            return v2_block_args()
        w, d, _, _ = EFFICIENTNET_PARAMS[self.variant]
        return expand_block_args(w, d)

    @property
    def out_dim(self) -> int:
        if self.is_v2:
            return 1280
        w, _, _, _ = EFFICIENTNET_PARAMS[self.variant]
        return round_filters(1280, w)

    def _paddings(self, input_hw=None):
        """(stem_padding, per-block padding) for the configured pad_mode.

        Static mode replays the reference's construction-time size chain
        (`efficientnet_custom.py:166-198`: image_size -> ceil(size/stride) after the
        stem and after each strided block) and emits explicit pad tuples; only the
        stem and the strided convs can differ from true SAME (stride-1 SAME padding
        is size-independent). When `input_hw` (the actual static input size) is given,
        any conv whose traced padding would collapse a dim to zero falls back to true
        SAME for that dim — a regime where the torch reference itself crashes, so tiny
        test geometries stay runnable without affecting canonical-size parity."""
        if self.pad_mode == "same" or self.is_v2:
            return "SAME", tuple("SAME" for _ in self.block_args)
        size = self.pad_size
        if size is None:
            size = EFFICIENTNET_PARAMS[self.variant][2]
        if isinstance(size, int):
            size = (size, size)
        actual = tuple(input_hw) if input_hw is not None else None

        def pick(traced, act, k, s):
            pads, new_act = [], []
            for idx in range(2):
                p = _pad1d(traced[idx], k, s)
                if act is not None:
                    out = (act[idx] + p - k) // s + 1
                    if out < 1:
                        p = _pad1d(act[idx], k, s)
                        out = (act[idx] + p - k) // s + 1
                    new_act.append(out)
                pads.append((p // 2, p - p // 2))
            return tuple(pads), (tuple(new_act) if act is not None else None)

        stem_pad, actual = pick(size, actual, 3, 2)
        size = (-(-size[0] // 2), -(-size[1] // 2))
        pads = []
        for ba in self.block_args:
            p, actual = pick(size, actual, ba.kernel_size, ba.stride)
            pads.append(p)
            if ba.stride > 1:
                size = (-(-size[0] // ba.stride), -(-size[1] // ba.stride))
        return stem_pad, tuple(pads)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        train: bool = False,
        capture: Sequence[int] = (),
        pool_mode: str = "avg",
    ):
        stem_filters = 24 if self.is_v2 else round_filters(32, EFFICIENTNET_PARAMS[self.variant][0])
        blocks = self.block_args
        captured: Dict[str, jax.Array] = {}
        stem_pad, block_pads = self._paddings((int(x.shape[1]), int(x.shape[2])))

        # grayscale -> in_channels broadcast on device (the reference's PIL
        # convert('RGB') of grayscale probes, `image_classification_zs.py:65-75`;
        # mean/std normalization commutes with the channel copy)
        if x.shape[-1] == 1 and self.in_channels > 1:
            x = jnp.broadcast_to(x, x.shape[:-1] + (self.in_channels,))

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=self.bn_eps,
                name=name,
                dtype=self.dtype,
            )

        x = StemConv(
            stem_filters,
            padding=stem_pad,
            s2d=self.s2d_stem,
            name="stem_conv",
            dtype=self.dtype,
        )(x)
        x = jax.nn.silu(bn("stem_bn")(x))

        n_blocks = len(blocks)
        # static_argnums count self as 0: train=2, drop_rate=3 (both python scalars)
        for i, ba in enumerate(blocks):
            base_cls = FusedMBConvBlock if ba.fused else MBConvBlock
            block_cls = (nn.remat(base_cls, static_argnums=(2, 3))
                         if self.remat else base_cls)
            drop_rate = self.drop_connect_rate * i / n_blocks
            x = block_cls(
                ba,
                bn_momentum=self.bn_momentum,
                bn_eps=self.bn_eps,
                padding=block_pads[i],
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x, train, drop_rate)
            if i in capture:
                # fp32 pooling of the block output inside the traced program — the
                # functional replacement of the reference's forward hooks
                # (`concept_vit/utils.py:27-52,170-172`)
                captured[f"blocks.{i}"] = pool_activation(
                    x.astype(jnp.float32), pool_mode, data_format="NHWC"
                )

        x = nn.Conv(self.out_dim, (1, 1), use_bias=False, name="head_conv", dtype=self.dtype)(x)
        x = jax.nn.silu(bn("head_bn")(x))
        return x, captured


class EfficientNetMammo(nn.Module):
    """Backbone + spatial pooling + flatten — BreastClip's image tower.

    pooling="avg" (default) is the canonical 'tf_efficientnet_b5_ns-detect' tower: the
    reference's vendored EfficientNet with AdaptiveAvgPool2d+flatten
    (`efficientnet_custom.py:287-313`, selected by `model/modules/__init__.py:41-46`).
    pooling="gem" is the timm-backed `EfficientNet_Mammo` variant with GeM(p=3)
    (`model/modules/image_encoder.py:99-120`, the non-'-detect' encoder names)."""

    variant: str = "efficientnet-b5"
    in_channels: int = 3  # '-detect' towers are built at from_pretrained's default 3
    pooling: str = "avg"  # "avg" | "gem"
    bn_momentum: float = 0.99
    pad_mode: str = "static"
    s2d_stem: bool = False
    remat: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = EfficientNet(
            variant=self.variant, in_channels=self.in_channels,
            bn_momentum=self.bn_momentum, pad_mode=self.pad_mode,
            s2d_stem=self.s2d_stem, remat=self.remat, dtype=self.dtype,
        )
        if self.pooling == "gem":
            self.pool = GeM()
        else:
            self.pool = lambda x: jnp.mean(x.astype(jnp.float32), axis=(1, 2))

    @property
    def out_dim(self) -> int:
        return self.backbone.out_dim

    def __call__(
        self,
        x: jax.Array,
        train: bool = False,
        capture: Sequence[int] = (),
        pool_mode: str = "avg",
    ):
        features, captured = self.backbone(x, train=train, capture=capture, pool_mode=pool_mode)
        pooled = self.pool(features)
        return pooled, captured
