"""Modified EfficientNet backbone (flax, NHWC).

Re-implements the reference's customized EfficientNet
(jarvis/efficienttrack/efficientnet.py, jarvis/efficienttrack/utils.py) with
all of its deliberate deviations from stock EfficientNet:

  * InstanceNorm instead of BatchNorm everywhere (fields named ``_gn*`` in
    the reference but constructed as nn.InstanceNorm2d, efficientnet.py:50).
  * Blocks belonging to stages 0-3 use a *full* (non-depthwise) convolution
    from ``in`` straight to ``in*expand`` channels and skip the expansion
    conv entirely in the forward pass (efficientnet.py:57-61, 93-94).
  * Stages >= 4: expansion conv output is fed to the depthwise conv with
    NO norm / activation in between (the reference comments them out,
    efficientnet.py:96-100).
  * Non-standard compound scaling table: 'b0' = width/depth 0.5,
    'b1' = 1.0/1.0, 'b3' = 1.1/1.2 (utils.py:150-163).
  * The FPN wrapper truncates the block list after the last stride-2 block
    and taps the three feature maps preceding each downsampling block
    (model.py:508-548) — yielding P3/P4/P5 at strides 4/8/16.

The block plan is computed statically in Python so every shape is static
under jit.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import drop_connect, instance_norm, silu

# Base (unscaled) stage definitions — standard EfficientNet-B0 geometry
# (reference: jarvis/efficienttrack/utils.py:267-272).
_BASE_STAGES = [
    # kernel, repeats, in, out, expand, stride, se_ratio
    (3, 1, 32, 16, 1, 1, 0.25),
    (3, 2, 16, 24, 6, 2, 0.25),
    (5, 2, 24, 40, 6, 2, 0.25),
    (3, 3, 40, 80, 6, 2, 0.25),
    (5, 3, 80, 112, 6, 1, 0.25),
    (5, 4, 112, 192, 6, 2, 0.25),
    (3, 1, 192, 320, 6, 1, 0.25),
]

# width, depth coefficient per compound index (utils.py:150-163).
_SCALING = {0: (0.5, 0.5), 1: (1.0, 1.0), 2: (1.0, 1.1), 3: (1.1, 1.2)}

_PADDING = {1: 0, 3: 1, 5: 2}


def round_filters(filters: float, width: float, divisor: int = 8) -> int:
    """Width scaling with divisor rounding (utils.py:76-96)."""
    filters *= width
    new_filters = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_filters < 0.9 * filters:
        new_filters += divisor
    return int(new_filters)


def round_repeats(repeats: int, depth: float) -> int:
    return int(math.ceil(depth * repeats))


@dataclass(frozen=True)
class BlockSpec:
    stage_idx: int  # the reference's per-stage block_idx (controls full conv)
    kernel: int
    stride: int
    in_filters: int
    out_filters: int
    expand: int
    se_ratio: float
    id_skip: bool = True


def build_block_plan(compound_coef: int) -> tuple[int, list[BlockSpec]]:
    """Expand the scaled stage table into per-block specs.

    Returns (stem_filters, blocks) for the *full* network (before the FPN
    truncation).
    """
    width, depth = _SCALING[compound_coef]
    stem = round_filters(32, width)
    blocks: list[BlockSpec] = []
    for stage_idx, (k, r, ci, co, e, s, se) in enumerate(_BASE_STAGES):
        ci_s = round_filters(ci, width)
        co_s = round_filters(co, width)
        reps = round_repeats(r, depth)
        blocks.append(BlockSpec(stage_idx, k, s, ci_s, co_s, e, se))
        for _ in range(reps - 1):
            blocks.append(BlockSpec(stage_idx, k, 1, co_s, co_s, e, se))
    return stem, blocks


def truncate_and_tap(blocks: list[BlockSpec]) -> tuple[list[BlockSpec], list[int]]:
    """Apply the FPN wrapper's truncation + feature-tap logic.

    Reference: jarvis/efficienttrack/model.py:517-548. ``save_idxs[i]`` is
    True when block i has stride 2 (first such block excluded); the block
    list is cut just before the *last* stride-2 block, and features are
    tapped after block i whenever ``save_idxs[i+1]``.

    Returns (truncated blocks, tap indices into the truncated list).
    """
    save_idxs = []
    ignore_first = True
    last_idx = 0
    for idx, b in enumerate(blocks):
        is_s2 = b.stride == 2
        if ignore_first and is_s2:
            ignore_first = False
            save_idxs.append(False)
        else:
            save_idxs.append(is_s2)
            if is_s2:
                last_idx = idx - 1
    truncated = blocks[: last_idx + 1]
    taps = [i for i in range(len(truncated)) if save_idxs[i + 1]]
    return truncated, taps


class MBConvBlock(nn.Module):
    """Mobile inverted residual block (reference: efficientnet.py:22-123)."""

    spec: BlockSpec
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, drop_rate: float = 0.0, deterministic: bool = True):
        spec = self.spec
        inputs = x
        oup = spec.in_filters * spec.expand
        conv_kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        pad = _PADDING[spec.kernel]

        if spec.stage_idx < 4:
            # Full conv straight from input channels; the expansion conv
            # exists in the reference but is never applied (its params are
            # dropped at weight import).
            x = nn.Conv(
                oup, (spec.kernel, spec.kernel),
                strides=(spec.stride, spec.stride),
                padding=((pad, pad), (pad, pad)),
                use_bias=False, name="_depthwise_conv", **conv_kw,
            )(x)
        else:
            if spec.expand != 1:
                # No norm / activation after expansion (commented out in the
                # reference, efficientnet.py:96-99).
                x = nn.Conv(
                    oup, (1, 1), use_bias=False, name="_expand_conv", **conv_kw
                )(x)
            x = nn.Conv(
                oup, (spec.kernel, spec.kernel),
                strides=(spec.stride, spec.stride),
                padding=((pad, pad), (pad, pad)),
                feature_group_count=oup,
                use_bias=False, name="_depthwise_conv", **conv_kw,
            )(x)

        x = instance_norm(x)
        x = silu(x)

        # Squeeze and excitation
        if spec.se_ratio and 0 < spec.se_ratio <= 1:
            squeezed_ch = max(1, int(spec.in_filters * spec.se_ratio))
            se = jnp.mean(x, axis=(1, 2), keepdims=True)
            se = nn.Conv(squeezed_ch, (1, 1), name="_se_reduce", **conv_kw)(se)
            se = silu(se)
            se = nn.Conv(oup, (1, 1), name="_se_expand", **conv_kw)(se)
            x = jax.nn.sigmoid(se) * x

        x = nn.Conv(
            spec.out_filters, (1, 1), use_bias=False,
            name="_project_conv", **conv_kw,
        )(x)
        x = instance_norm(x)

        if spec.id_skip and spec.stride == 1 and spec.in_filters == spec.out_filters:
            if drop_rate:
                rng = self.make_rng("dropout") if not deterministic else None
                x = drop_connect(x, drop_rate, deterministic, rng)
            x = x + inputs
        return x


class EfficientNetFeatures(nn.Module):
    """Truncated EfficientNet returning the three FPN input feature maps.

    Equivalent to the wrapper ``EfficientNet`` in the reference
    (jarvis/efficienttrack/model.py:508-548): stem -> truncated blocks,
    tapping features before each downsampling block. Returns
    [P3 (stride 4), P4 (stride 8), P5 (stride 16)].
    """

    compound_coef: int
    drop_connect_rate: float = 0.2
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        stem, full_blocks = build_block_plan(self.compound_coef)
        blocks, taps = truncate_and_tap(full_blocks)
        self._stem_filters = stem
        self._taps = set(taps)
        self._conv_stem = nn.Conv(
            stem, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            name="_conv_stem",
        )
        self._blocks = [
            MBConvBlock(spec, dtype=self.dtype, name=f"_blocks_{i}")
            for i, spec in enumerate(blocks)
        ]

    def __call__(self, x, deterministic: bool = True):
        x = silu(instance_norm(self._conv_stem(x)))
        features = []
        n = len(self._blocks)
        for idx, block in enumerate(self._blocks):
            rate = self.drop_connect_rate * float(idx) / n
            x = block(x, drop_rate=rate, deterministic=deterministic)
            if idx in self._taps:
                features.append(x)
        return features
