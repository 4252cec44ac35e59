"""Weighted bidirectional FPN (flax, NHWC).

Re-implements the reference BiFPN / BiFPN_first
(jarvis/efficienttrack/model.py:235-504): five pyramid levels P3-P7
(strides 4..64 here, since the backbone's "P3" is stride 4), top-down then
bottom-up passes, each fusion gated by ReLU-ed learned scalars normalized to
sum one (+1e-4), each node a depthwise-separable conv with InstanceNorm.
The first cell additionally builds P6/P7 from P5 and has 1x1 channel-matching
convs (model.py:404-425).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .layers import SeparableConvBlock, instance_norm, max_pool_2x2, silu, upsample_nearest


class _FusionWeights(nn.Module):
    """ReLU-ed fusion weights normalized to sum 1 (model.py:310-311)."""

    n: int
    epsilon: float = 1e-4

    @nn.compact
    def __call__(self):
        w = self.param("w", nn.initializers.ones, (self.n,), jnp.float32)
        w = jnp.maximum(w, 0.0)
        return w / (jnp.sum(w) + self.epsilon)


class _DownChannel(nn.Module):
    """1x1 conv + InstanceNorm channel matcher (model.py:404-412)."""

    num_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.num_channels, (1, 1), use_bias=True, dtype=self.dtype,
            param_dtype=jnp.float32, name="conv",
        )(x)
        return instance_norm(x)


class BiFPN(nn.Module):
    """One BiFPN cell. ``first`` adds the input-transition convs."""

    num_channels: int
    first: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        conv = lambda name: SeparableConvBlock(
            self.num_channels, norm=True, activation=False,
            dtype=self.dtype, name=name,
        )

        if self.first:
            p3, p4, p5 = inputs
            p6_in = max_pool_2x2(
                _DownChannel(self.num_channels, self.dtype, name="p5_to_p6")(p5)
            )
            p7_in = max_pool_2x2(p6_in)
            p3_in = _DownChannel(self.num_channels, self.dtype,
                                 name="p3_down_channel")(p3)
            p4_in = _DownChannel(self.num_channels, self.dtype,
                                 name="p4_down_channel")(p4)
            p5_in = _DownChannel(self.num_channels, self.dtype,
                                 name="p5_down_channel")(p5)
        else:
            p3_in, p4_in, p5_in, p6_in, p7_in = inputs

        # Top-down pass
        w = _FusionWeights(2, name="p6_w1")()
        p6_up = conv("conv6_up")(
            silu(w[0] * p6_in + w[1] * upsample_nearest(p7_in, 2))
        )
        w = _FusionWeights(2, name="p5_w1")()
        p5_up = conv("conv5_up")(
            silu(w[0] * p5_in + w[1] * upsample_nearest(p6_up, 2))
        )
        w = _FusionWeights(2, name="p4_w1")()
        p4_up = conv("conv4_up")(
            silu(w[0] * p4_in + w[1] * upsample_nearest(p5_up, 2))
        )
        w = _FusionWeights(2, name="p3_w1")()
        p3_out = conv("conv3_up")(
            silu(w[0] * p3_in + w[1] * upsample_nearest(p4_up, 2))
        )

        if self.first:
            # Second set of channel matchers feeding the bottom-up pass
            # (model.py:478-479).
            p4_in = _DownChannel(self.num_channels, self.dtype,
                                 name="p4_down_channel_2")(p4)
            p5_in = _DownChannel(self.num_channels, self.dtype,
                                 name="p5_down_channel_2")(p5)

        # Bottom-up pass
        w = _FusionWeights(3, name="p4_w2")()
        p4_out = conv("conv4_down")(
            silu(w[0] * p4_in + w[1] * p4_up + w[2] * max_pool_2x2(p3_out))
        )
        w = _FusionWeights(3, name="p5_w2")()
        p5_out = conv("conv5_down")(
            silu(w[0] * p5_in + w[1] * p5_up + w[2] * max_pool_2x2(p4_out))
        )
        w = _FusionWeights(3, name="p6_w2")()
        p6_out = conv("conv6_down")(
            silu(w[0] * p6_in + w[1] * p6_up + w[2] * max_pool_2x2(p5_out))
        )
        w = _FusionWeights(2, name="p7_w2")()
        p7_out = conv("conv7_down")(
            silu(w[0] * p7_in + w[1] * max_pool_2x2(p6_out))
        )

        return p3_out, p4_out, p5_out, p6_out, p7_out
