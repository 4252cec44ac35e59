"""Shared NN building blocks (NHWC / NDHWC, TPU-friendly).

Numerics replicate the reference's torch layers exactly:
  * InstanceNorm = per-sample, per-channel normalization over spatial dims
    with eps=1e-5, no affine params, biased variance
    (torch nn.InstanceNorm2d/3d defaults; used everywhere in the reference
    instead of BatchNorm, e.g. jarvis/efficienttrack/efficientnet.py:50).
  * Nearest-neighbor upsampling by integer factors == pixel repetition
    (torch nn.Upsample(mode='nearest')).
  * ConvTranspose matches torch's output-size formula
    ``(in-1)*s - 2p + k`` via lax.conv_transpose(transpose_kernel=True).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from flax import linen as nn


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm over spatial dims (all but first/last), no affine.

    Works for NHWC (2D) and NDHWC (3D). Statistics in float32.
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    axes = tuple(range(1, x.ndim - 1))
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=axes, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(dtype)


def upsample_nearest(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Nearest-neighbor 2D upsample by an integer factor (NHWC)."""
    x = jnp.repeat(x, factor, axis=1)
    return jnp.repeat(x, factor, axis=2)


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """torch nn.MaxPool2d(2, 2) (floor mode) == VALID window reduction."""
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2), padding="VALID")


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(x)


def drop_connect(
    x: jnp.ndarray, rate: float, deterministic: bool, rng: jax.Array | None
) -> jnp.ndarray:
    """Per-sample stochastic depth (reference:
    jarvis/efficienttrack/utils.py:115-138)."""
    if deterministic or rate == 0.0:
        return x
    keep_prob = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    random_tensor = keep_prob + jax.random.uniform(rng, shape, dtype=x.dtype)
    binary = jnp.floor(random_tensor)
    return x / keep_prob * binary


class Conv(nn.Module):
    """2D convolution, torch-compatible semantics (explicit symmetric pad)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    groups: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            use_bias=self.use_bias,
            feature_group_count=self.groups,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)


class ConvTranspose2dTorch(nn.Module):
    """torch nn.ConvTranspose2d equivalent.

    Kernel param layout is (kH, kW, O, I) — the layout lax.conv_transpose
    expects with ``transpose_kernel=True`` (it swaps I/O and flips spatial
    dims internally, matching torch's gradient-of-conv semantics). The torch
    weight (I, O, kH, kW) is transposed by (2, 3, 1, 0) at import time.
    """

    features: int
    kernel_size: int
    stride: int
    padding: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (self.kernel_size, self.kernel_size, self.features, in_ch),
            jnp.float32,
        )
        # lax.conv_transpose pads the dilated input directly, so torch's
        # "padding=p" (output-cropping convention, out=(in-1)s-2p+k) maps to
        # lax padding k-1-p per side.
        lp = self.kernel_size - 1 - self.padding
        y = jax.lax.conv_transpose(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            strides=(self.stride, self.stride),
            padding=((lp, lp), (lp, lp)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            transpose_kernel=True,
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + bias.astype(self.dtype)
        return y


class SeparableConvBlock(nn.Module):
    """Depthwise-separable conv with optional InstanceNorm / SiLU.

    Reference: jarvis/efficienttrack/model.py:180-232. Depthwise 3x3 (no
    bias) then pointwise 1x1 (with bias), InstanceNorm if ``norm``.
    """

    out_channels: int
    norm: bool = True
    activation: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        x = nn.Conv(
            features=in_ch,
            kernel_size=(3, 3),
            padding=((1, 1), (1, 1)),
            feature_group_count=in_ch,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="depthwise_conv",
        )(x)
        x = nn.Conv(
            features=self.out_channels,
            kernel_size=(1, 1),
            use_bias=True,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="pointwise_conv",
        )(x)
        if self.norm:
            x = instance_norm(x)
        if self.activation:
            x = silu(x)
        return x
