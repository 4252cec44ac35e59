"""V2V-PoseNet-style 3D CNN (flax, NDHWC).

Re-implements the reference V2VNet (jarvis/hybridnet/v2vnet.py:12-112):
front = stride-2 Basic3DBlock (J -> 2J) + Res3DBlock; encoder/decoder =
k2 s2 conv down to 4J -> Res -> ConvTranspose3d(2,2) back to 2J with a
residual skip; 1x1x1 output conv back to J channels. InstanceNorm3d + ReLU
+ Dropout(0.2) after every block; conv weights initialized N(0, 0.001) with
zero bias (v2vnet.py:105-112).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import instance_norm

_init = nn.initializers.normal(stddev=0.001)


class _ConvTranspose3dTorch(nn.Module):
    """torch nn.ConvTranspose3d(k=2, s=2, p=0) equivalent (NDHWC)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", _init, (2, 2, 2, self.features, in_ch), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        y = jax.lax.conv_transpose(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            strides=(2, 2, 2),
            padding=((1, 1), (1, 1), (1, 1)),  # lax pad = k-1-p_torch = 1
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            transpose_kernel=True,
        )
        return y + bias.astype(self.dtype)


class _FusedUpFrontConv(nn.Module):
    """Stride-2 k3 conv applied to a virtually-2x-upsampled input — the
    exact fused composition (ops/fused_upfront.py). Params are named and
    shaped identically to the plain nn.Conv, so checkpoints interchange."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kernel = self.param("kernel", _init,
                            (3, 3, 3, in_ch, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        from ..ops.fused_upfront import fused_up_conv3d

        return fused_up_conv3d(x, kernel, bias, dtype=self.dtype)


class Basic3DBlock(nn.Module):
    features: int
    kernel_size: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    fused_up: bool = False  # input is half-res; fuse the 2x upsample

    @nn.compact
    def __call__(self, x, deterministic=True):
        if self.fused_up:
            assert self.kernel_size == 3 and self.stride == 2
            x = _FusedUpFrontConv(self.features, dtype=self.dtype,
                                  name="conv")(x)
        else:
            pad = (self.kernel_size - 1) // 2
            x = nn.Conv(
                self.features,
                (self.kernel_size,) * 3,
                strides=(self.stride,) * 3,
                padding=((pad, pad),) * 3,
                kernel_init=_init,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="conv",
            )(x)
        x = jax.nn.relu(instance_norm(x))
        return nn.Dropout(0.2, deterministic=deterministic)(x)


class Res3DBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        res = nn.Conv(
            self.features, (3, 3, 3), padding=((1, 1),) * 3, kernel_init=_init,
            dtype=self.dtype, param_dtype=jnp.float32, name="conv1",
        )(x)
        res = jax.nn.relu(instance_norm(res))
        res = nn.Conv(
            self.features, (3, 3, 3), padding=((1, 1),) * 3, kernel_init=_init,
            dtype=self.dtype, param_dtype=jnp.float32, name="conv2",
        )(res)
        res = instance_norm(res)
        out = jax.nn.relu(res + x)
        return nn.Dropout(0.2, deterministic=deterministic)(out)


class Upsample3DBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        x = _ConvTranspose3dTorch(self.features, dtype=self.dtype,
                                  name="deconv")(x)
        x = jax.nn.relu(instance_norm(x))
        return nn.Dropout(0.2, deterministic=deterministic)(x)


class V2VNet(nn.Module):
    """Input (B, G, G, G, J) voxel volume -> (B, G/2, G/2, G/2, J).

    With ``fused_upsample_front`` the input is the *half-resolution*
    (G/2)^3 volume and the front layer computes
    conv_s2(upsample2(x)) in one fused op (same parameters)."""

    channels: int  # J
    dtype: jnp.dtype = jnp.float32
    fused_upsample_front: bool = False

    @nn.compact
    def __call__(self, x, deterministic=True):
        j = self.channels
        x = Basic3DBlock(2 * j, 3, stride=2, dtype=self.dtype,
                         fused_up=self.fused_upsample_front,
                         name="front_basic")(x, deterministic)
        x = Res3DBlock(2 * j, dtype=self.dtype, name="front_res")(
            x, deterministic)

        skip = Res3DBlock(2 * j, dtype=self.dtype, name="skip_res1")(
            x, deterministic)
        x = Basic3DBlock(4 * j, 2, stride=2, dtype=self.dtype,
                         name="encoder_pool1")(x, deterministic)
        x = Res3DBlock(4 * j, dtype=self.dtype, name="mid_res")(
            x, deterministic)
        x = Upsample3DBlock(2 * j, dtype=self.dtype,
                            name="decoder_upsample1")(x, deterministic)
        x = Res3DBlock(2 * j, dtype=self.dtype, name="decoder_res1")(
            x, deterministic)
        x = x + skip

        x = nn.Conv(
            j, (1, 1, 1), kernel_init=_init, dtype=self.dtype,
            param_dtype=jnp.float32, name="output_layer",
        )(x)
        return x
