"""EfficientTrack 2D heatmap network (flax, NHWC).

Re-implements the reference EfficientTrackBackbone
(jarvis/efficienttrack/model.py:19-130): EfficientNet feature extractor,
N BiFPN cells, a Softplus-weighted 3-scale merge at P3 (stride 4), one
separable conv, then two heads — ``res1``: 3x3 conv heatmap at input/4 and
``res2``: 4x4 stride-2 transposed-conv heatmap at input/2. The model-size
table (small/medium/large) matches model.py:34-51. The reference's unused
``final_conv2`` / ``gn1`` parameters are intentionally not recreated.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
from flax import linen as nn

from .bifpn import BiFPN
from .efficientnet import EfficientNetFeatures
from .layers import ConvTranspose2dTorch, SeparableConvBlock, upsample_nearest


@dataclass(frozen=True)
class ModelSizeSpec:
    compound_coef: int
    fpn_num_filters: int
    fpn_cell_repeats: int
    final_layer_sizes: int


MODEL_SIZES = {
    "small": ModelSizeSpec(0, 56, 3, 64),
    "medium": ModelSizeSpec(1, 88, 4, 88),
    "large": ModelSizeSpec(3, 160, 6, 160),
}


class EfficientTrackBackbone(nn.Module):
    """Full 2D network: returns (heatmap at /4, heatmap at /2)."""

    model_size: str = "small"
    output_channels: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        spec = MODEL_SIZES[self.model_size]

        features = EfficientNetFeatures(
            spec.compound_coef, dtype=self.dtype, name="backbone_net"
        )(x, deterministic=deterministic)

        feats = BiFPN(
            spec.fpn_num_filters, first=True, dtype=self.dtype, name="bifpn_0"
        )(features)
        for i in range(1, spec.fpn_cell_repeats):
            feats = BiFPN(
                spec.fpn_num_filters, dtype=self.dtype, name=f"bifpn_{i}"
            )(feats)

        x3 = upsample_nearest(feats[2], 4)
        x2 = upsample_nearest(feats[1], 2)

        # Softplus-normalized merge weights (model.py:84-85,123-125).
        w = self.param("weights_cat", nn.initializers.ones, (3,), jnp.float32)
        w = jnp.logaddexp(w, 0.0)  # softplus
        w = w / (jnp.sum(w) + 1e-4)
        x1 = w[0] * feats[0] + w[1] * x2 + w[2] * x3

        res1 = SeparableConvBlock(
            spec.final_layer_sizes, norm=True, activation=False,
            dtype=self.dtype, name="first_conv",
        )(x1)
        res2 = ConvTranspose2dTorch(
            self.output_channels, kernel_size=4, stride=2, padding=1,
            use_bias=False, dtype=self.dtype, name="deconv1",
        )(res1)
        res1 = nn.Conv(
            self.output_channels, (3, 3), padding=((1, 1), (1, 1)),
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            name="final_conv1",
        )(res1)
        return res1, res2
