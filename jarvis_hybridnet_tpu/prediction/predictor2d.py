"""Fused 2D prediction cascade (jit, batched over frames).

TPU-native equivalent of JarvisPredictor2D
(jarvis/prediction/jarvis2D.py:17-155): resize -> normalize -> CenterDetect
-> argmax gate (maxval > 40) -> clamped crop -> KeypointDetect -> decode.
The whole cascade is one jitted graph with static shapes; the detection gate
becomes a validity flag (the reference returns ``None``) and frames are
batched along a leading time axis for TPU throughput instead of the
reference's one-frame-at-a-time loop.

The reference's TensorRT fp16 engines (jarvis/prediction/jarvis2D.py:63-98)
map to the ``dtype=bfloat16`` compute path + XLA persistent compilation
cache (see prediction.compile_cache).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..models.efficienttrack import EfficientTrackBackbone
from ..ops.heatmap import argmax_2d
from ..ops.image import (
    normalize_imagenet,
    resize_bilinear,
    resize_bilinear_mxu,
)


def build_predict2d(
    cfg,
    center_params: Any,
    keypoint_params: Any,
    dtype=jnp.float32,
    jit: bool = True,
):
    """Returns a jitted ``fn(imgs) -> (points2D, confidences, valid)``.

    imgs: (T, H, W, 3) float32 in [0, 1] (RGB full frames).
    points2D: (T, J, 2) float32 full-resolution pixels;
    confidences: (T, J); valid: (T,) bool (maxval > 40 gate,
    jarvis2D.py:121).

    ``jit=False`` returns the untraced TWO-argument function
    ``fn(params, imgs)`` (params = {'center':..., 'keypoint':...}) so
    callers can jit it themselves with explicit shardings
    (parallel/predict_step.py).

    Weights are jit arguments, not closure constants — see
    predictor3d.build_predict3d for why (cache-key stability + no D2H
    constant fetches during lowering on tunneled devices).
    """
    center_size = int(cfg.CENTERDETECT.IMAGE_SIZE)
    bbox = int(cfg.KEYPOINTDETECT.BOUNDING_BOX_SIZE)
    bbox_hw = bbox // 2
    num_joints = int(cfg.KEYPOINTDETECT.NUM_JOINTS)
    import numpy as np

    mean = np.asarray(cfg.DATASET.MEAN, np.float32)
    std = np.asarray(cfg.DATASET.STD, np.float32)

    center_model = EfficientTrackBackbone(
        model_size=cfg.CENTERDETECT.MODEL_SIZE, output_channels=1, dtype=dtype
    )
    keypoint_model = EfficientTrackBackbone(
        model_size=cfg.KEYPOINTDETECT.MODEL_SIZE,
        output_channels=num_joints,
        dtype=dtype,
    )

    def predict(params, imgs: jnp.ndarray):
        center_params = params["center"]
        keypoint_params = params["keypoint"]
        # uint8 frames ship as uint8 (4x less H2D) and stay uint8 through
        # the resize gathers / crop slices
        is_uint8 = imgs.dtype == jnp.uint8
        value_scale = 255.0 if is_uint8 else 1.0
        T, H, W = imgs.shape[0], imgs.shape[1], imgs.shape[2]
        scale_x = W / float(center_size)
        scale_y = H / float(center_size)

        if dtype == jnp.bfloat16:
            # MXU selection-matmul resize (see predictor3d / ops/image.py)
            resized = resize_bilinear_mxu(
                imgs, center_size, center_size, dtype) / value_scale
            inp = normalize_imagenet(resized, mean.astype(dtype),
                                     std.astype(dtype))
        else:
            resized = resize_bilinear(
                imgs, center_size, center_size) / value_scale
            inp = normalize_imagenet(resized, mean, std).astype(dtype)
        _, hm = center_model.apply({"params": center_params}, inp)
        hm = hm.astype(jnp.float32)
        xy, maxval = argmax_2d(hm)  # (T, 1, 2), (T, 1)
        maxval = maxval[:, 0]
        valid = maxval > 40.0

        # stride-2 heatmap coords -> full-res (jarvis2D.py:122-125)
        cx = (xy[:, 0, 0].astype(jnp.float32) * scale_x * 2.0).astype(jnp.int32)
        cy = (xy[:, 0, 1].astype(jnp.float32) * scale_y * 2.0).astype(jnp.int32)
        cx = jnp.clip(cx, bbox_hw, W - bbox_hw - 1)
        cy = jnp.clip(cy, bbox_hw, H - bbox_hw - 1)

        def crop(img, x0, y0):
            return jax.lax.dynamic_slice(
                img, (y0 - bbox_hw, x0 - bbox_hw, 0), (bbox, bbox, 3)
            )

        crops = jax.vmap(crop)(imgs, cx, cy)
        crops = crops.astype(jnp.float32) / value_scale
        crops = normalize_imagenet(crops, mean, std).astype(dtype)
        _, khm = keypoint_model.apply({"params": keypoint_params}, crops)
        khm = khm.astype(jnp.float32)
        kxy, kmax = argmax_2d(khm)  # (T, J, 2), (T, J)

        offset = jnp.stack([cx - bbox_hw, cy - bbox_hw], axis=-1)
        points = kxy.astype(jnp.float32) * 2.0 + offset[:, None, :]
        confidences = jnp.clip(kmax, max=255.0) / 255.0
        return points, confidences, valid

    params_tree = {"center": center_params, "keypoint": keypoint_params}
    if not jit:
        return predict
    from .export import wrap_predictor

    return wrap_predictor(predict, params_tree)
