"""Fused 3D prediction cascade (jit, batched over framesets).

TPU-native equivalent of JarvisPredictor3D
(jarvis/prediction/jarvis3D.py:19-190): CenterDetect on all cameras as one
batch, >=2-camera maxval>50 gate, confidence-weighted DLT triangulation of
the subject center, reprojection into every camera for crop placement,
per-camera crops, then the HybridNet 3D stage. Everything is one jitted
graph; T framesets are batched along a leading axis (the reference streams
one frameset at a time, predict3D.py:75).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..models.efficienttrack import EfficientTrackBackbone
from ..models.hybridnet import HybridNetBackbone
from ..ops.heatmap import argmax_2d
from ..ops.image import (
    normalize_imagenet,
    resize_bilinear,
    resize_bilinear_mxu,
)
from ..utils.reprojection import project_points, triangulate


def build_predict3d(
    cfg,
    center_params: Any,
    hybridnet_params: Any,
    camera_matrices,  # (C, 4, 3)
    intrinsics,  # (C, 3, 3)
    distortions,  # (C, 1, 5)
    dtype=jnp.float32,
    jit: bool = True,
):
    """Returns a jitted ``fn(imgs) -> (points3D, confidences, valid)``.

    imgs: (T, C, H, W, 3) float32 RGB in [0, 1].
    points3D: (T, J, 3) world mm; confidences: (T, J); valid: (T,) bool.
    ``jit=False`` returns the untraced TWO-argument function
    ``fn(params, imgs)`` (params = {'center':..., 'hybrid':...}) so
    callers can jit it themselves with explicit shardings
    (parallel/predict_step.py).

    The network weights are jit *arguments* (device_put once at build),
    NOT closure constants: embedding ~50 MB of parameters as HLO
    constants (a) made every checkpoint a different executable — defeating
    the persistent compilation cache, the TRT-'previous' analog — and
    (b) on tunneled devices forced lowering to fetch every constant D2H
    through the slow relay (measured: minutes of wall time). Geometry and
    normalization constants stay as *host numpy* closures for the same
    reason.
    """
    center_size = int(cfg.CENTERDETECT.IMAGE_SIZE)
    bbox = int(cfg.KEYPOINTDETECT.BOUNDING_BOX_SIZE)
    bbox_hw = bbox // 2
    num_joints = int(cfg.KEYPOINTDETECT.NUM_JOINTS)
    num_cameras = int(cfg.HYBRIDNET.NUM_CAMERAS)
    mean = np.asarray(cfg.DATASET.MEAN, np.float32)
    std = np.asarray(cfg.DATASET.STD, np.float32)

    P = np.asarray(camera_matrices, np.float32)
    K = np.asarray(intrinsics, np.float32)
    D = np.asarray(distortions, np.float32)

    center_model = EfficientTrackBackbone(
        model_size=cfg.CENTERDETECT.MODEL_SIZE, output_channels=1, dtype=dtype
    )
    hybrid_model = HybridNetBackbone(
        num_joints=num_joints,
        model_size=cfg.KEYPOINTDETECT.MODEL_SIZE,
        roi_cube_size=int(cfg.HYBRIDNET.ROI_CUBE_SIZE),
        grid_spacing=int(cfg.HYBRIDNET.GRID_SPACING),
        dtype=dtype,
        repro_mode=str(cfg.get("TPU", {}).get("REPRO_MODE", "exact")),
    )

    def predict(params, imgs: jnp.ndarray):
        center_params = params["center"]
        hybridnet_params = params["hybrid"]
        # uint8 frames stay uint8 until after the resize gathers / crop
        # slices — 4x less HBM traffic on the full-resolution frames.
        is_uint8 = imgs.dtype == jnp.uint8
        value_scale = 255.0 if is_uint8 else 1.0
        T, C, H, W = imgs.shape[0], imgs.shape[1], imgs.shape[2], imgs.shape[3]
        scale = jnp.asarray(
            [W / float(center_size), H / float(center_size)], jnp.float32
        )

        # --- CenterDetect over all (T*C) frames as one batch -------------
        flat = imgs.reshape(T * C, H, W, 3)
        if dtype == jnp.bfloat16:
            # MXU selection-matmul resize (ops/image.py): ~1.5x faster on
            # the full-res frames; its bf16 rounding is absorbed by the
            # bf16 net input this path feeds anyway
            resized = resize_bilinear_mxu(
                flat, center_size, center_size, dtype) / value_scale
            inp = normalize_imagenet(resized, mean.astype(dtype),
                                     std.astype(dtype))
        else:
            resized = resize_bilinear(
                flat, center_size, center_size) / value_scale
            inp = normalize_imagenet(resized, mean, std).astype(dtype)
        _, hm = center_model.apply({"params": center_params}, inp)
        hm = hm.astype(jnp.float32)
        xy, maxval = argmax_2d(hm)  # (T*C, 1, 2), (T*C, 1)
        preds = xy[:, 0].reshape(T, C, 2).astype(jnp.float32)
        maxvals = maxval[:, 0].reshape(T, C)

        # gate: >=2 cameras above 50 (jarvis3D.py:154-157)
        valid = jnp.sum(maxvals > 50.0, axis=1) >= 2
        weights = maxvals / 255.0

        # --- weighted DLT triangulation of the center (jarvis3D.py:158-160)
        pts_fullres = preds * (scale * 2.0)

        def tri(p2d, w):
            return triangulate(p2d, w, P, K, D)

        center3d = jax.vmap(tri)(pts_fullres, weights)  # (T, 3)
        center3d = jnp.where(valid[:, None], center3d, 0.0)

        # --- reproject center into all cameras -> crop centers ------------
        centers = jax.vmap(
            lambda c: project_points(c, P, K, D)
        )(center3d)  # (T, C, 2)
        centers = centers.astype(jnp.int32)
        cx = jnp.clip(centers[..., 0], bbox_hw, W - bbox_hw)
        cy = jnp.clip(centers[..., 1], bbox_hw, H - bbox_hw)

        def crop(img, x0, y0):
            return jax.lax.dynamic_slice(
                img, (y0 - bbox_hw, x0 - bbox_hw, 0), (bbox, bbox, 3)
            )

        crops = jax.vmap(jax.vmap(crop))(imgs, cx, cy)  # (T, C, bbox, bbox, 3)
        crops = crops.astype(jnp.float32) / value_scale
        crops = normalize_imagenet(crops, mean, std)

        center_hm = jnp.stack([cx, cy], axis=-1)  # (T, C, 2)
        _, _, points3d, confidences = hybrid_model.apply(
            {"params": hybridnet_params},
            crops,
            center_hm,
            center3d.astype(jnp.int32),
            jnp.broadcast_to(P, (T,) + P.shape),
            jnp.broadcast_to(K, (T,) + K.shape),
            jnp.broadcast_to(D, (T,) + D.shape),
        )
        return points3d, confidences, valid

    params_tree = {"center": center_params, "hybrid": hybridnet_params}
    if not jit:
        return predict
    from .export import wrap_predictor

    return wrap_predictor(predict, params_tree)


def build_predict3d_twophase(
    cfg,
    center_params: Any,
    hybridnet_params: Any,
    camera_matrices,  # (C, 4, 3)
    intrinsics,  # (C, 3, 3)
    distortions,  # (C, 1, 5)
    full_size,  # (W, H) of the full-resolution recording
    lowres_factor: int = 4,
    dtype=jnp.float32,
):
    """Split cascade for host-bandwidth-bound streaming.

    The fused predictor uploads full-resolution frames
    (T*C*H*W*3 ~ 377 MB per T=8 batch on the 12-cam rig) although the
    device only ever *reads* ~11% of those bytes: the CenterDetect pass
    consumes a 4x-downscaled view and the rest of the cascade consumes
    the 256^2 crop windows. Splitting the cascade moves the data
    reduction onto the host:

      phase A (device): lowres frames -> CenterDetect -> gate + weighted
        DLT -> crop centers (full-res coords) + center3D;
      (host): slice bbox^2 windows out of the already-decoded full-res
        ring buffers at those centers;
      phase B (device): crops -> KeypointDetect -> reprojection -> V2V
        -> soft-argmax.

    H2D per batch drops ~9x (24 MB lowres + 19 MB crops vs 377 MB).
    CenterDetect sees resize(lowres) instead of resize(full-res), so the
    detected center can shift by a pixel or two — the same order as the
    stride-2 argmax's intrinsic quantization. Because the voxel volume is
    built crop-relative (per-camera projection shifts cancel), ANY center
    estimate rigidly translates the whole pose by its own error — in the
    fused path and the reference alike — while the crop-relative pose is
    bit-for-bit the same computation. Guarded by
    tests/test_predictor_golden.py::test_predict3d_twophase_matches_fused
    (rigid offset < 5 mm, non-rigid residual < 0.25 mm).

    Returns ``(phase_a, phase_b, crop_fn)``:
      phase_a(lowres_uint8 (T, C, H/f, W/f, 3)) -> (cx, cy, center3d, valid)
      phase_b(crops_uint8 (T, C, bbox, bbox, 3), cx, cy, center3d)
        -> (points3D, confidences)
      crop_fn(frames (T, C, H, W, 3) np.uint8, cx, cy) -> host crops
    """
    center_size = int(cfg.CENTERDETECT.IMAGE_SIZE)
    bbox = int(cfg.KEYPOINTDETECT.BOUNDING_BOX_SIZE)
    bbox_hw = bbox // 2
    num_joints = int(cfg.KEYPOINTDETECT.NUM_JOINTS)
    mean = np.asarray(cfg.DATASET.MEAN, np.float32)
    std = np.asarray(cfg.DATASET.STD, np.float32)
    P = np.asarray(camera_matrices, np.float32)
    K = np.asarray(intrinsics, np.float32)
    D = np.asarray(distortions, np.float32)
    W_full, H_full = int(full_size[0]), int(full_size[1])

    center_model = EfficientTrackBackbone(
        model_size=cfg.CENTERDETECT.MODEL_SIZE, output_channels=1,
        dtype=dtype)
    hybrid_model = HybridNetBackbone(
        num_joints=num_joints,
        model_size=cfg.KEYPOINTDETECT.MODEL_SIZE,
        roi_cube_size=int(cfg.HYBRIDNET.ROI_CUBE_SIZE),
        grid_spacing=int(cfg.HYBRIDNET.GRID_SPACING),
        dtype=dtype,
        repro_mode=str(cfg.get("TPU", {}).get("REPRO_MODE", "exact")),
    )

    def phase_a(params, lowres):
        T, C, Hl, Wl = (lowres.shape[0], lowres.shape[1], lowres.shape[2],
                        lowres.shape[3])
        is_uint8 = lowres.dtype == jnp.uint8
        value_scale = 255.0 if is_uint8 else 1.0
        # heatmap coords -> FULL-resolution pixels (DLT intrinsics are in
        # full-res pixels)
        scale = jnp.asarray(
            [W_full / float(center_size), H_full / float(center_size)],
            jnp.float32)
        flat = lowres.reshape(T * C, Hl, Wl, 3)
        if dtype == jnp.bfloat16:
            resized = resize_bilinear_mxu(
                flat, center_size, center_size, dtype) / value_scale
            inp = normalize_imagenet(resized, mean.astype(dtype),
                                     std.astype(dtype))
        else:
            resized = resize_bilinear(
                flat, center_size, center_size) / value_scale
            inp = normalize_imagenet(resized, mean, std).astype(dtype)
        _, hm = center_model.apply({"params": params}, inp)
        hm = hm.astype(jnp.float32)
        xy, maxval = argmax_2d(hm)
        preds = xy[:, 0].reshape(T, C, 2).astype(jnp.float32)
        maxvals = maxval[:, 0].reshape(T, C)
        valid = jnp.sum(maxvals > 50.0, axis=1) >= 2
        weights = maxvals / 255.0
        pts_fullres = preds * (scale * 2.0)
        center3d = jax.vmap(lambda p, w: triangulate(p, w, P, K, D))(
            pts_fullres, weights)
        center3d = jnp.where(valid[:, None], center3d, 0.0)
        centers = jax.vmap(lambda c: project_points(c, P, K, D))(center3d)
        centers = centers.astype(jnp.int32)
        cx = jnp.clip(centers[..., 0], bbox_hw, W_full - bbox_hw)
        cy = jnp.clip(centers[..., 1], bbox_hw, H_full - bbox_hw)
        return cx, cy, center3d.astype(jnp.int32), valid

    def phase_b(params, crops, cx, cy, center3d):
        T = crops.shape[0]
        is_uint8 = crops.dtype == jnp.uint8
        value_scale = 255.0 if is_uint8 else 1.0
        crops = crops.astype(jnp.float32) / value_scale
        crops = normalize_imagenet(crops, mean, std)
        center_hm = jnp.stack([cx, cy], axis=-1)
        _, _, points3d, confidences = hybrid_model.apply(
            {"params": params},
            crops,
            center_hm,
            center3d,
            jnp.broadcast_to(P, (T,) + P.shape),
            jnp.broadcast_to(K, (T,) + K.shape),
            jnp.broadcast_to(D, (T,) + D.shape),
        )
        return points3d, confidences

    jit_a = jax.jit(phase_a)
    jit_b = jax.jit(phase_b)
    center_dev = jax.device_put(center_params)
    hybrid_dev = jax.device_put(hybridnet_params)

    def crop_fn(frames: np.ndarray, cx: np.ndarray, cy: np.ndarray):
        """Host-side window slicing from the full-res decode ring."""
        T, C = frames.shape[0], frames.shape[1]
        out = np.empty((T, C, bbox, bbox, 3), np.uint8)
        for t in range(T):
            for c in range(C):
                x0 = int(cx[t, c]) - bbox_hw
                y0 = int(cy[t, c]) - bbox_hw
                out[t, c] = frames[t, c, y0:y0 + bbox, x0:x0 + bbox]
        return out

    return (lambda lowres: jit_a(center_dev, lowres),
            lambda crops, cx, cy, c3d: jit_b(hybrid_dev, crops, cx, cy,
                                             c3d),
            crop_fn)
