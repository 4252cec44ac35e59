"""Stage attribution of the fused predict3D cascade on the live TPU.

Builds stage-gated jitted variants of the cascade (same building blocks as
prediction/predictor3d.py) that stop after stage k and return a tiny
scalar, so per-stage cost = t[k] - t[k-1] without the tunnel's slow-relay
distortion on large outputs (see BASELINE.md measurement notes).

Usage: python tools/stage_bench.py [--iters N] [--batch T]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--mode", default=None, help="override TPU.REPRO_MODE")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import cv2

    from jarvis_hybridnet_tpu.config import ProjectManager
    from jarvis_hybridnet_tpu.models.efficienttrack import (
        EfficientTrackBackbone,
    )
    from jarvis_hybridnet_tpu.models.repro import (
        gather_voxel_volume,
        reproject_indices,
        reprojection_layer,
    )
    from jarvis_hybridnet_tpu.models.v2v import V2VNet
    from jarvis_hybridnet_tpu.ops.heatmap import argmax_2d
    from jarvis_hybridnet_tpu.ops.image import (
        normalize_imagenet,
        resize_bilinear,
    )
    from jarvis_hybridnet_tpu.prediction.loaders import (
        init_efficienttrack_params,
        init_hybridnet_params,
    )
    from jarvis_hybridnet_tpu.training.checkpoints import (
        load_efficienttrack_params,
    )
    from jarvis_hybridnet_tpu.utils.calibration import load_camera_rigs
    from jarvis_hybridnet_tpu.utils.reprojection import (
        project_points,
        triangulate,
    )

    pm = ProjectManager(parent_dir="/root/reference")
    assert pm.load("Example_Project")
    cfg = pm.get_cfg()
    cfg.DATASET.IMAGE_SIZE = [1280, 1024]
    if args.mode:
        cfg.TPU.REPRO_MODE = args.mode
    repro_mode = str(cfg.TPU.REPRO_MODE)
    dtype = (jnp.bfloat16 if cfg.TPU.INFERENCE_DTYPE == "bfloat16"
             else jnp.float32)

    rig = load_camera_rigs("/root/reference/datasets/Example_Dataset")[
        "12Cam_Ralph"
    ]
    center_params = load_efficienttrack_params(
        cfg, "CenterDetect",
        "/root/reference/pretrained/MonkeyHand/"
        "EfficientTrack_Center-small.pth",
        init_params=init_efficienttrack_params(cfg, "CenterDetect",
                                               abstract=True),
    )
    hyb_params = init_hybridnet_params(cfg, seed=0)

    center_size = int(cfg.CENTERDETECT.IMAGE_SIZE)
    bbox = int(cfg.KEYPOINTDETECT.BOUNDING_BOX_SIZE)
    bbox_hw = bbox // 2
    J = int(cfg.KEYPOINTDETECT.NUM_JOINTS)
    G = int(cfg.HYBRIDNET.ROI_CUBE_SIZE) // int(cfg.HYBRIDNET.GRID_SPACING)
    spacing = float(cfg.HYBRIDNET.GRID_SPACING)
    mean = jnp.asarray(cfg.DATASET.MEAN, jnp.float32)
    std = jnp.asarray(cfg.DATASET.STD, jnp.float32)
    P = jnp.asarray(rig.camera_matrices, jnp.float32)
    K = jnp.asarray(rig.intrinsics, jnp.float32)
    D = jnp.asarray(rig.distortions, jnp.float32)

    center_model = EfficientTrackBackbone(
        model_size=cfg.CENTERDETECT.MODEL_SIZE, output_channels=1,
        dtype=dtype)
    eff_model = EfficientTrackBackbone(
        model_size=cfg.KEYPOINTDETECT.MODEL_SIZE, output_channels=J,
        dtype=dtype)
    v2v_model = V2VNet(J, dtype=dtype,
                       fused_upsample_front=(repro_mode == "half_fused"))

    def stages(imgs, upto):
        T, C, H, W = imgs.shape[:4]
        scale = jnp.asarray(
            [W / float(center_size), H / float(center_size)], jnp.float32)
        flat = imgs.reshape(T * C, H, W, 3)
        resized = resize_bilinear(flat, center_size, center_size) / 255.0
        inp = normalize_imagenet(resized, mean, std).astype(dtype)
        _, hm = center_model.apply({"params": center_params}, inp)
        hm = hm.astype(jnp.float32)
        xy, maxval = argmax_2d(hm)
        preds = xy[:, 0].reshape(T, C, 2).astype(jnp.float32)
        maxvals = maxval[:, 0].reshape(T, C)
        weights = maxvals / 255.0
        pts_fullres = preds * (scale * 2.0)
        center3d = jax.vmap(lambda p, w: triangulate(p, w, P, K, D))(
            pts_fullres, weights)
        centers = jax.vmap(lambda c: project_points(c, P, K, D))(center3d)
        centers = centers.astype(jnp.int32)
        cx = jnp.clip(centers[..., 0], bbox_hw, W - bbox_hw)
        cy = jnp.clip(centers[..., 1], bbox_hw, H - bbox_hw)
        if upto == "center":
            return jnp.sum(cx + cy)

        def crop(img, x0, y0):
            return jax.lax.dynamic_slice(
                img, (y0 - bbox_hw, x0 - bbox_hw, 0), (bbox, bbox, 3))

        crops = jax.vmap(jax.vmap(crop))(imgs, cx, cy)
        crops = crops.astype(jnp.float32) / 255.0
        crops = normalize_imagenet(crops, mean, std)
        if upto == "crops":
            return jnp.sum(crops[:, :, ::64, ::64])

        flatc = crops.reshape(T * C, bbox, bbox, 3).astype(dtype)
        _, heatmaps = eff_model.apply({"params": hyb_params["effTrack"]},
                                      flatc)
        h = heatmaps.shape[1]
        heatmaps = heatmaps.astype(jnp.float32)
        heatmaps = heatmaps.transpose(0, 3, 1, 2).reshape(T, C, J, h, h)
        heatmaps = jnp.pad(
            heatmaps, ((0, 0), (0, 0), (0, 0), (1, 1), (1, 1)))
        if upto == "keypoint":
            return jnp.sum(heatmaps[..., ::32, ::32])

        center_hm = jnp.stack([cx, cy], axis=-1)
        voxels = reprojection_layer(
            heatmaps, center3d.astype(jnp.int32), center_hm,
            jnp.broadcast_to(P, (T,) + P.shape),
            jnp.broadcast_to(K, (T,) + K.shape),
            jnp.broadcast_to(D, (T,) + D.shape),
            G, spacing, mode=repro_mode)
        if upto == "gather":
            return jnp.sum(voxels[:, ::8, ::8, ::8])

        vol = (voxels / 255.0).astype(dtype)
        out = v2v_model.apply({"params": hyb_params["v2vNet"]}, vol)
        out = jax.nn.softplus(out.astype(jnp.float32))
        g = out.shape[1]
        coords = jnp.arange(g, dtype=jnp.float32)
        norm = jnp.sum(out, axis=(1, 2, 3))
        x = jnp.einsum("bxyzj,x->bj", out, coords) / norm
        return jnp.sum(x)

    T, C, H, W = args.batch, 12, 1024, 1280
    frame = cv2.imread(
        "/root/reference/datasets/Example_Dataset/val/12Cam_Ralph/"
        "Ralph_21072021/Sphere/Camera_B/Frame_58616.jpg")[:, :, ::-1]
    imgs_a = jax.device_put(
        np.broadcast_to(frame, (T, C, H, W, 3)).astype(np.uint8).copy())
    imgs_b = jax.device_put(np.roll(
        np.broadcast_to(frame, (T, C, H, W, 3)).astype(np.uint8),
        1, axis=2).copy())

    names = ["center", "crops", "keypoint", "gather", "full"]
    times = {}
    for name in names:
        fn = jax.jit(lambda im, n=name: stages(im, n))
        _ = float(fn(imgs_a))  # compile
        _ = float(fn(imgs_b))
        t0 = time.perf_counter()
        for i in range(args.iters):
            out = fn(imgs_a if i % 2 == 0 else imgs_b)
        _ = float(out)
        times[name] = (time.perf_counter() - t0) / args.iters * 1000.0

    print(f"mode={repro_mode} dtype={dtype.__name__} T={T} "
          f"iters={args.iters}")
    prev = 0.0
    for name in names:
        print(f"{name:10s} cum={times[name]:7.2f} ms  "
              f"delta={times[name] - prev:7.2f} ms")
        prev = times[name]
    pps = T / (times["full"] / 1000.0)
    print(f"poses/s (sync) = {pps:.1f}")


if __name__ == "__main__":
    main()
