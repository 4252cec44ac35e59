"""MFU / roofline accounting for the fused predict3D cascade.

For each stage of the cascade (same stage-gated graphs as
tools/stage_bench.py) this compiles the cumulative graph, reads XLA's
``cost_analysis()`` (flops, bytes accessed) and differences consecutive
stages, then combines the per-stage FLOPs/bytes with measured per-stage
times to report achieved TFLOP/s and GB/s against the chip's peaks —
classifying every stage compute-bound or memory-bound and quantifying the
distance to the roofline. This turns the poses/s headline into a
utilization statement (VERDICT r2 missing #2).

Usage:
  python tools/roofline.py                  # measure times too (needs TPU)
  python tools/roofline.py --times 11.2,3.4,6.9,10.8,0.7
                                            # reuse recorded stage times
Peaks default to TPU v5e (197 bf16 TFLOP/s, 819 GB/s HBM); override with
--peak-tflops / --peak-gbs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

STAGE_NAMES = ["center", "crops", "keypoint", "gather", "full"]
STAGE_DESC = {
    "center": "resize + CenterDetect + argmax + DLT + reproject",
    "crops": "per-camera dynamic-slice crops + normalize",
    "keypoint": "KeypointDetect (T*C crops)",
    "gather": "voxel reprojection gather + value upsample",
    "full": "V2V 3D CNN + soft-argmax",
}


def build_stage_fn(cfg, rig, center_params, hyb_params):
    """The cumulative stage computation from tools/stage_bench.py."""
    import jax
    import jax.numpy as jnp

    from jarvis_hybridnet_tpu.models.efficienttrack import (
        EfficientTrackBackbone,
    )
    from jarvis_hybridnet_tpu.models.repro import reprojection_layer
    from jarvis_hybridnet_tpu.models.v2v import V2VNet
    from jarvis_hybridnet_tpu.ops.heatmap import argmax_2d
    from jarvis_hybridnet_tpu.ops.image import (
        normalize_imagenet,
        resize_bilinear,
    )
    from jarvis_hybridnet_tpu.utils.reprojection import (
        project_points,
        triangulate,
    )

    repro_mode = str(cfg.TPU.REPRO_MODE)
    dtype = (jnp.bfloat16 if cfg.TPU.INFERENCE_DTYPE == "bfloat16"
             else jnp.float32)
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
        import jax as _jax

        center3d = _jax.vmap(lambda p, w: triangulate(p, w, P, K, D))(
            pts_fullres, weights)
        centers = _jax.vmap(lambda c: project_points(c, P, K, D))(center3d)
        centers = centers.astype(jnp.int32)
        cx = jnp.clip(centers[..., 0], bbox_hw, W - bbox_hw)
        cy = jnp.clip(centers[..., 1], bbox_hw, H - bbox_hw)
        if upto == "center":
            return jnp.sum(cx + cy)

        def crop(img, x0, y0):
            return _jax.lax.dynamic_slice(
                img, (y0 - bbox_hw, x0 - bbox_hw, 0), (bbox, bbox, 3))

        crops = _jax.vmap(_jax.vmap(crop))(imgs, cx, cy)
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
        out = _jax.nn.softplus(out.astype(jnp.float32))
        g = out.shape[1]
        coords = jnp.arange(g, dtype=jnp.float32)
        norm = jnp.sum(out, axis=(1, 2, 3))
        x = jnp.einsum("bxyzj,x->bj", out, coords) / norm
        return jnp.sum(x)

    return stages


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--mode", default=None, help="override TPU.REPRO_MODE")
    ap.add_argument("--times", default=None,
                    help="comma-separated per-stage ms (skip measuring)")
    ap.add_argument("--peak-tflops", type=float, default=197.0,
                    help="chip peak bf16 TFLOP/s (v5e: 197)")
    ap.add_argument("--peak-gbs", type=float, default=819.0,
                    help="chip peak HBM GB/s (v5e: 819)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import cv2

    from jarvis_hybridnet_tpu.config import ProjectManager
    from jarvis_hybridnet_tpu.prediction.loaders import (
        init_efficienttrack_params,
        init_hybridnet_params,
    )
    from jarvis_hybridnet_tpu.training.checkpoints import (
        load_efficienttrack_params,
    )
    from jarvis_hybridnet_tpu.utils.calibration import load_camera_rigs

    pm = ProjectManager(parent_dir="/root/reference")
    assert pm.load("Example_Project")
    cfg = pm.get_cfg()
    cfg.DATASET.IMAGE_SIZE = [1280, 1024]
    if args.mode:
        cfg.TPU.REPRO_MODE = args.mode

    rig = load_camera_rigs("/root/reference/datasets/Example_Dataset")[
        "12Cam_Ralph"]
    center_params = load_efficienttrack_params(
        cfg, "CenterDetect",
        "/root/reference/pretrained/MonkeyHand/"
        "EfficientTrack_Center-small.pth",
        init_params=init_efficienttrack_params(cfg, "CenterDetect",
                                               abstract=True))
    hyb_params = init_hybridnet_params(cfg, seed=0)
    stages = build_stage_fn(cfg, rig, center_params, hyb_params)

    T, C, H, W = args.batch, 12, 1024, 1280
    frame = cv2.imread(
        "/root/reference/datasets/Example_Dataset/val/12Cam_Ralph/"
        "Ralph_21072021/Sphere/Camera_B/Frame_58616.jpg")[:, :, ::-1]
    imgs_a = jax.device_put(
        np.broadcast_to(frame, (T, C, H, W, 3)).astype(np.uint8).copy())
    imgs_b = jax.device_put(np.roll(
        np.broadcast_to(frame, (T, C, H, W, 3)).astype(np.uint8),
        1, axis=2).copy())

    cum_flops, cum_bytes, cum_times = {}, {}, {}
    for name in STAGE_NAMES:
        fn = jax.jit(lambda im, n=name: stages(im, n))
        compiled = fn.lower(imgs_a).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):  # per-device list on some backends
            ca = ca[0]
        cum_flops[name] = float(ca.get("flops", 0.0))
        cum_bytes[name] = float(ca.get("bytes accessed", 0.0))
        if args.times is None:
            _ = float(fn(imgs_a))
            _ = float(fn(imgs_b))
            t0 = time.perf_counter()
            for i in range(args.iters):
                out = fn(imgs_a if i % 2 == 0 else imgs_b)
            _ = float(out)
            cum_times[name] = ((time.perf_counter() - t0)
                               / args.iters * 1000.0)

    if args.times is not None:
        deltas_ms = [float(x) for x in args.times.split(",")]
        assert len(deltas_ms) == len(STAGE_NAMES)
    else:
        deltas_ms = []
        prev = 0.0
        for name in STAGE_NAMES:
            deltas_ms.append(cum_times[name] - prev)
            prev = cum_times[name]

    print(f"# Roofline, mode={cfg.TPU.REPRO_MODE} "
          f"dtype={cfg.TPU.INFERENCE_DTYPE} T={T} "
          f"(peaks: {args.peak_tflops} TFLOP/s bf16, "
          f"{args.peak_gbs} GB/s HBM)")
    header = (f"{'stage':10s} {'ms':>7s} {'GFLOP':>8s} {'GB':>7s} "
              f"{'TFLOP/s':>8s} {'GB/s':>7s} {'%MXU':>6s} {'%HBM':>6s} "
              f"bound")
    print(header)
    rows = []
    prev_f = prev_b = 0.0
    for name, ms in zip(STAGE_NAMES, deltas_ms):
        fl = cum_flops[name] - prev_f
        by = cum_bytes[name] - prev_b
        prev_f, prev_b = cum_flops[name], cum_bytes[name]
        tflops = fl / (ms / 1000.0) / 1e12 if ms > 0 else 0.0
        gbs = by / (ms / 1000.0) / 1e9 if ms > 0 else 0.0
        pct_mxu = 100.0 * tflops / args.peak_tflops
        pct_hbm = 100.0 * gbs / args.peak_gbs
        bound = "compute" if pct_mxu >= pct_hbm else "memory"
        rows.append({
            "stage": name, "desc": STAGE_DESC[name], "ms": round(ms, 2),
            "gflop": round(fl / 1e9, 2), "gb": round(by / 1e9, 3),
            "tflops": round(tflops, 2), "gbs": round(gbs, 1),
            "pct_mxu": round(pct_mxu, 1), "pct_hbm": round(pct_hbm, 1),
            "bound": bound,
        })
        print(f"{name:10s} {ms:7.2f} {fl/1e9:8.2f} {by/1e9:7.3f} "
              f"{tflops:8.2f} {gbs:7.1f} {pct_mxu:6.1f} {pct_hbm:6.1f} "
              f"{bound}")
    total_ms = sum(deltas_ms)
    total_fl = cum_flops["full"]
    total_by = cum_bytes["full"]
    mfu = 100.0 * (total_fl / (total_ms / 1000.0) / 1e12) / args.peak_tflops
    print(f"{'TOTAL':10s} {total_ms:7.2f} {total_fl/1e9:8.2f} "
          f"{total_by/1e9:7.3f}  MFU={mfu:.1f}%  "
          f"({args.batch / (total_ms/1000.0):.1f} poses/s/batch-sync)")
    print(json.dumps({"rows": rows, "total_ms": round(total_ms, 2),
                      "mfu_pct": round(mfu, 2)}), file=sys.stderr)


if __name__ == "__main__":
    main()
