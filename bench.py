"""Benchmark: 3D poses/sec/chip on the 12-camera rig (north-star metric).

Runs the full fused predict3D cascade — 12x 1280x1024 uint8 frames ->
CenterDetect -> weighted DLT -> crops -> KeypointDetect -> voxel
reprojection -> V2V -> soft-argmax — on the Example_Project configuration
(23 joints, 256^2 crops, 72^3 grid) in bfloat16, batched over framesets,
and prints one JSON line.

The reference publishes no numbers (BASELINE.md); vs_baseline is therefore
reported against the recorded reference measurement when BASELINE.json
gains one, else null.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    # persistent compilation cache: repeat bench runs skip the ~6 min
    # compile (the trt_mode='previous' analog)
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from jarvis_hybridnet_tpu.config import ProjectManager
    from jarvis_hybridnet_tpu.prediction.loaders import make_predictor3d
    from jarvis_hybridnet_tpu.utils.calibration import load_camera_rigs

    pm = ProjectManager(parent_dir="/root/reference")
    assert pm.load("Example_Project"), "Example_Project fixture missing"
    cfg = pm.get_cfg()
    cfg.DATASET.IMAGE_SIZE = [1280, 1024]

    rig = load_camera_rigs("/root/reference/datasets/Example_Dataset")[
        "12Cam_Ralph"
    ]
    predictor = make_predictor3d(
        cfg,
        rig,
        weights_center_detect=(
            "/root/reference/pretrained/MonkeyHand/"
            "EfficientTrack_Center-small.pth"),
        weights_hybridnet=None,
    )

    T, C, H, W = 8, 12, 1024, 1280
    # real frames so the detection gate passes; two distinct buffers so the
    # runtime cannot dedupe identical executions
    import cv2

    frame = cv2.imread(
        "/root/reference/datasets/Example_Dataset/val/12Cam_Ralph/"
        "Ralph_21072021/Sphere/Camera_B/Frame_58616.jpg"
    )
    frame = frame[:, :, ::-1]  # RGB
    imgs_a = jax.device_put(
        np.broadcast_to(frame, (T, C, H, W, 3)).astype(np.uint8).copy()
    )
    imgs_b = jax.device_put(
        np.roll(
            np.broadcast_to(frame, (T, C, H, W, 3)).astype(np.uint8),
            1, axis=2,
        ).copy()
    )

    # compile + warmup; sync via a scalar D2H fetch (block_until_ready does
    # not actually block on tunneled backends)
    out = predictor(imgs_a)
    _ = float(out[0][0, 0, 0])

    iters = 20
    start = time.perf_counter()
    for i in range(iters):
        out = predictor(imgs_a if i % 2 == 0 else imgs_b)
    _ = float(out[0][0, 0, 0])
    elapsed = time.perf_counter() - start

    poses_per_sec = iters * T / elapsed

    baseline = None
    try:
        with open("BASELINE.json") as f:
            published = json.load(f).get("published", {})
        baseline = published.get("poses_per_sec")
    except Exception:
        pass
    vs = poses_per_sec / baseline if baseline else None

    print(json.dumps({
        "metric": "predict3D poses/sec/chip (12 cams, 23 joints, 72^3 grid)",
        "value": round(poses_per_sec, 3),
        "unit": "poses/s",
        "vs_baseline": vs,
    }))


if __name__ == "__main__":
    # the tunneled remote compiler occasionally fails transiently; one
    # retry keeps a flaky compile from losing the benchmark record
    try:
        sys.exit(main())
    except Exception:
        import traceback

        traceback.print_exc()
        sys.exit(main())
