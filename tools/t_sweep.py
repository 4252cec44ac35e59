"""Frameset-batch (T) sweep of the fused predict3D cascade on the live
chip — pipelined throughput and synchronous p50 latency per T, at the
production numerics (quarter_fused + bf16 + MXU resize). Informs the
TPU.FRAME_BATCH default (the round-1 sweep predates the quarter gather
and the MXU resize)."""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import cv2

    from jarvis_hybridnet_tpu.config import ProjectManager
    from jarvis_hybridnet_tpu.prediction.loaders import make_predictor3d
    from jarvis_hybridnet_tpu.utils.calibration import load_camera_rigs
    from bench import _fidelity_checkpoint

    pm = ProjectManager(parent_dir="/root/reference")
    assert pm.load("Example_Project")
    cfg = pm.get_cfg()
    cfg.DATASET.IMAGE_SIZE = [1280, 1024]

    rig = load_camera_rigs("/root/reference/datasets/Example_Dataset")[
        "12Cam_Ralph"]
    ckpt = _fidelity_checkpoint(cfg)
    center_w = ("/root/reference/pretrained/MonkeyHand/"
                "EfficientTrack_Center-small.pth")
    predictor = make_predictor3d(cfg, rig, center_w, ckpt)

    frame = cv2.imread(
        "/root/reference/datasets/Example_Dataset/val/12Cam_Ralph/"
        "Ralph_21072021/Sphere/Camera_B/Frame_58616.jpg")[:, :, ::-1]
    C, H, W = 12, 1024, 1280

    results = []
    for T in (int(t) for t in
              os.environ.get("JARVIS_SWEEP_T", "2,4,8,12,16").split(",")):
        a = jax.device_put(
            np.broadcast_to(frame, (T, C, H, W, 3)).astype(np.uint8).copy())
        b = jax.device_put(np.roll(
            np.broadcast_to(frame, (T, C, H, W, 3)).astype(np.uint8),
            1, axis=2).copy())
        t0 = time.perf_counter()
        _ = float(predictor(a)[0][0, 0, 0])
        compile_s = time.perf_counter() - t0
        # pipelined throughput
        iters = max(6, int(160 / T))
        t0 = time.perf_counter()
        for i in range(iters):
            out = predictor(a if i % 2 == 0 else b)
        _ = float(out[0][0, 0, 0])
        pps = iters * T / (time.perf_counter() - t0)
        # synchronous p50 latency
        lats = []
        for i in range(7):
            t0 = time.perf_counter()
            _ = float(predictor(a if i % 2 == 0 else b)[0][0, 0, 0])
            lats.append(time.perf_counter() - t0)
        p50 = sorted(lats)[len(lats) // 2] * 1000.0
        results.append({"T": T, "poses_per_sec": round(pps, 1),
                        "p50_ms": round(p50, 1),
                        "compile_s": round(compile_s, 1)})
        print(f"T={T:2d}: {pps:7.1f} poses/s pipelined, p50 {p50:7.1f} ms "
              f"(compile {compile_s:.0f}s)", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
