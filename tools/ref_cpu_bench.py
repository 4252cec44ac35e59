"""Same-host CPU benchmark: reference JarvisPredictor3D (torch) vs our
fused predict3D cascade (JAX CPU backend).

The reference publishes no performance numbers and this environment has no
CUDA GPU (BASELINE.md), so the one comparison that can be *measured* here
is CPU-vs-CPU on identical hardware, identical weights (the fidelity
checkpoint exported to a reference-loadable .pth) and an identical real
12-camera frameset. The reference predictor is run unmodified except for
the CUDA-neutralizing patches the golden tests already use
(tests/test_predictor_golden.py) — .cuda() no-ops and device='cuda'
kwargs stripped; torchvision.resize is stubbed with F.interpolate, the
same tensor-path behavior.

Usage:  python tools/ref_cpu_bench.py [--iters N]
Prints one JSON line per measurement.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE = "/root/reference"
PRETRAIN = f"{REFERENCE}/pretrained/MonkeyHand"


def _patch_reference_cuda():
    """CUDA-free reference import (mirrors tests/test_predictor_golden.py)."""
    from unittest.mock import MagicMock

    import torch

    sys.path.insert(0, REFERENCE)

    tv = MagicMock()

    def _resize(img, size, **kwargs):
        return torch.nn.functional.interpolate(
            img, size=tuple(size), mode="bilinear", align_corners=False,
            antialias=False,
        )

    tv.functional.resize = _resize
    tv.transforms = tv
    for mod in ("imgaug", "imgaug.augmenters", "imgaug.augmentables",
                "streamlit"):
        sys.modules[mod] = MagicMock()
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tv

    def _strip(kwargs):
        dev = kwargs.get("device")
        if dev is not None and "cuda" in str(dev):
            kwargs = {k: v for k, v in kwargs.items() if k != "device"}
        return kwargs

    for name in ("tensor", "ones", "zeros", "arange"):
        orig = getattr(torch, name)
        setattr(torch, name,
                lambda *a, _o=orig, **k: _o(*a, **_strip(k)))
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.cuda.IntTensor = lambda x: torch.as_tensor(x, dtype=torch.int32)


def _load_frameset(num_cameras: int) -> np.ndarray:
    """(C, H, W, 3) float32/255 real frames of one val frameset."""
    import cv2

    ds = f"{REFERENCE}/datasets/Example_Dataset"
    with open(f"{ds}/annotations/instances_val.json") as f:
        data = json.load(f)
    imgs = {im["id"]: im for im in data["images"]}
    fs = next(iter(data["framesets"].values()))
    frames = []
    for img_id in fs["frames"][:num_cameras]:
        img = cv2.imread(f"{ds}/val/{imgs[img_id]['file_name']}")
        frames.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
    return np.stack(frames).astype(np.float32) / 255.0


def _emit(name, poses_per_sec, extra=None):
    rec = {"metric": name, "value": round(poses_per_sec, 3),
           "unit": "poses/s"}
    rec.update(extra or {})
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import torch

    torch.set_num_threads(os.cpu_count() or 1)

    from jarvis_hybridnet_tpu.config import ProjectManager
    from jarvis_hybridnet_tpu.prediction.loaders import (
        init_hybridnet_params,
        make_predictor3d,
    )
    from jarvis_hybridnet_tpu.training.checkpoints import (
        load_efficienttrack_params,
        save_checkpoint,
        save_torch_checkpoint,
    )
    from jarvis_hybridnet_tpu.utils.calibration import load_camera_rigs

    pm = ProjectManager(parent_dir=REFERENCE)
    assert pm.load("Example_Project")
    cfg = pm.get_cfg()
    cfg.DATASET.IMAGE_SIZE = [1280, 1024]
    cfg.TPU.INFERENCE_DTYPE = "float32"  # torch CPU is f32; compare like

    # identical weights both sides: seed-7 V2V + real KeypointDetect-small
    # (the bench fidelity construction), exported to a reference .pth
    params = init_hybridnet_params(cfg, seed=7)
    params["effTrack"] = load_efficienttrack_params(
        cfg, "KeypointDetect",
        f"{PRETRAIN}/EfficientTrack_Keypoints-small.pth",
        init_params=params["effTrack"],
    )
    ckpt = "/tmp/ref_cpu_bench/hybrid.ckpt"
    pth = "/tmp/ref_cpu_bench/hybrid.pth"
    os.makedirs("/tmp/ref_cpu_bench", exist_ok=True)
    save_checkpoint(params, ckpt)
    save_torch_checkpoint(params, pth, "small", kind="hybridnet")

    C = int(cfg.HYBRIDNET.NUM_CAMERAS)
    frames = _load_frameset(C)
    rig = load_camera_rigs(f"{REFERENCE}/datasets/Example_Dataset")[
        "12Cam_Ralph"]

    # --- reference (torch CPU), one frameset per forward (its design) ---
    _patch_reference_cuda()
    from jarvis.prediction.jarvis3D import JarvisPredictor3D

    ref = JarvisPredictor3D(
        cfg,
        weights_center_detect=f"{PRETRAIN}/EfficientTrack_Center-small.pth",
        weights_hybridnet=pth,
    )
    t_imgs = torch.from_numpy(frames.transpose(0, 3, 1, 2))
    t_args = (torch.from_numpy(rig.camera_matrices),
              torch.from_numpy(rig.intrinsics),
              torch.from_numpy(rig.distortions))
    with torch.no_grad():
        pts, _ = ref(t_imgs, *t_args)  # warmup
        assert pts is not None, "reference detection gate failed"
        start = time.perf_counter()
        for _ in range(args.iters):
            pts, _ = ref(t_imgs, *t_args)
        ref_rate = args.iters / (time.perf_counter() - start)
    _emit("reference JarvisPredictor3D (torch, CPU, f32, 1 frameset/call)",
          ref_rate)

    # --- ours (JAX CPU), production numerics and exact parity mode ---
    uint8 = (frames * 255.0).astype(np.uint8)

    def run_ours(mode, T):
        cfg.TPU.REPRO_MODE = mode
        predictor = make_predictor3d(
            cfg, rig,
            weights_center_detect=(
                f"{PRETRAIN}/EfficientTrack_Center-small.pth"),
            weights_hybridnet=ckpt,
        )
        batch = np.broadcast_to(uint8, (T, C, 1024, 1280, 3)).copy()
        out = predictor(batch)
        np.asarray(out[0])  # warmup + sync
        start = time.perf_counter()
        for _ in range(args.iters):
            out = predictor(batch)
        np.asarray(out[0])
        rate = args.iters * T / (time.perf_counter() - start)
        return _emit(
            f"ours predict3D (JAX CPU, f32, {mode}, T={T})", rate,
            {"vs_reference_cpu": round(rate / ref_rate, 2)})

    run_ours("exact", 1)
    run_ours("quarter_fused", 1)
    run_ours("quarter_fused", 8)


if __name__ == "__main__":
    main()
