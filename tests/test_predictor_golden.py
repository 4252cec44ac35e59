"""End-to-end golden tests: our fused predictors vs the reference
JarvisPredictor2D/3D (run on CPU with torch device calls monkeypatched and
torchvision's resize stubbed with F.interpolate, its tensor-path behavior).

These pin the north-star contract: <1 px 2D and <2 mm 3D deviation on the
real example data.
"""

import sys
from unittest.mock import MagicMock

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from jarvis_hybridnet_tpu.config import ProjectManager

PRETRAIN = "/root/reference/pretrained/MonkeyHand"


@pytest.fixture()
def cpu_reference(monkeypatch, reference_dir):
    """Import-ready reference with CUDA and GUI deps neutralized."""
    sys.path.insert(0, str(reference_dir))

    # stub heavyweight/unavailable imports
    tv = MagicMock()

    def _resize(img, size, **kwargs):
        return torch.nn.functional.interpolate(
            img, size=tuple(size), mode="bilinear", align_corners=False,
            antialias=False,
        )

    tv.functional.resize = _resize
    tv.transforms = tv  # `from torchvision import transforms` path
    for mod, val in (("imgaug", MagicMock()), ("imgaug.augmenters", MagicMock()),
                     ("imgaug.augmentables", MagicMock()),
                     ("streamlit", MagicMock()),
                     ("torchvision", tv),
                     ("torchvision.transforms", tv)):
        monkeypatch.setitem(sys.modules, mod, val)

    # strip device kwargs / make .cuda() no-ops
    def _strip(kwargs):
        dev = kwargs.get("device")
        if dev is not None and "cuda" in str(dev):
            kwargs = {k: v for k, v in kwargs.items() if k != "device"}
        return kwargs

    for name in ("tensor", "ones", "zeros", "arange"):
        orig = getattr(torch, name)
        monkeypatch.setattr(
            torch, name,
            lambda *a, _o=orig, **k: _o(*a, **_strip(k)))
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)
    monkeypatch.setattr(torch.nn.Module, "cuda",
                        lambda self, *a, **k: self, raising=False)
    monkeypatch.setattr(torch.cuda, "IntTensor",
                        lambda x: torch.as_tensor(x, dtype=torch.int32),
                        raising=False)
    return reference_dir


@pytest.fixture()
def cfg(reference_dir):
    pm = ProjectManager(parent_dir=str(reference_dir))
    assert pm.load("Example_Project")
    cfg = pm.get_cfg()
    cfg.TPU.REPRO_MODE = "exact"
    cfg.TPU.INFERENCE_DTYPE = "float32"
    return cfg


def _load_frameset(example_dataset, num_cameras):
    import json

    import cv2

    with open(example_dataset / "annotations" / "instances_val.json") as f:
        data = json.load(f)
    imgs = {im["id"]: im for im in data["images"]}
    fs = next(iter(data["framesets"].values()))
    frames = []
    for img_id in fs["frames"][:num_cameras]:
        img = cv2.imread(str(example_dataset / "val" /
                             imgs[img_id]["file_name"]))
        frames.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
    return np.stack(frames).astype(np.float32) / 255.0  # (C, H, W, 3)


def test_predict2d_end_to_end_matches_reference(cpu_reference, cfg,
                                                example_dataset,
                                                golden_cache):
    from jarvis_hybridnet_tpu.prediction.loaders import make_predictor2d

    frames = _load_frameset(example_dataset, 1)  # (1, H, W, 3)

    def torch_oracle():
        from jarvis.prediction.jarvis2D import JarvisPredictor2D

        ref = JarvisPredictor2D(
            cfg,
            weights_center_detect=(
                f"{PRETRAIN}/EfficientTrack_Center-small.pth"),
            weights_keypoint_detect=(
                f"{PRETRAIN}/EfficientTrack_Keypoints-small.pth"),
        )
        with torch.no_grad():
            pts, conf = ref(torch.from_numpy(frames.transpose(0, 3, 1, 2)))
        assert pts is not None
        return pts.numpy(), conf.numpy()

    t_pts, t_conf = golden_cache("predict2d_e2e_monkeyhand_v1", torch_oracle)

    ours = make_predictor2d(
        cfg,
        weights_center_detect=f"{PRETRAIN}/EfficientTrack_Center-small.pth",
        weights_keypoint_detect=f"{PRETRAIN}/EfficientTrack_Keypoints-small.pth",
    )
    j_pts, j_conf, valid = ours(frames)
    assert bool(np.asarray(valid)[0])
    j_pts = np.asarray(j_pts)[0]

    # <1 px deviation on every keypoint (argmax decode is integer-valued,
    # so agreement is typically exact)
    err = np.linalg.norm(j_pts - t_pts, axis=-1)
    assert np.median(err) == 0.0, err
    assert err.max() < 1.0 + 1e-6, err
    assert np.abs(np.asarray(j_conf)[0] - t_conf).max() < 5e-3


def test_predict3d_end_to_end_matches_reference(cpu_reference, cfg,
                                                example_dataset, tmp_path,
                                                golden_cache):
    from jarvis_hybridnet_tpu.prediction.loaders import (
        init_hybridnet_params,
        make_predictor3d,
    )
    from jarvis_hybridnet_tpu.training.checkpoints import (
        load_efficienttrack_params,
        save_torch_checkpoint,
    )
    from jarvis_hybridnet_tpu.utils.calibration import load_camera_rigs

    C = 4
    cfg.HYBRIDNET.NUM_CAMERAS = C
    cfg.HYBRIDNET.ROI_CUBE_SIZE = 64
    cfg.HYBRIDNET.GRID_SPACING = 2
    cfg.DATASET.IMAGE_SIZE = [1280, 1024]

    # shared HybridNet weights: seeded init + real KeypointDetect 2D net
    params = init_hybridnet_params(cfg, seed=7)
    params["effTrack"] = load_efficienttrack_params(
        cfg, "KeypointDetect",
        f"{PRETRAIN}/EfficientTrack_Keypoints-small.pth",
        init_params=params["effTrack"],
    )
    pth = str(tmp_path / "hybrid.pth")
    save_torch_checkpoint(params, pth, "small", kind="hybridnet")

    rigs = load_camera_rigs(str(example_dataset))
    rig = rigs["12Cam_Ralph"]

    class SubRig:
        camera_matrices = rig.camera_matrices[:C]
        intrinsics = rig.intrinsics[:C]
        distortions = rig.distortions[:C]

    frames = _load_frameset(example_dataset, C)  # (C, H, W, 3)

    def torch_oracle():
        from jarvis.prediction.jarvis3D import JarvisPredictor3D

        ref = JarvisPredictor3D(
            cfg,
            weights_center_detect=(
                f"{PRETRAIN}/EfficientTrack_Center-small.pth"),
            weights_hybridnet=pth,
        )
        with torch.no_grad():
            pts, conf = ref(
                torch.from_numpy(frames.transpose(0, 3, 1, 2)),
                torch.from_numpy(SubRig.camera_matrices),
                torch.from_numpy(SubRig.intrinsics),
                torch.from_numpy(SubRig.distortions),
            )
        assert pts is not None
        return pts.numpy(), conf.numpy()

    # the .pth fed to the oracle is deterministic (seed-7 init + fixed
    # pretrained 2D weights), so the cache key needs no input hash
    t_pts, t_conf = golden_cache("predict3d_e2e_seed7_4cam_v1", torch_oracle)
    t_pts = t_pts[0]

    ours = make_predictor3d(
        cfg, SubRig,
        weights_center_detect=f"{PRETRAIN}/EfficientTrack_Center-small.pth",
        weights_hybridnet=pth,
    )
    j_pts, j_conf, valid = ours(frames[None])
    assert bool(np.asarray(valid)[0])
    j_pts = np.asarray(j_pts)[0]

    err = np.linalg.norm(j_pts - t_pts, axis=-1)
    assert err.max() < 2.0, (err.max(), err)  # north-star: <2 mm
    assert np.abs(np.asarray(j_conf)[0] - t_conf[0]).max() < 0.02


@pytest.mark.slow
def test_predict3d_twophase_matches_fused(cfg, example_dataset, tmp_path):
    """The split streaming cascade (lowres CenterDetect + host crops,
    predictor3d.build_predict3d_twophase) must agree with the fused
    predictor within the 2 mm budget on real data — lowres center
    detection only translates the crop window."""
    import cv2

    from jarvis_hybridnet_tpu.prediction.loaders import (
        init_hybridnet_params,
        load_efficienttrack_params,
        make_predictor3d,
        make_predictor3d_twophase,
    )
    from jarvis_hybridnet_tpu.training.checkpoints import (
        save_checkpoint,
    )
    from jarvis_hybridnet_tpu.utils.calibration import load_camera_rigs

    C = 4
    cfg.HYBRIDNET.NUM_CAMERAS = C
    cfg.HYBRIDNET.ROI_CUBE_SIZE = 64
    cfg.HYBRIDNET.GRID_SPACING = 2
    cfg.DATASET.IMAGE_SIZE = [1280, 1024]

    from jarvis_hybridnet_tpu.prediction.loaders import (
        init_efficienttrack_params,
    )

    params = init_hybridnet_params(cfg, seed=7)
    params["effTrack"] = load_efficienttrack_params(
        cfg, "KeypointDetect",
        f"{PRETRAIN}/EfficientTrack_Keypoints-small.pth",
        init_params=params["effTrack"],
    )
    ckpt = str(tmp_path / "hybrid.ckpt")
    save_checkpoint(params, ckpt)

    rig = load_camera_rigs(str(example_dataset))["12Cam_Ralph"]

    class SubRig:
        camera_matrices = rig.camera_matrices[:C]
        intrinsics = rig.intrinsics[:C]
        distortions = rig.distortions[:C]

    frames = _load_frameset(example_dataset, C)  # (C, H, W, 3) in [0,1]
    full = (frames * 255.0 + 0.5).astype(np.uint8)[None]  # (1, C, H, W, 3)
    factor = 4
    low = np.stack([
        cv2.resize(full[0, c], (full.shape[3] // factor,
                                full.shape[2] // factor),
                   interpolation=cv2.INTER_AREA)
        for c in range(C)
    ])[None]

    center_w = f"{PRETRAIN}/EfficientTrack_Center-small.pth"
    fused = make_predictor3d(cfg, SubRig, center_w, ckpt)
    pts_f, conf_f, valid_f = fused(full)
    assert bool(np.asarray(valid_f)[0])

    pa, pb, crop_fn = make_predictor3d_twophase(
        cfg, SubRig, (full.shape[3], full.shape[2]), center_w, ckpt,
        lowres_factor=factor,
    )
    cx, cy, c3d, valid = pa(low)
    assert bool(np.asarray(valid)[0])
    crops = crop_fn(full, np.asarray(cx), np.asarray(cy))
    pts_t, conf_t = pb(crops, cx, cy, c3d)

    # The pose rigidly tracks the detected center3D: the voxel volume is
    # built crop-relative, so per-camera projection shifts cancel and
    # points = center3D + f(crop content) — in the reference too. Lowres
    # center detection therefore shifts the WHOLE pose by its (few-mm,
    # argmax-quantization-order) center delta; what must be tiny is the
    # residual NON-rigid deviation, which proves the two cascades compute
    # the same crop-relative pose.
    delta = np.asarray(pts_f)[0] - np.asarray(pts_t)[0]  # (J, 3)
    rigid = np.median(delta, axis=0)
    assert float(np.linalg.norm(rigid)) < 5.0, rigid
    residual = np.linalg.norm(delta - rigid, axis=-1)
    assert float(residual.max()) < 0.25, residual
