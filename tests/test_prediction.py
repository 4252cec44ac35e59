"""Prediction-path tests: resize numerics, fused 2D cascade on real frames,
and the geometric 3D voxel pipeline with real pretrained heatmaps."""

import os

import numpy as np
import pytest

from jarvis_hybridnet_tpu.config import ProjectManager

PRETRAIN_DIR = "/root/reference/pretrained/MonkeyHand"


@pytest.fixture(scope="module")
def cfg(reference_dir):
    pm = ProjectManager(parent_dir=str(reference_dir))
    assert pm.load("Example_Project")
    c = pm.get_cfg()
    # f32 on the CPU test backend: bf16 convs are emulated (slower) there
    # and these tests assert px/mm-level accuracy, not production numerics
    # (the bf16 path is exercised on-chip by bench.py --fidelity and on the
    # virtual mesh by test_parallel.py::test_sharded_predict3d)
    c.TPU.INFERENCE_DTYPE = "float32"
    return c


def test_resize_matches_torch_no_antialias():
    torch = pytest.importorskip("torch")
    from jarvis_hybridnet_tpu.ops.image import resize_bilinear

    rng = np.random.default_rng(0)
    img = rng.random((2, 1024, 1280, 3), dtype=np.float32)
    ours = np.asarray(resize_bilinear(img, 256, 256))
    with torch.no_grad():
        theirs = torch.nn.functional.interpolate(
            torch.from_numpy(img.transpose(0, 3, 1, 2)),
            size=(256, 256), mode="bilinear", align_corners=False,
            antialias=False,
        ).numpy().transpose(0, 2, 3, 1)
    assert np.abs(ours - theirs).max() < 1e-5


def test_predict2d_on_real_frames(cfg):
    """Full fused 2D cascade with the bundled pretrained weights must land
    keypoints near the GT annotations."""
    from jarvis_hybridnet_tpu.dataset.base import BaseDataset
    from jarvis_hybridnet_tpu.prediction.predictor2d import build_predict2d
    from jarvis_hybridnet_tpu.prediction.loaders import (
        init_efficienttrack_params,
    )
    from jarvis_hybridnet_tpu.training.checkpoints import (
        load_efficienttrack_params,
    )

    center = load_efficienttrack_params(
        cfg, "CenterDetect",
        f"{PRETRAIN_DIR}/EfficientTrack_Center-small.pth",
        init_params=init_efficienttrack_params(cfg, "CenterDetect",
                                               abstract=True),
    )
    keypoint = load_efficienttrack_params(
        cfg, "KeypointDetect",
        f"{PRETRAIN_DIR}/EfficientTrack_Keypoints-small.pth",
        init_params=init_efficienttrack_params(cfg, "KeypointDetect",
                                                abstract=True),
    )
    predict = build_predict2d(cfg, center, keypoint)

    ds = BaseDataset(cfg, cfg.DATASET.DATASET_2D, set="val")
    imgs, gts = [], []
    for i in range(0, 2):
        img = ds._load_image(i)
        _, kps = ds._load_annotations(i)
        imgs.append(img)
        gts.append(kps.reshape(-1, 3))
    imgs = np.stack(imgs)

    points, conf, valid = predict(imgs)
    points = np.asarray(points)
    conf = np.asarray(conf)
    assert np.asarray(valid).all()

    errs = []
    for t in range(len(gts)):
        for j in range(gts[t].shape[0]):
            if gts[t][j][0] != 0 or gts[t][j][1] != 0:
                if conf[t][j] > 0.3:
                    errs.append(
                        np.linalg.norm(points[t, j] - gts[t][j][:2])
                    )
    errs = np.array(errs)
    assert len(errs) > 20
    assert np.median(errs) < 6.0, np.median(errs)


@pytest.fixture(scope="module")
def real_heatmaps(cfg):
    """One val frameset + its padded pretrained KeypointDetect heatmaps,
    shared by the repro-layer accuracy tests."""
    import jax

    from jarvis_hybridnet_tpu.dataset.dataset3d import Dataset3D
    from jarvis_hybridnet_tpu.models.efficienttrack import (
        EfficientTrackBackbone,
    )
    from jarvis_hybridnet_tpu.models.weights_io import (
        efficienttrack_params_from_torch,
        load_torch_state_dict,
    )

    ds = Dataset3D(cfg, set="val")
    s = ds[0]
    J = int(cfg.KEYPOINTDETECT.NUM_JOINTS)
    sd = load_torch_state_dict(
        f"{PRETRAIN_DIR}/EfficientTrack_Keypoints-small.pth"
    )
    params = efficienttrack_params_from_torch(sd, "small")
    model = EfficientTrackBackbone(model_size="small", output_channels=J)
    _, hm = jax.jit(model.apply)({"params": params}, s["imgs"])
    hm = np.asarray(hm).transpose(0, 3, 1, 2)  # (C, J, h, h)
    hm = np.pad(hm, ((0, 0), (0, 0), (1, 1), (1, 1)))
    return s, hm


def test_voxel_volume_peaks_at_gt(cfg, real_heatmaps):
    """Real pretrained 2D heatmaps reprojected into the voxel grid must
    peak near the triangulated GT 3D keypoints — validates the whole
    geometric chain (calibration, crops, clamping, index upsampling,
    gather) with real data."""
    from jarvis_hybridnet_tpu.models.repro import reprojection_layer

    s, hm = real_heatmaps
    J = int(cfg.KEYPOINTDETECT.NUM_JOINTS)
    G = int(cfg.HYBRIDNET.ROI_CUBE_SIZE / cfg.HYBRIDNET.GRID_SPACING)

    vol = np.asarray(
        reprojection_layer(
            hm[None],
            s["center3d"][None],
            s["center_hm"][None],
            s["camera_matrices"][None],
            s["intrinsics"][None],
            s["distortions"][None],
            G,
            float(cfg.HYBRIDNET.GRID_SPACING),
        )
    )[0].transpose(3, 0, 1, 2)  # (J, G, G, G)

    kp = s["keypoints3D"]
    spacing = float(cfg.HYBRIDNET.GRID_SPACING)
    cube = float(cfg.HYBRIDNET.ROI_CUBE_SIZE)
    errs = []
    for j in range(J):
        if not np.any(kp[j] != 0):
            continue
        peak = np.array(
            np.unravel_index(vol[j].argmax(), vol[j].shape), np.float64
        )
        world = peak * spacing - cube / 2.0 + s["center3d"]
        errs.append(np.linalg.norm(world - kp[j]))
    errs = np.array(errs)
    assert len(errs) >= 15
    # voxel quantization alone is ~2 mm at GRID_SPACING=2
    assert np.median(errs) < 6.0, (np.median(errs), errs)


def test_half_repro_mode_accuracy(cfg, real_heatmaps):
    """'half' repro mode (8x fewer gathers) must produce volumes whose
    soft-argmax decode moves < 0.5 mm vs the exact reference numerics, on
    real pretrained heatmaps."""
    from jarvis_hybridnet_tpu.models.repro import reprojection_layer

    s, hm = real_heatmaps
    J = int(cfg.KEYPOINTDETECT.NUM_JOINTS)
    G = int(cfg.HYBRIDNET.ROI_CUBE_SIZE / cfg.HYBRIDNET.GRID_SPACING)
    spacing = float(cfg.HYBRIDNET.GRID_SPACING)

    args = (
        hm[None], s["center3d"][None], s["center_hm"][None],
        s["camera_matrices"][None], s["intrinsics"][None],
        s["distortions"][None], G, spacing,
    )
    vol_exact = np.asarray(reprojection_layer(*args, mode="exact"))[0]
    vol_half = np.asarray(reprojection_layer(*args, mode="half"))[0]
    assert vol_exact.shape == vol_half.shape == (G, G, G, J)

    def decode(vol):
        # soft-argmax over positive part (volumes are heatmap means >= 0)
        v = np.maximum(vol, 0) + 1e-6
        coords = np.arange(G)
        norm = v.sum(axis=(0, 1, 2))
        x = np.einsum("xyzj,x->j", v, coords) / norm
        y = np.einsum("xyzj,y->j", v, coords) / norm
        z = np.einsum("xyzj,z->j", v, coords) / norm
        return np.stack([x, y, z], -1) * spacing  # mm

    shift = np.linalg.norm(decode(vol_exact) - decode(vol_half), axis=-1)
    assert shift.max() < 0.5, shift

    # 'quarter_fused' (64x fewer gathers than exact) must stay inside the
    # 2 mm budget on the same decode; its even half-grid sites coincide
    # with the quarter-grid gathers by construction.
    vol_quarter = np.asarray(
        reprojection_layer(*args, mode="quarter_fused"))[0]
    g2 = G // 2
    assert vol_quarter.shape == (g2, g2, g2, J)
    vol_half_native = np.asarray(
        reprojection_layer(*args, mode="half_fused"))[0]
    np.testing.assert_array_equal(
        vol_quarter[::2, ::2, ::2], vol_half_native[::2, ::2, ::2]
    )

    def decode_half(vol):
        v = np.maximum(vol, 0) + 1e-6
        coords = np.arange(g2)
        norm = v.sum(axis=(0, 1, 2))
        x = np.einsum("xyzj,x->j", v, coords) / norm
        y = np.einsum("xyzj,y->j", v, coords) / norm
        z = np.einsum("xyzj,z->j", v, coords) / norm
        return np.stack([x, y, z], -1) * spacing * 2.0  # mm

    qshift = np.linalg.norm(
        decode_half(vol_quarter) - decode_half(vol_half_native), axis=-1)
    assert qshift.max() < 2.0, qshift


def test_plan_inference_devices():
    """TPU.MESH_DATA_AXIS must cap the data axis even when an infeasible
    TPU.SHARD_CAMERAS is rejected (review r3 finding: the camera factor
    leaked into the data axis and broke the MESH_DATA_AXIS=1 ->
    single-device AOT contract)."""
    from jarvis_hybridnet_tpu.parallel.mesh import plan_inference_devices

    devs = list(range(8))  # stand-ins for jax devices
    # infeasible camera sharding (12 % 5 != 0) with a cap of 1: must
    # stay single-device, not keep 5 devices on the data axis
    d, n_cam = plan_inference_devices(devs, n_data_cap=1, n_cam=5,
                                      num_cameras=12)
    assert len(d) == 1 and n_cam == 1
    # feasible camera sharding with a cap: cap * n_cam devices
    d, n_cam = plan_inference_devices(devs, n_data_cap=2, n_cam=2,
                                      num_cameras=12)
    assert len(d) == 4 and n_cam == 2
    # uncapped, feasible
    d, n_cam = plan_inference_devices(devs, n_data_cap=-1, n_cam=2,
                                      num_cameras=12)
    assert len(d) == 8 and n_cam == 2
    # uncapped, device count not divisible by n_cam: drop camera sharding
    d, n_cam = plan_inference_devices(devs[:6], n_data_cap=-1, n_cam=4,
                                      num_cameras=12)
    assert len(d) == 6 and n_cam == 1
    # cap larger than the host: everything stays on the data axis
    d, n_cam = plan_inference_devices(devs, n_data_cap=16, n_cam=1,
                                      num_cameras=12)
    assert len(d) == 8 and n_cam == 1


def test_compile_cache_follows_project_switch(tmp_path, monkeypatch):
    """Switching projects in one process must re-point the compilation
    cache to the new project's dir (review r3 finding) — while still
    respecting an externally configured dir."""
    import jax

    from jarvis_hybridnet_tpu.prediction import compile_cache

    class Cfg:
        def __init__(self, parent, name):
            self.PARENT_DIR = str(parent)
            self.PROJECT_NAME = name

    prev = jax.config.jax_compilation_cache_dir
    monkeypatch.setattr(compile_cache, "_configured_dir", None)
    try:
        # external setting is respected
        jax.config.update("jax_compilation_cache_dir", str(tmp_path / "ext"))
        compile_cache.configure(Cfg(tmp_path, "A"), "new")
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "ext")

        # from unset: configure project A, then switch to B
        jax.config.update("jax_compilation_cache_dir", None)
        compile_cache.configure(Cfg(tmp_path, "A"), "new")
        a_dir = os.path.join(str(tmp_path), "projects", "A",
                             "compiled-models")
        assert jax.config.jax_compilation_cache_dir == a_dir
        compile_cache.configure(Cfg(tmp_path, "B"), "new")
        b_dir = os.path.join(str(tmp_path), "projects", "B",
                             "compiled-models")
        assert jax.config.jax_compilation_cache_dir == b_dir
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
