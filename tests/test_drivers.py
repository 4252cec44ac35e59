"""End-to-end driver tests: video -> prediction CSV through the public
predict2D/predict3D entry points, on a temp project wired to the real
Example_Dataset fixture."""

import csv
import json
import os
import shutil

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

PRETRAIN_DIR = "/root/reference/pretrained/MonkeyHand"


@pytest.fixture(scope="module")
def project_dir(tmp_path_factory, reference_dir):
    root = tmp_path_factory.mktemp("jarvis_project")
    (root / "datasets").mkdir()
    os.symlink(
        str(reference_dir / "datasets" / "Example_Dataset"),
        str(root / "datasets" / "Example_Dataset"),
    )
    proj = root / "projects" / "TestProj"
    proj.mkdir(parents=True)
    shutil.copyfile(
        str(reference_dir / "projects" / "Example_Project" / "config.yaml"),
        str(proj / "config.yaml"),
    )
    # small frame batch: the 4-frame test videos don't need the production
    # T=8 pipelining, and the T=2 cascade compiles several times faster
    with open(proj / "config.yaml", "a") as f:
        f.write("\nTPU:\n  FRAME_BATCH: 2\n")
    return root


@pytest.fixture(scope="module")
def recordings(project_dir, reference_dir):
    """Per-camera MJPG videos built from one real frameset (4 frames each)."""
    ds_dir = reference_dir / "datasets" / "Example_Dataset"
    with open(ds_dir / "annotations" / "instances_val.json") as f:
        data = json.load(f)
    imgs = {im["id"]: im for im in data["images"]}
    key, fs = next(iter(data["framesets"].items()))
    rec_dir = project_dir / "recording"
    rec_dir.mkdir()
    first_frame = {}
    for img_id in fs["frames"]:
        file_name = imgs[img_id]["file_name"]
        camera = file_name.split("/")[-2]
        frame = cv2.imread(str(ds_dir / "val" / file_name))
        first_frame[camera] = frame
        w = cv2.VideoWriter(
            str(rec_dir / f"{camera}.avi"),
            cv2.VideoWriter_fourcc(*"MJPG"), 30,
            (frame.shape[1], frame.shape[0]),
        )
        for _ in range(4):
            w.write(frame)
        w.release()
    return rec_dir, first_frame


def test_predict2d_driver(project_dir, recordings, monkeypatch):
    from jarvis_hybridnet_tpu.prediction.predict2d import predict2D
    from jarvis_hybridnet_tpu.utils.param_classes import Predict2DParams

    monkeypatch.setenv("JARVIS_PARENT_DIR", str(project_dir))
    rec_dir, frames = recordings
    video = str(rec_dir / "Camera_B.avi")

    out = predict2D(Predict2DParams(
        project_name="TestProj",
        recording_path=video,
        weights_center_detect=f"{PRETRAIN_DIR}/EfficientTrack_Center-small.pth",
        weights_keypoint_detect=(
            f"{PRETRAIN_DIR}/EfficientTrack_Keypoints-small.pth"),
        trt_mode="new",
    ))
    assert out is not None
    assert list((project_dir / "projects" / "TestProj" /
                 "compiled-models").glob("predict2D_*.jaxexp"))
    assert os.path.isfile(os.path.join(out, "info.yaml"))
    with open(os.path.join(out, "data2D.csv")) as f:
        rows = list(csv.reader(f))
    # 2 header rows + 4 frames
    assert len(rows) == 6
    assert rows[0][0] == "Pinky_T" and rows[1][:3] == ["x", "y", "confidence"]
    assert len(rows[2]) == 23 * 3
    vals = np.array(rows[2], dtype=np.float64)
    assert np.isfinite(vals).all()
    # the 4 frames share content (modulo MJPG re-encode noise) -> keypoints
    # must agree closely across frames
    all_vals = np.array(rows[2:], dtype=np.float64).reshape(4, 23, 3)
    spread = np.abs(all_vals[:, :, :2] - all_vals[0:1, :, :2])
    conf = all_vals[:, :, 2]
    assert np.median(spread[conf[..., None].repeat(2, -1) > 0.3]) <= 2.0


@pytest.fixture(scope="module")
def project3d_dir(project_dir):
    """Second project with a reduced 3D config: the 3D driver test checks
    CSV plumbing + AOT artifact round-trip, not accuracy — CenterDetect
    keeps production settings (the real-weights detection gate must pass),
    but the 3D stage shrinks (128 px crops, 64 mm cube -> 32^3 grid) and
    runs f32 (bf16 convs are emulated, slower, on the CPU test backend;
    the bf16 path is covered by test_parallel.py::test_sharded_predict3d)."""
    import yaml

    src = project_dir / "projects" / "TestProj" / "config.yaml"
    with open(src) as f:
        cfg = yaml.safe_load(f)
    cfg["KEYPOINTDETECT"]["BOUNDING_BOX_SIZE"] = 128
    cfg["HYBRIDNET"]["ROI_CUBE_SIZE"] = 64
    cfg["HYBRIDNET"]["GRID_SPACING"] = 2
    cfg["TPU"] = {"FRAME_BATCH": 2, "INFERENCE_DTYPE": "float32",
                  # pin single-device: T stays 2 (not padded to the
                  # 8-dev test mesh) and the AOT reload path actually
                  # engages on the 'previous' pass
                  "MESH_DATA_AXIS": 1}
    proj = project_dir / "projects" / "TestProj3D"
    proj.mkdir()
    with open(proj / "config.yaml", "w") as f:
        yaml.safe_dump(cfg, f)
    return project_dir


def test_predict3d_driver(project3d_dir, recordings, monkeypatch):
    from jarvis_hybridnet_tpu.prediction.predict3d import predict3D
    from jarvis_hybridnet_tpu.utils.param_classes import Predict3DParams

    project_dir = project3d_dir
    monkeypatch.setenv("JARVIS_PARENT_DIR", str(project_dir))
    rec_dir, _ = recordings

    def run(trt_mode):
        return predict3D(Predict3DParams(
            project_name="TestProj3D",
            recording_path=str(rec_dir),
            weights_center_detect=(
                f"{PRETRAIN_DIR}/EfficientTrack_Center-small.pth"),
            weights_hybridnet=None,  # no pretrained 3D zoo entry exists
            number_frames=2,  # one T=2 batch per run (plumbing, not perf)
            trt_mode=trt_mode,
        ))

    out = run("new")  # also exports the AOT artifact
    assert out is not None
    with open(os.path.join(out, "data3D.csv")) as f:
        rows = list(csv.reader(f))
    assert len(rows) == 2 + 2  # header + number_frames
    assert rows[1][:4] == ["x", "y", "z", "confidence"]
    assert len(rows[2]) == 23 * 4
    vals = np.array(rows[2], dtype=np.float64)
    # center-detect gate passes on real frames -> non-NaN rows
    assert np.isfinite(vals).all()

    # artifact written; 'previous' reloads it and reproduces the CSV
    compiled = (project_dir / "projects" / "TestProj3D" / "compiled-models")
    arts = list(compiled.glob("predict3D_*.jaxexp"))
    assert len(arts) == 1 and arts[0].stat().st_size > 1000
    out2 = run("previous")
    with open(os.path.join(out2, "data3D.csv")) as f:
        rows2 = list(csv.reader(f))
    vals2 = np.array(rows2[2], dtype=np.float64)
    np.testing.assert_allclose(vals2, vals, rtol=1e-4, atol=1e-3)


def test_predict3d_twophase_driver(tmp_path, reference_dir, monkeypatch):
    """TPU.TWO_PHASE=true drives the split-cascade streaming loop
    end-to-end (native lowres ring -> phase A -> host crops -> phase B ->
    CSV) on a tiny synthetic project."""
    import yaml

    native = pytest.importorskip("jarvis_hybridnet_tpu.native")
    if not native.video_available():
        pytest.skip("native video decode unavailable")

    (tmp_path / "datasets").mkdir()
    os.symlink(str(reference_dir / "datasets" / "Example_Dataset"),
               str(tmp_path / "datasets" / "Example_Dataset"))
    proj = tmp_path / "projects" / "TinyProj"
    proj.mkdir(parents=True)
    with open(reference_dir / "projects" / "Example_Project" /
              "config.yaml") as f:
        cfg = yaml.safe_load(f)
    cfg["CENTERDETECT"]["IMAGE_SIZE"] = 64
    cfg["KEYPOINTDETECT"]["BOUNDING_BOX_SIZE"] = 64
    cfg["HYBRIDNET"]["ROI_CUBE_SIZE"] = 16
    cfg["HYBRIDNET"]["GRID_SPACING"] = 2
    cfg["TPU"] = {"FRAME_BATCH": 2, "TWO_PHASE": True,
                  "LOWRES_FACTOR": 4}
    with open(proj / "config.yaml", "w") as f:
        yaml.safe_dump(cfg, f)

    rig_dir = (reference_dir / "datasets" / "Example_Dataset" /
               "calib_params" / "12Cam_Ralph")
    cameras = [os.path.splitext(f)[0] for f in os.listdir(rig_dir)]
    rec = tmp_path / "recording"
    rec.mkdir()
    n_frames = 5
    rng = np.random.default_rng(0)
    for cam in cameras:
        w = cv2.VideoWriter(str(rec / f"{cam}.avi"),
                            cv2.VideoWriter_fourcc(*"MJPG"), 30, (256, 192))
        for _ in range(n_frames):
            w.write(rng.integers(0, 255, (192, 256, 3), np.uint8))
        w.release()

    monkeypatch.setenv("JARVIS_PARENT_DIR", str(tmp_path))
    from jarvis_hybridnet_tpu.prediction.predict3d import predict3D
    from jarvis_hybridnet_tpu.utils.param_classes import Predict3DParams

    out = predict3D(Predict3DParams(
        project_name="TinyProj", recording_path=str(rec),
        weights_center_detect=None, weights_hybridnet=None,
    ))
    assert out is not None
    with open(os.path.join(out, "data3D.csv")) as f:
        rows = list(csv.reader(f))
    # 2 header rows + one row per frame (values may be NaN: random
    # weights rarely pass the detection gate)
    assert len(rows) == 2 + n_frames
    assert len(rows[2]) == 23 * 4
