"""CLI surface tests: project creation with dataset auto-config, the
predict -> visualize chain via 'latest' resolution, and headless analysis
plots."""

import csv
import json
import os
import shutil

import numpy as np
import pytest
from click.testing import CliRunner

cv2 = pytest.importorskip("cv2")

from jarvis_hybridnet_tpu.ui.cli import cli

PRETRAIN_DIR = "/root/reference/pretrained/MonkeyHand"


@pytest.fixture(scope="module")
def parent_dir(tmp_path_factory, reference_dir):
    root = tmp_path_factory.mktemp("cli_parent")
    (root / "datasets").mkdir()
    os.symlink(
        str(reference_dir / "datasets" / "Example_Dataset"),
        str(root / "datasets" / "Example_Dataset"),
    )
    return root


def test_create_project(parent_dir, monkeypatch):
    monkeypatch.setenv("JARVIS_PARENT_DIR", str(parent_dir))
    result = CliRunner().invoke(
        cli,
        ["create-project", "--dataset3d", "Example_Dataset", "CliProj"],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    cfg_path = parent_dir / "projects" / "CliProj" / "config.yaml"
    assert cfg_path.is_file()
    import yaml

    cfg = yaml.safe_load(cfg_path.read_text())
    # dataset-derived auto-config (suggestions from real data)
    assert cfg["KEYPOINTDETECT"]["NUM_JOINTS"] == 23
    assert cfg["KEYPOINTDETECT"]["BOUNDING_BOX_SIZE"] % 64 == 0
    assert cfg["HYBRIDNET"]["NUM_CAMERAS"] == 12
    assert cfg["HYBRIDNET"]["ROI_CUBE_SIZE"] % (
        4 * cfg["HYBRIDNET"]["GRID_SPACING"]) == 0
    assert cfg["KEYPOINT_NAMES"][0] == "Pinky_T"
    # matches the dataset JSON's skeleton definition
    assert len(cfg["SKELETON"]) >= 20
    # models/logs tree exists
    for module in ("CenterDetect", "KeypointDetect", "HybridNet"):
        assert (parent_dir / "projects" / "CliProj" / "models" /
                module).is_dir()


@pytest.fixture(scope="module")
def video(parent_dir, reference_dir):
    ds = reference_dir / "datasets" / "Example_Dataset"
    with open(ds / "annotations" / "instances_val.json") as f:
        data = json.load(f)
    frame = cv2.imread(str(ds / "val" / data["images"][0]["file_name"]))
    path = parent_dir / "Camera_B.avi"
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"MJPG"), 30,
                        (frame.shape[1], frame.shape[0]))
    for _ in range(3):
        w.write(frame)
    w.release()
    return path


def test_predict2d_then_visualize(parent_dir, video, monkeypatch):
    monkeypatch.setenv("JARVIS_PARENT_DIR", str(parent_dir))
    runner = CliRunner()
    result = runner.invoke(
        cli,
        ["predict", "predict2D",
         "--weights_center_detect",
         f"{PRETRAIN_DIR}/EfficientTrack_Center-small.pth",
         "--weights_keypoint_detect",
         f"{PRETRAIN_DIR}/EfficientTrack_Keypoints-small.pth",
         "CliProj", str(video)],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    pred_root = parent_dir / "projects" / "CliProj" / "predictions" / \
        "predictions2D"
    runs = list(pred_root.iterdir())
    assert len(runs) == 1
    with open(runs[0] / "data2D.csv") as f:
        rows = list(csv.reader(f))
    assert len(rows) == 5  # 2 header + 3 frames

    # visualize with 'latest' prediction resolution
    result = runner.invoke(cli, ["visualize", "create-videos2D", "CliProj"],
                           catch_exceptions=False)
    assert result.exit_code == 0, result.output
    vis_root = parent_dir / "projects" / "CliProj" / "visualization"
    mp4s = [p for d in vis_root.iterdir() for p in d.iterdir()
            if p.suffix == ".mp4"]
    assert mp4s and mp4s[0].stat().st_size > 1000


def test_plot_error_histogram_headless(parent_dir, monkeypatch):
    import matplotlib

    matplotlib.use("Agg")
    monkeypatch.setenv("JARVIS_PARENT_DIR", str(parent_dir))
    analysis_dir = parent_dir / "projects" / "CliProj" / "analysis" / "Run"
    analysis_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    gt = rng.uniform(0, 100, (20, 23 * 3))
    net = gt + rng.normal(0, 2, gt.shape)
    np.savetxt(analysis_dir / "points_GroundTruth.csv", gt, delimiter=",")
    np.savetxt(analysis_dir / "points_HybridNet.csv", net, delimiter=",")

    result = CliRunner().invoke(
        cli,
        ["analyze", "plot-error-histogram", "--mode", "headless", "CliProj"],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    assert (analysis_dir / "error_histogram.png").is_file()

    result = CliRunner().invoke(
        cli,
        ["analyze", "plot-error-per-keypoint", "--mode", "headless",
         "CliProj"],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    assert (analysis_dir / "error_per_joint.png").is_file()


def test_skeleton_coloring(reference_dir):
    from jarvis_hybridnet_tpu.config import ProjectManager
    from jarvis_hybridnet_tpu.utils.skeleton import get_skeleton

    pm = ProjectManager(parent_dir=str(reference_dir))
    pm.load("Example_Project")
    colors, line_idxs = get_skeleton(pm.get_cfg())
    assert len(colors) == 23
    assert len(line_idxs) == 23
    # finger chains get distinct colors; at least 5 distinct colors
    assert len({tuple(c) for c in colors}) >= 5


def test_cli_commands_case_insensitive():
    """Reference users arrive with either spelling: the docs say
    'jarvis predict predict2D' but click >= 8 lowercases the reference's
    undeclared command names to 'predict2d' — both must resolve."""
    for args in (["predict", "predict2d", "--help"],
                 ["predict", "PREDICT3D", "--help"],
                 ["visualize", "create-videos2d", "--help"],
                 ["train", "centerdetect", "--help"]):
        result = CliRunner().invoke(cli, args)
        assert result.exit_code == 0, (args, result.output)
    result = CliRunner().invoke(cli, ["predict", "nonsense"])
    assert result.exit_code != 0
