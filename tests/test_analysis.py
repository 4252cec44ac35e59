"""End-to-end test of the accuracy-evaluation harness.

SURVEY.md §4: the reference's de-facto regression test is
``analyze_validation_data`` (reference jarvis/analysis/analyze.py:22-96)
— run it for real on a tiny val subset (4 cameras, coarse grid, 2
framesets) and check the CSV contract plus the downstream mm-stats path
``tools/accuracy_eval.py`` consumes.
"""

import os
import shutil

import numpy as np
import pytest
import yaml

from jarvis_hybridnet_tpu.config import ProjectManager

PRETRAIN = "/root/reference/pretrained/MonkeyHand"


@pytest.fixture(scope="module")
def analysis_project(tmp_path_factory, reference_dir):
    """Example_Project shrunk for CPU: coarse voxel grid + small crops
    (same reductions the training tests use; the 144 mm cube must stay —
    the GT cube filter would otherwise drop every frameset)."""
    root = tmp_path_factory.mktemp("analysis_project")
    (root / "datasets").mkdir()
    os.symlink(
        str(reference_dir / "datasets" / "Example_Dataset"),
        str(root / "datasets" / "Example_Dataset"),
    )
    proj = root / "projects" / "AnaProj"
    proj.mkdir(parents=True)
    src = reference_dir / "projects" / "Example_Project" / "config.yaml"
    with open(src) as f:
        raw = yaml.safe_load(f)
    raw["HYBRIDNET"]["GRID_SPACING"] = 4
    raw["KEYPOINTDETECT"]["BOUNDING_BOX_SIZE"] = 128
    with open(proj / "config.yaml", "w") as f:
        yaml.safe_dump(raw, f)
    os.environ["JARVIS_PARENT_DIR"] = str(root)
    pm = ProjectManager(parent_dir=str(root))
    assert pm.load("AnaProj")
    yield pm
    os.environ.pop("JARVIS_PARENT_DIR", None)


def test_analyze_validation_data_e2e(analysis_project, tmp_path):
    from jarvis_hybridnet_tpu.analysis.analyze import analyze_validation_data
    from jarvis_hybridnet_tpu.dataset.dataset3d import Dataset3D
    from jarvis_hybridnet_tpu.prediction.loaders import init_hybridnet_params
    from jarvis_hybridnet_tpu.training.checkpoints import (
        load_efficienttrack_params,
        save_torch_checkpoint,
    )

    cfg = analysis_project.get_cfg()
    probe = Dataset3D(cfg, set="val")
    cameras = probe.rigs[next(iter(probe.rigs))].camera_names[:4]

    # deterministic HybridNet weights: seed-7 V2V + real KeypointDetect 2D
    params = init_hybridnet_params(cfg, seed=7)
    params["effTrack"] = load_efficienttrack_params(
        cfg, "KeypointDetect",
        f"{PRETRAIN}/EfficientTrack_Keypoints-small.pth",
        init_params=params["effTrack"],
    )
    pth = str(tmp_path / "hybrid.pth")
    save_torch_checkpoint(params, pth, "small", kind="hybridnet")

    out_dir = analyze_validation_data(
        "AnaProj",
        weights_center=f"{PRETRAIN}/EfficientTrack_Center-small.pth",
        weights_hybridnet=pth,
        cameras_to_use=cameras,
        frame_batch=2,
        max_framesets=2,
    )
    assert out_dir is not None and os.path.isdir(out_dir)

    # CSV contract (reference analyze.py writes the same three files)
    names = np.loadtxt(os.path.join(out_dir, "frame_names.csv"),
                       delimiter=",", dtype=str, ndmin=1)
    net = np.loadtxt(os.path.join(out_dir, "points_HybridNet.csv"),
                     delimiter=",", ndmin=2)
    gt = np.loadtxt(os.path.join(out_dir, "points_GroundTruth.csv"),
                    delimiter=",", ndmin=2)
    J = int(cfg.KEYPOINTDETECT.NUM_JOINTS)
    assert net.shape == gt.shape == (len(names), J * 3)
    assert 1 <= len(names) <= 2  # undetected framesets may be excluded
    assert np.isfinite(net).all() and np.isfinite(gt).all()

    # the stats path tools/accuracy_eval.py publishes BASELINE numbers with
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "accuracy_eval",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "accuracy_eval.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    stats = mod.stats_from_dir(out_dir)
    assert stats["framesets"] == len(names)
    assert stats["labeled_joints"] > 0
    for k in ("mean_mm", "median_mm", "p95_mm", "max_mm"):
        assert np.isfinite(stats[k]) and stats[k] >= 0
    assert stats["median_mm"] <= stats["p95_mm"] <= stats["max_mm"]

    shutil.rmtree(out_dir)
