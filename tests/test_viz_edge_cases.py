"""Edge cases fixed in the round-3 review: run-dir listing vs stray
files, time-slice confidence-column detection, per-keypoint plots on
projects without keypoint names, and AOT artifact listing by numerics."""

import os
import time

import matplotlib
import numpy as np
import pytest

matplotlib.use("Agg")

from jarvis_hybridnet_tpu.utils.utils import latest_run_dir, list_run_dirs


def test_run_dir_listing_skips_files(tmp_path):
    """'latest' must resolve to the newest run DIRECTORY even when a
    stray file (log, partial shard) is the newest entry."""
    old = tmp_path / "Run_old"
    new = tmp_path / "Run_new"
    old.mkdir()
    new.mkdir()
    os.utime(old, (time.time() - 100, time.time() - 100))
    stray = tmp_path / "data3D.csv.part00001"
    stray.write_text("x")  # newest entry, but not a run
    assert list_run_dirs(tmp_path) == ["Run_new", "Run_old"]
    assert latest_run_dir(tmp_path) == str(new)
    assert latest_run_dir(tmp_path / "missing") is None


def _write_csv(path, data, header_groups=None):
    lines = []
    if header_groups is not None:
        joints = [f"j{i}" for i in range(data.shape[1] // len(header_groups))
                  for _ in header_groups]
        coords = list(header_groups) * (data.shape[1] // len(header_groups))
        lines.append(",".join(joints))
        lines.append(",".join(coords))
    for row in data:
        lines.append(",".join(str(v) for v in row))
    path.write_text("\n".join(lines) + "\n")


def test_time_slices_xyz_only_width_divisible_by_4(tmp_path):
    """12 joints xyz-only = 36 columns (divisible by 4): the confidence
    heuristic must NOT delete real coordinate columns."""
    from jarvis_hybridnet_tpu.visualization.time_slices import plot_slices

    rng = np.random.default_rng(0)
    data = rng.uniform(10, 100, (4, 12 * 3))  # coords are mm-scale, not [0,1]
    csv = tmp_path / "points_HybridNet.csv"
    _write_csv(csv, data)
    out = tmp_path / "slices.png"
    fig = plot_slices(str(csv), str(out), 0, 2, 1, plot_azim=0.0,
                      plot_elev=0.0)
    assert fig is not None and out.is_file()
    # every scatter of the first slice uses real (x,y,z) triplets
    assert len(fig.axes) == 2


def test_time_slices_confidence_columns_dropped(tmp_path):
    """x,y,z,confidence groups (confidences in [0,1]) are detected and
    dropped even without a header."""
    from jarvis_hybridnet_tpu.visualization.time_slices import plot_slices

    rng = np.random.default_rng(1)
    j = 6
    xyz = rng.uniform(10, 100, (3, j, 3))
    conf = rng.uniform(0, 1, (3, j, 1))
    data = np.concatenate([xyz, conf], axis=2).reshape(3, j * 4)
    csv = tmp_path / "data3D.csv"
    _write_csv(csv, data)
    fig = plot_slices(str(csv), str(tmp_path / "s.png"), 0, 1, 1,
                      plot_azim=0.0, plot_elev=0.0)
    assert fig is not None


def test_time_slices_header_group_width(tmp_path):
    """With a text header the group width is counted exactly from the
    coords row — no value-range guessing."""
    from jarvis_hybridnet_tpu.visualization.time_slices import plot_slices

    rng = np.random.default_rng(2)
    j = 4
    xyz = rng.uniform(10, 100, (2, j, 3))
    # confidences deliberately OUTSIDE [0,1] to defeat the heuristic:
    # only the header says they are a 4th column
    conf = rng.uniform(5, 9, (2, j, 1))
    data = np.concatenate([xyz, conf], axis=2).reshape(2, j * 4)
    csv = tmp_path / "data3D.csv"
    _write_csv(csv, data, header_groups=["x", "y", "z", "confidence"])
    fig = plot_slices(str(csv), str(tmp_path / "s.png"), 0, 1, 1,
                      plot_azim=0.0, plot_elev=0.0)
    assert fig is not None


@pytest.mark.parametrize("num_joints", [3, 23])
def test_per_keypoint_plots_without_names(tmp_path, monkeypatch,
                                          num_joints):
    """Per-keypoint plots must work on projects whose dataset had no
    keypoint_names (empty KEYPOINT_NAMES) and with < 4 joints (1-row
    subplot grid)."""
    from jarvis_hybridnet_tpu.analysis import plotting
    from jarvis_hybridnet_tpu.config.defaults import get_default_cfg

    cfg = get_default_cfg()
    cfg.KEYPOINT_NAMES = []
    monkeypatch.setattr(plotting, "_load_project_cfg", lambda name: cfg)

    rng = np.random.default_rng(3)
    gt = rng.uniform(0, 100, (10, num_joints * 3))
    net = gt + rng.normal(0, 2, gt.shape)
    np.savetxt(tmp_path / "points_GroundTruth.csv", gt, delimiter=",")
    np.savetxt(tmp_path / "points_HybridNet.csv", net, delimiter=",")

    fig = plotting.plot_error_per_keypoint(str(tmp_path), "AnyProj",
                                           interactive=False)
    assert fig is not None
    assert (tmp_path / "error_per_joint.png").is_file()

    fig = plotting.plot_error_histogram_per_keypoint(
        str(tmp_path), "AnyProj", interactive=False)
    assert fig is not None
    hists = list((tmp_path / "keypoint_histograms").iterdir())
    assert len(hists) == num_joints


def test_list_artifacts_filters_by_numerics(tmp_path):
    """Only artifacts exported under the current repro-mode/dtype are
    offered for reuse; stale-numerics files are excluded."""
    from jarvis_hybridnet_tpu.config.defaults import get_default_cfg
    from jarvis_hybridnet_tpu.prediction import export as aot

    cfg = get_default_cfg()
    cfg.PARENT_DIR = str(tmp_path)
    cfg.PROJECT_NAME = "P"
    cfg.TPU.REPRO_MODE = "quarter_fused"
    cfg.TPU.INFERENCE_DTYPE = "bfloat16"

    art_dir = tmp_path / "projects" / "P" / "compiled-models"
    art_dir.mkdir(parents=True)
    good = "predict2D_8x1024x1280x3_quarter_fused-bfloat16.jaxexp"
    stale = "predict2D_8x1024x1280x3_exact-float32.jaxexp"
    other = "predict3D_8x12x1024x1280x3_quarter_fused-bfloat16.jaxexp"
    for f in (good, stale, other):
        (art_dir / f).write_bytes(b"")

    assert aot.list_artifacts(cfg, "predict2D") == [good]
    assert aot.list_artifacts(cfg, "predict3D") == [other]
    cfg.TPU.REPRO_MODE = "exact"
    cfg.TPU.INFERENCE_DTYPE = "float32"
    assert aot.list_artifacts(cfg, "predict2D") == [stale]
