"""Weight-spec resolution tests: 'latest', pose pretrains, 'ecoset',
paths, and HybridNet pretrain naming — matching the reference conventions
(jarvis/efficienttrack/efficienttrack.py:90-183)."""

import os
import shutil
import time

import numpy as np
import pytest

from jarvis_hybridnet_tpu.config import ProjectManager
from jarvis_hybridnet_tpu.training import checkpoints
from jarvis_hybridnet_tpu.utils.utils import get_available_pretrains

PRETRAIN_DIR = "/root/reference/pretrained"


@pytest.fixture()
def project(tmp_path, reference_dir):
    (tmp_path / "datasets").mkdir()
    os.symlink(str(reference_dir / "datasets" / "Example_Dataset"),
               str(tmp_path / "datasets" / "Example_Dataset"))
    proj = tmp_path / "projects" / "CkptProj"
    proj.mkdir(parents=True)
    shutil.copyfile(
        str(reference_dir / "projects" / "Example_Project" / "config.yaml"),
        str(proj / "config.yaml"))
    # pretrained zoo
    os.symlink(PRETRAIN_DIR, str(tmp_path / "pretrained"))
    pm = ProjectManager(parent_dir=str(tmp_path))
    assert pm.load("CkptProj")
    return pm


def test_get_available_pretrains(reference_dir):
    assert "MonkeyHand" in get_available_pretrains(str(reference_dir))


def test_pose_pretrain_resolution(project):
    """A pretrain name resolves to pretrained/<pose>/EfficientTrack_*.pth."""
    cfg = project.get_cfg()
    from jarvis_hybridnet_tpu.prediction.loaders import (
        init_efficienttrack_params,
    )

    init = init_efficienttrack_params(cfg, "CenterDetect", abstract=True)
    loaded = checkpoints.load_efficienttrack_params(
        cfg, "CenterDetect", "MonkeyHand", init_params=init)
    assert loaded is not None
    assert np.abs(loaded["weights_cat"]).sum() > 0  # real values, not zeros


def test_latest_resolution(project):
    """'latest' finds the newest run dir containing a final checkpoint."""
    cfg = project.get_cfg()
    run1 = os.path.join(cfg.savePaths["CenterDetect"], "Run_old")
    run2 = os.path.join(cfg.savePaths["CenterDetect"], "Run_new")
    os.makedirs(run1)
    os.makedirs(run2)
    for d, val in ((run1, 1.0), (run2, 2.0)):
        checkpoints.save_checkpoint(
            {"weights_cat": np.full(3, val, np.float32)},
            os.path.join(d, "EfficientTrack-small_final.ckpt"))
    now = time.time()
    os.utime(run1, (now - 100, now - 100))
    os.utime(run2, (now, now))
    path = checkpoints.get_latest_weights(cfg, "CenterDetect")
    assert path is not None and "Run_new" in path
    loaded = checkpoints.load_checkpoint(path)
    assert loaded["weights_cat"][0] == 2.0


def test_missing_weights_warns(project, capsys):
    cfg = project.get_cfg()
    out = checkpoints.load_efficienttrack_params(
        cfg, "CenterDetect", "/nonexistent/path.pth")
    assert out is None
    assert "Could not load" in capsys.readouterr().out


def test_hybridnet_pretrain_seeding(project):
    """HybridNet init seeded from a KeypointDetect checkpoint embeds the
    2D weights under effTrack."""
    cfg = project.get_cfg()
    from jarvis_hybridnet_tpu.prediction.loaders import init_hybridnet_params

    init = init_hybridnet_params(cfg, abstract=True)
    loaded = checkpoints.load_hybridnet_params(
        cfg, None, init_params=init,
        efficienttrack_weights="MonkeyHand",
    )
    assert np.abs(loaded["effTrack"]["weights_cat"]).sum() > 0
    # v2v untouched (still zeros from abstract init)
    assert np.abs(loaded["v2vNet"]["output_layer"]["bias"]).sum() == 0
