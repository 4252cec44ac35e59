"""Interactive CLI smoke tests (menus driven by scripted input)."""

import builtins
import os

import pytest

from jarvis_hybridnet_tpu.ui import interactive_cli


def test_menu_navigation(monkeypatch, capsys):
    answers = iter(["bogus", "2", "q"])
    monkeypatch.setattr(builtins, "input", lambda *a: next(answers))
    choice = interactive_cli._menu("Pick:", ["alpha", "beta"])
    assert choice == "beta"
    assert "Please enter a valid option" in capsys.readouterr().out
    assert interactive_cli._menu("Pick:", ["alpha"]) is None


def test_main_menu_quits(monkeypatch):
    monkeypatch.setattr(builtins, "input", lambda *a: "q")
    interactive_cli.launch_interactive_prompt()  # returns without error


def test_pick_project_lists(monkeypatch, tmp_path, capsys):
    (tmp_path / "projects" / "P1").mkdir(parents=True)
    (tmp_path / "projects" / "P1" / "config.yaml").write_text("{}")
    monkeypatch.setenv("JARVIS_PARENT_DIR", str(tmp_path))
    answers = iter(["1"])
    monkeypatch.setattr(builtins, "input", lambda *a: next(answers))
    assert interactive_cli._pick_project() == "P1"


def _script(monkeypatch, answers):
    it = iter(answers)
    monkeypatch.setattr(builtins, "input", lambda *a: next(it))


def test_pretrain_picker(monkeypatch, tmp_path):
    pt = tmp_path / "pretrained" / "MonkeyHand"
    pt.mkdir(parents=True)
    (pt / "EfficientTrack_Center-small.pth").write_bytes(b"x")
    # pick the named pretrain (option 2 after 'None')
    _script(monkeypatch, ["2"])
    assert interactive_cli._pick_weights_or_pretrain(str(tmp_path)) == \
        "MonkeyHand"
    # 'None' then decline explicit path
    _script(monkeypatch, ["1", "2"])
    assert interactive_cli._pick_weights_or_pretrain(str(tmp_path)) is None
    # 'None' then give a path (validated to exist + suffix)
    w = tmp_path / "w.ckpt"
    w.write_bytes(b"x")
    _script(monkeypatch, ["1", "1", "/nope.pth", str(w)])
    assert interactive_cli._pick_weights_or_pretrain(str(tmp_path)) == str(w)


def test_model_weights_picker(monkeypatch, tmp_path):
    _script(monkeypatch, ["1"])
    assert interactive_cli._pick_model_weights("CenterDetect") == "latest"
    w = tmp_path / "c.pth"
    w.write_bytes(b"x")
    _script(monkeypatch, ["2", str(w)])
    assert interactive_cli._pick_model_weights("CenterDetect") == str(w)


def test_frame_range_prompt_bounded(monkeypatch, tmp_path):
    cv2 = pytest.importorskip("cv2")
    import numpy as np

    path = tmp_path / "cam.avi"
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"MJPG"), 30,
                        (32, 32))
    for _ in range(10):
        w.write(np.zeros((32, 32, 3), np.uint8))
    w.release()
    # whole video
    _script(monkeypatch, ["1"])
    assert interactive_cli.get_frame_start_number(str(path)) == (0, -1)
    # bounded prompts: start 99 rejected (max 9), then 2; frames 4
    _script(monkeypatch, ["2", "99", "2", "4"])
    assert interactive_cli.get_frame_start_number(str(path)) == (2, 4)


def test_compiled_mode_wizard(monkeypatch, tmp_path):
    from jarvis_hybridnet_tpu.config.defaults import get_default_cfg

    cfg = get_default_cfg()
    cfg.PARENT_DIR = str(tmp_path)
    cfg.PROJECT_NAME = "P"
    # no saved artifact -> 'new'
    _script(monkeypatch, ["1"])
    assert interactive_cli.get_compiled_mode(cfg, "predict3D") == "new"
    # saved artifact (under the CURRENT numerics config) present -> reuse
    from jarvis_hybridnet_tpu.prediction import export as aot

    art = aot.artifact_path(cfg, "predict3D", (1, 2))
    os.makedirs(os.path.dirname(art), exist_ok=True)
    with open(art, "wb") as f:
        f.write(b"x")
    _script(monkeypatch, ["1", "1"])
    assert interactive_cli.get_compiled_mode(cfg, "predict3D") == "previous"
    # decline reuse, confirm override -> 'new'
    _script(monkeypatch, ["1", "2", "1"])
    assert interactive_cli.get_compiled_mode(cfg, "predict3D") == "new"
    # decline acceleration entirely -> 'off'
    _script(monkeypatch, ["2"])
    assert interactive_cli.get_compiled_mode(cfg, "predict3D") == "off"


def test_analysis_run_picker(monkeypatch, tmp_path):
    from jarvis_hybridnet_tpu.config.defaults import get_default_cfg

    cfg = get_default_cfg()
    cfg.PARENT_DIR = str(tmp_path)
    cfg.PROJECT_NAME = "P"
    # no analysis runs yet -> None + error message
    assert interactive_cli._pick_analysis_run(cfg) is None
    base = tmp_path / "projects" / "P" / "analysis"
    (base / "Validation_Predictions_1").mkdir(parents=True)
    (base / "Validation_Predictions_2").mkdir()
    _script(monkeypatch, ["1"])
    # newest run (reverse-sorted) is offered first
    assert interactive_cli._pick_analysis_run(cfg).endswith(
        "Validation_Predictions_2")


def test_analyze_plot_flflows_native(monkeypatch, tmp_path):
    """The plot flows drive plotting natively (no CliRunner shell-out)."""
    (tmp_path / "projects" / "P1").mkdir(parents=True)
    (tmp_path / "projects" / "P1" / "config.yaml").write_text(
        "PROJECT_NAME: P1\n")
    run = tmp_path / "projects" / "P1" / "analysis" / "run_1"
    run.mkdir(parents=True)
    monkeypatch.setenv("JARVIS_PARENT_DIR", str(tmp_path))

    seen = {}

    from jarvis_hybridnet_tpu.analysis import plotting

    def fake_hist(path, additional_data={}, cutoff=-1, interactive=True):
        seen.update(path=path, additional=dict(additional_data),
                    cutoff=cutoff, interactive=interactive)

    monkeypatch.setattr(plotting, "plot_error_histogram", fake_hist)
    extra = tmp_path / "other.csv"
    extra.write_text("x\n")
    # project 1, flow 2 (histogram), run 1, add a csv ("2"=Yes) with a
    # name, stop adding, use cutoff 25, non-interactive
    _script(monkeypatch, ["1", "2", "1", "2", str(extra), "other", "1",
                          "2", "25", "2"])
    interactive_cli._analyze_menu()
    assert seen["path"].endswith("run_1")
    assert seen["additional"] == {"other": str(extra)}
    assert seen["cutoff"] == 25
    assert seen["interactive"] is False

    def fake_per_kp(path, project_name, interactive=True):
        seen.update(kp_path=path, kp_project=project_name,
                    kp_interactive=interactive)

    monkeypatch.setattr(plotting, "plot_error_per_keypoint", fake_per_kp)
    # project 1, flow 3 (per-keypoint), run 1, interactive yes
    _script(monkeypatch, ["1", "3", "1", "1"])
    interactive_cli._analyze_menu()
    assert seen["kp_project"] == "P1" and seen["kp_interactive"] is True


def test_analyze_cameras_subset(monkeypatch, tmp_path, reference_dir):
    from jarvis_hybridnet_tpu.config.defaults import get_default_cfg

    cfg = get_default_cfg()
    cfg.PARENT_DIR = str(tmp_path)
    cfg.DATASET.DATASET_3D = str(
        reference_dir / "datasets" / "Example_Dataset")
    # decline subsetting -> None
    _script(monkeypatch, ["1"])
    assert interactive_cli._pick_cameras_subset(cfg) is None
    # accept, keep first camera only, drop the rest (12-cam rig)
    _script(monkeypatch, ["2", "1"] + ["2"] * 11)
    subset = interactive_cli._pick_cameras_subset(cfg)
    assert subset is not None and len(subset) == 1


def test_analyze_cameras_subset_no_dataset(monkeypatch, tmp_path, capsys):
    """DATASET_3D=None (the default): the picker must warn and fall back
    to all cameras instead of crashing in os.path.isabs(None)
    (review r3 finding)."""
    from jarvis_hybridnet_tpu.config.defaults import get_default_cfg

    cfg = get_default_cfg()
    cfg.PARENT_DIR = str(tmp_path)
    assert cfg.DATASET.DATASET_3D is None
    _script(monkeypatch, ["2"])  # opt into subsetting
    assert interactive_cli._pick_cameras_subset(cfg) is None
    assert "using all" in capsys.readouterr().out


def test_analyze_cameras_subset_empty_and_abort(monkeypatch, tmp_path,
                                                reference_dir, capsys):
    """Deselecting every camera must not silently invert into 'all
    cameras' without a message, and 'q' mid-picker aborts to all cameras
    instead of counting as a selection (review r3 findings)."""
    from jarvis_hybridnet_tpu.config.defaults import get_default_cfg

    cfg = get_default_cfg()
    cfg.PARENT_DIR = str(tmp_path)
    cfg.DATASET.DATASET_3D = str(
        reference_dir / "datasets" / "Example_Dataset")
    # opt in, answer No for all 12 cameras -> warned fall-back to all
    _script(monkeypatch, ["2"] + ["2"] * 12)
    assert interactive_cli._pick_cameras_subset(cfg) is None
    assert "No cameras selected" in capsys.readouterr().out
    # opt in, select first camera, then quit -> abort, use all
    _script(monkeypatch, ["2", "1", "q"])
    assert interactive_cli._pick_cameras_subset(cfg) is None
    assert "aborted" in capsys.readouterr().out
