"""Streamlit GUI smoke tests (function-level, against a scripted fake
streamlit module — the real package is not installed in CI)."""

import os
import sys

import pytest

from tests import fake_streamlit

pytestmark = pytest.mark.usefixtures("reference_dir")


@pytest.fixture()
def gui_project(tmp_path, reference_dir, monkeypatch):
    """A real project created against Example_Dataset."""
    (tmp_path / "datasets").mkdir()
    os.symlink(str(reference_dir / "datasets" / "Example_Dataset"),
               str(tmp_path / "datasets" / "Example_Dataset"))
    monkeypatch.setenv("JARVIS_PARENT_DIR", str(tmp_path))
    from jarvis_hybridnet_tpu.config import ProjectManager

    pm = ProjectManager()
    assert pm.create_new("GuiProj", "Example_Dataset", "Example_Dataset")
    return "GuiProj"


def _main(fake):
    from jarvis_hybridnet_tpu.ui.gui import jarvis_gui

    jarvis_gui.main()
    return fake


def test_project_page_renders(tmp_path, monkeypatch):
    monkeypatch.setenv("JARVIS_PARENT_DIR", str(tmp_path))
    fake = fake_streamlit.install({"Menu": "Project"})
    _main(fake)
    assert any("Create a new project" in h for h in fake.calls("header"))


def test_training_page_renders_forms(gui_project):
    fake = fake_streamlit.install({
        "Menu": "Training",
        "Project": gui_project,
        "What to train": "Full Network",
    })
    _main(fake)
    assert any("Train Full Network" in h for h in fake.calls("header"))
    # form not submitted -> no training started, no errors
    assert not fake.calls("error")


def test_training_submit_drives_monitor_protocol(gui_project, monkeypatch):
    """Submitting the CenterDetect form passes the full 5-widget list to
    the train interface and reports success."""
    captured = {}

    def fake_train(mode, project, epochs, weights, streamlit_widgets=None,
                   **kw):
        captured["mode"] = mode
        captured["widgets"] = streamlit_widgets
        # drive the monitor like the real trainer does
        from jarvis_hybridnet_tpu.utils.st_monitor import (
            StreamlitTrainingMonitor,
        )

        m = StreamlitTrainingMonitor(streamlit_widgets, mode)
        m.start(2)
        m.step(0, 10)
        m.epoch(0, 2, {"train_loss": [1.0], "val_loss": [1.2],
                       "train_acc": [3.0], "val_acc": [4.0]})
        return True

    fake = fake_streamlit.install({
        "Menu": "Training",
        "Project": gui_project,
        "What to train": "CenterDetect",
        "Train": True,
    })
    import jarvis_hybridnet_tpu.training.train_interface as ti

    monkeypatch.setattr(ti, "train_efficienttrack", fake_train)
    _main(fake)
    assert captured["mode"] == "CenterDetect"
    assert len(captured["widgets"]) == 5
    charts = fake.calls("line_chart")
    assert any("Train Loss" in c for c in charts if isinstance(c, dict))
    assert any("Training finished." in s for s in fake.calls("success"))
    # session_state result caching (reference efficienttrack.py:360-373)
    assert fake.session_state.get("results_available") is True


def test_training_config_check_blocks_bad_config(gui_project, monkeypatch):
    """A config problem surfaces as st.error and training never starts."""
    import jarvis_hybridnet_tpu.ui.gui.train_gui as tg

    fake = fake_streamlit.install({
        "Menu": "Training",
        "Project": gui_project,
        "What to train": "CenterDetect",
        "Train": True,
    })
    import jarvis_hybridnet_tpu.ui.gui.train_gui as tg

    monkeypatch.setattr(
        tg.checks, "check_config", lambda cfg, mode: ["BATCH_SIZE bad"])
    called = []
    monkeypatch.setattr(tg.train_interface, "train_efficienttrack",
                        lambda *a, **k: called.append(1) or True)
    from jarvis_hybridnet_tpu.ui.gui import jarvis_gui

    jarvis_gui.main()
    assert any("BATCH_SIZE bad" in e for e in fake.calls("error"))
    assert not called


def test_visualization_page_warns_without_predictions(gui_project):
    fake = fake_streamlit.install({
        "Menu": "Visualization",
        "Project": gui_project,
        "What to visualize": "Create Video 3D",
    })
    _main(fake)
    assert any("No predictions" in w for w in fake.calls("warning"))


def test_analysis_page_renders(gui_project):
    fake = fake_streamlit.install({
        "Menu": "Analysis",
        "Project": gui_project,
    })
    _main(fake)
    assert any("Validation analysis" in h for h in fake.calls("header"))
    assert any("No analysis runs" in i for i in fake.calls("info"))


def test_prediction_page_renders(gui_project):
    fake = fake_streamlit.install({
        "Menu": "Prediction",
        "Project": gui_project,
        "Mode": "Predict 3D",
    })
    _main(fake)
    assert any("Predict 3D" in h for h in fake.calls("header"))


def test_analysis_page_camera_multiselect(gui_project, monkeypatch):
    """The analysis page surfaces a camera multiselect (reference
    analyze_gui.py:45-47) and forwards the chosen subset."""
    seen = {}

    from jarvis_hybridnet_tpu.analysis import analyze as analyze_mod

    def fake_analyze(project, weights_center="latest",
                     weights_hybridnet="latest", cameras_to_use=None,
                     progress_bar=None, **k):
        seen["cameras"] = cameras_to_use
        return "/tmp/out"

    monkeypatch.setattr(analyze_mod, "analyze_validation_data",
                        fake_analyze)
    fake = fake_streamlit.install({
        "Menu": "Analysis",
        "Project": gui_project,
        "Select cameras to use for analysis": ["Camera_B", "Camera_LBB"],
        "Analyze validation data": True,
    })
    _main(fake)
    labels = [v for k, v in fake.log if k == "multiselect"]
    assert any("cameras" in (l or "") for l in labels)
    assert seen["cameras"] == ["Camera_B", "Camera_LBB"]


def test_analysis_page_rejects_empty_camera_selection(gui_project,
                                                      monkeypatch):
    """Clearing the camera multiselect must error cleanly instead of
    building a 0-camera rig (review r3 finding)."""
    called = {}

    from jarvis_hybridnet_tpu.analysis import analyze as analyze_mod

    def fake_analyze(*a, **k):
        called["yes"] = True
        return "/tmp/out"

    monkeypatch.setattr(analyze_mod, "analyze_validation_data",
                        fake_analyze)
    fake = fake_streamlit.install({
        "Menu": "Analysis",
        "Project": gui_project,
        "Select cameras to use for analysis": [],
        "Analyze validation data": True,
    })
    _main(fake)
    assert "yes" not in called
    assert any("at least one camera" in str(a)
               for a in fake.calls("error"))
