"""Interactive CLI smoke tests (menus driven by scripted input)."""

import builtins

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
