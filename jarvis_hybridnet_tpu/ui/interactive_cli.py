"""Interactive terminal menu.

Equivalent of the reference inquirer-based interactive CLI
(jarvis/ui/interactive_cli/cli.py:27 and siblings) built on plain
``input()`` so it needs no extra dependency: project pickers, training /
prediction / visualization / analysis submenus that call the same interface
functions as the click CLI.
"""

from __future__ import annotations

import os

from ..config.project_manager import ProjectManager
from ..utils import clp
from ..utils.param_classes import Predict2DParams, Predict3DParams


def _menu(title: str, options: list[str]) -> str | None:
    print(f"\n{title}")
    for i, opt in enumerate(options, 1):
        print(f"  {i}) {opt}")
    print("  q) back")
    while True:
        ans = input("> ").strip()
        if ans in ("q", "Q"):
            return None
        if ans.isdigit() and 1 <= int(ans) <= len(options):
            return options[int(ans) - 1]
        print("Please enter a valid option number.")


def _pick_project() -> str | None:
    projects = ProjectManager().get_projects()
    if not projects:
        clp.error("No projects found in the current parent directory.")
        return None
    return _menu("Select a project:", projects)


def _ask(prompt: str, default: str = "") -> str:
    raw = input(f"{prompt} [{default}]: ").strip()
    return raw or default


def launch_interactive_prompt() -> None:
    print("Welcome to JARVIS (TPU edition) interactive CLI!")
    while True:
        choice = _menu(
            "Main menu:",
            ["Create Project", "Train", "Predict", "Visualize", "Analyze"],
        )
        if choice is None:
            return
        if choice == "Create Project":
            name = _ask("Project name")
            d3d = _ask("3D dataset path")
            d2d = _ask("2D dataset path", d3d)
            if name and d2d:
                ProjectManager().create_new(name, d2d, d3d or None)
        elif choice == "Train":
            _train_menu()
        elif choice == "Predict":
            _predict_menu()
        elif choice == "Visualize":
            _visualize_menu()
        elif choice == "Analyze":
            _analyze_menu()


def _train_menu():
    from ..training import train_interface

    project = _pick_project()
    if project is None:
        return
    what = _menu("Train:", ["All", "CenterDetect", "KeypointDetect",
                            "HybridNet"])
    if what is None:
        return
    if what == "All":
        train_interface.train_efficienttrack("CenterDetect", project, None,
                                             None)
        train_interface.train_efficienttrack("KeypointDetect", project, None,
                                             None)
        train_interface.train_hybridnet(project, None, "latest", None,
                                        "3D_only")
    elif what in ("CenterDetect", "KeypointDetect"):
        weights = _ask("Weights ('latest', path, pretrain name or empty)",
                       "") or None
        train_interface.train_efficienttrack(what, project, None, weights)
    else:
        mode = _menu("Training mode:", ["3D_only", "last_layers", "bifpn",
                                        "all"]) or "3D_only"
        train_interface.train_hybridnet(project, None, "latest", None, mode,
                                        finetune=(mode != "3D_only"))


def _predict_menu():
    project = _pick_project()
    if project is None:
        return
    what = _menu("Predict:", ["predict3D", "predict2D"])
    if what is None:
        return
    path = _ask("Recording path")
    if not os.path.exists(path):
        clp.error("Recording path does not exist.")
        return
    frame_start = int(_ask("Start frame", "0"))
    number_frames = int(_ask("Number of frames (-1 = all)", "-1"))
    trt_mode = _menu("Compiled-model cache:", ["off", "new", "previous"]) \
        or "off"
    if what == "predict3D":
        from ..prediction.predict3d import predict3D

        params = Predict3DParams(project, path)
        params.frame_start = frame_start
        params.number_frames = number_frames
        params.trt_mode = trt_mode
        predict3D(params)
    else:
        from ..prediction.predict2d import predict2D

        params = Predict2DParams(project, path)
        params.frame_start = frame_start
        params.number_frames = number_frames
        params.trt_mode = trt_mode
        predict2D(params)


def _visualize_menu():
    from click.testing import CliRunner

    from .cli import cli as click_cli

    project = _pick_project()
    if project is None:
        return
    what = _menu("Visualize:", ["create-videos3D", "create-videos2D"])
    if what is None:
        return
    CliRunner().invoke(click_cli, ["visualize", what, project],
                       catch_exceptions=False)


def _analyze_menu():
    project = _pick_project()
    if project is None:
        return
    what = _menu("Analyze:", [
        "analyze-validation-data", "plot-error-histogram",
        "plot-error-per-keypoint", "plot-error-histogram-per-keypoint"])
    if what is None:
        return
    from click.testing import CliRunner

    from .cli import cli as click_cli

    args = ["analyze", what, project]
    if what.startswith("plot"):
        args = ["analyze", what, "--mode", "interactive", project]
    CliRunner().invoke(click_cli, args, catch_exceptions=False)
