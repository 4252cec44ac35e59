"""Training orchestration used by every UI.

Equivalent of the reference train_interface
(jarvis/train_interface.py:22-213): load a project, build datasets, resolve
weight specs ('latest'/None/'ecoset'/pretrain-name/path), construct the
trainer, run, and report final stats. ``train_hybridnet`` seeds the embedded
2D net from a KeypointDetect checkpoint, supports finetune (LR/10,
train_interface.py:201-203) and the four freeze modes.
"""

from __future__ import annotations

from ..config.project_manager import ProjectManager
from ..dataset.dataset2d import Dataset2D
from ..dataset.dataset3d import Dataset3D
from ..utils import clp
from .checkpoints import get_latest_weights
from .trainer2d import EfficientTrackTrainer
from .trainer3d import HybridNetTrainer


def _resolve_resume(resume, cfg, module):
    """'latest' -> newest run's train_state.ckpt; else a path (or None)."""
    if resume is None or resume == "None":
        return None
    if resume == "latest":
        from .checkpoints import get_latest_train_state

        path = get_latest_train_state(cfg, module)
        if path is None:
            clp.error(f"No resumable train_state.ckpt found for {module}.")
        return path
    return resume


def _report_final(results, acc_unit):
    """Returns False when the run was preempted, so callers (notably
    'train all' chains) stop instead of starting the next stage inside
    the eviction grace window."""
    if results.get("preempted"):
        clp.warning("Training was preempted; a resumable train state was "
                    "saved. Continue with --resume latest.")
        return False
    if results.get("already_complete"):
        # resumed past the final epoch: the run WAS finished; don't print
        # the zeroed meters as if they were real final stats
        clp.info("Nothing to train: the resumed state had already "
                 "completed all epochs.")
        return True
    clp.success("Successfully finished training!")
    print("Final Stats:")
    print(f'Training Loss: {results["train_loss"]}')
    print(f'Training Accuracy [{acc_unit}]: {results["train_acc"]}')
    print(f'Validation Loss: {results["val_loss"]}')
    print(f'Validation Accuracy [{acc_unit}]: {results["val_acc"]}')
    return True


def train_efficienttrack(mode, project_name, num_epochs, weights,
                         run_name=None, streamlit_widgets=None,
                         cameras_to_use=None, resume=None):
    """mode in {'CenterDetect', 'KeypointDetect'}; returns True on success
    (reference: jarvis/train_interface.py:52-121). ``resume`` is a
    train_state.ckpt path or 'latest' (full-state mid-run resume, e.g.
    after preemption — utils/preemption.py)."""
    project = ProjectManager()
    if not project.load(project_name):
        return False
    cfg = project.get_cfg()
    from ..config.checks import check_config

    problems = check_config(cfg, mode)
    if problems:
        for p in problems:
            clp.error(p)
        return False
    if num_epochs is None:
        num_epochs = int(cfg[mode.upper()].NUM_EPOCHS)
    clp.info(f"Training {mode} on project {project_name} for "
             f"{num_epochs} epochs!")

    train_set = Dataset2D(cfg, set="train", mode=mode,
                          cameras_to_use=cameras_to_use)
    val_set = Dataset2D(cfg, set="val", mode=mode,
                        cameras_to_use=cameras_to_use)

    if weights == "None":
        weights = None
    resume_from = _resolve_resume(resume, cfg, mode)
    if resume is not None and resume != "None" and resume_from is None:
        return False
    trainer = EfficientTrackTrainer(mode, cfg, weights=weights,
                                    run_name=run_name)
    if not trainer.found_weights:
        clp.error("Could not load weights, aborting training!")
        return False
    results = trainer.train(train_set, val_set, num_epochs,
                            streamlitWidgets=streamlit_widgets,
                            resume_from=resume_from)
    return _report_final(results, "px")


def train_hybridnet(project_name, num_epochs, weights_keypoint_detect,
                    weights, mode="3D_only", run_name=None, finetune=False,
                    streamlit_widgets=None, cameras_to_use=None,
                    resume=None):
    """mode in {'all', 'bifpn', 'last_layers', '3D_only'}
    (reference: jarvis/train_interface.py:124-213). ``resume`` is a
    train_state.ckpt path or 'latest' (full-state mid-run resume)."""
    project = ProjectManager()
    if not project.load(project_name):
        return False
    cfg = project.get_cfg()
    from ..config.checks import check_config

    problems = check_config(cfg, "HybridNet")
    if problems:
        for p in problems:
            clp.error(p)
        return False
    if num_epochs is None:
        num_epochs = int(cfg.HYBRIDNET.NUM_EPOCHS)
    clp.info(f"Training HybridNet ({mode}) on project {project_name} for "
             f"{num_epochs} epochs!")

    train_set = Dataset3D(cfg, set="train", cameras_to_use=cameras_to_use)
    val_set = Dataset3D(cfg, set="val", cameras_to_use=cameras_to_use)

    if weights_keypoint_detect == "None":
        weights_keypoint_detect = None
    if weights == "None":
        weights = None
    if finetune:
        cfg.HYBRIDNET.MAX_LEARNING_RATE = (
            float(cfg.HYBRIDNET.MAX_LEARNING_RATE) / 10.0
        )

    resume_from = _resolve_resume(resume, cfg, "HybridNet")
    if resume is not None and resume != "None" and resume_from is None:
        return False
    trainer = HybridNetTrainer(
        "train", cfg, weights=weights,
        efficienttrack_weights=weights_keypoint_detect,
        run_name=run_name, training_mode=mode,
    )
    results = trainer.train(train_set, val_set, num_epochs,
                            streamlitWidgets=streamlit_widgets,
                            resume_from=resume_from)
    return _report_final(results, "mm")


def get_latest_weights_path(project_name, module):
    project = ProjectManager()
    if not project.load(project_name):
        return None
    return get_latest_weights(project.get_cfg(), module)
