"""Misc utilities (reference: jarvis/utils/utils.py:11-31)."""

from __future__ import annotations

import os

from .clp import CLIColors  # re-export for compatibility

__all__ = ["CLIColors", "get_available_pretrains", "list_run_dirs",
           "latest_run_dir"]


def list_run_dirs(root: str, newest_first: bool = True) -> list[str]:
    """Run names (prediction/analysis output dirs) under ``root``, sorted
    by mtime. Non-directories are skipped: a stray file (log, .DS_Store,
    leftover ``.partNNNNN`` shard) must never be offered as — or resolve
    'latest' to — a run. Shared by every frontend so 'latest' means the
    same thing in the CLI, GUI and interactive CLI."""
    if not os.path.isdir(root):
        return []
    runs = sorted(
        (d for d in os.listdir(root)
         if os.path.isdir(os.path.join(root, d))),
        key=lambda d: os.path.getmtime(os.path.join(root, d)),
        reverse=newest_first,
    )
    return runs


def latest_run_dir(root: str) -> str | None:
    """Full path of the newest run dir under ``root``, or None."""
    runs = list_run_dirs(root)
    return os.path.join(root, runs[0]) if runs else None


def get_available_pretrains(parent_dir: str) -> list[str]:
    """Named pose pretrains = subdirs of pretrained/ containing at least
    one .pth or .ckpt (reference: jarvis/utils/utils.py:23-31)."""
    pretrain_dir = os.path.join(parent_dir, "pretrained")
    if not os.path.isdir(pretrain_dir):
        return []
    out = []
    for d in sorted(os.listdir(pretrain_dir)):
        full = os.path.join(pretrain_dir, d)
        if d == "EcoSet" or not os.path.isdir(full):
            continue
        if any(f.endswith((".pth", ".ckpt")) for f in os.listdir(full)):
            out.append(d)
    return out
