"""Misc utilities (reference: jarvis/utils/utils.py:11-31)."""

from __future__ import annotations

import os

from .clp import CLIColors  # re-export for compatibility

__all__ = ["CLIColors", "get_available_pretrains"]


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
