"""Checkpoint saving/loading and reference-compatible weight resolution.

Mirrors the reference's weight-spec conventions
(jarvis/efficienttrack/efficienttrack.py:90-183, train_interface.py:22-50):

  * a filesystem path          -> loaded directly (.pth or .ckpt)
  * 'latest'                   -> newest run dir (by mtime) under
                                  projects/<p>/models/<module>/ containing a
                                  final checkpoint
  * 'ecoset' / a pretrain name -> pretrained/<name>/EfficientTrack_*.pth
  * None                       -> random initialization

Native checkpoints are msgpack-serialized flax pytrees (.ckpt); reference
``.pth`` state dicts are imported via models.weights_io, and ``.pth`` export
is offered for round-tripping back into the reference.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
from flax import serialization

from ..models import weights_io
from ..utils import clp


def save_checkpoint(params: Any, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_checkpoint(path: str, target: Any = None) -> Any:
    with open(path, "rb") as f:
        data = f.read()
    if target is not None:
        return serialization.from_bytes(target, data)
    return serialization.msgpack_restore(data)


def save_train_state(path: str, params: Any, opt_state: Any,
                     epoch: int) -> None:
    """Full training state (params + optimizer + epoch) for mid-run resume.

    The reference only checkpoints model weights and cannot resume
    optimizer/schedule state (efficienttrack.py:226 'TODO'); this is new
    capability.
    """
    state = {
        "params": params,
        "opt_state": serialization.to_state_dict(opt_state),
        "epoch": epoch,
    }
    save_checkpoint(state, path)


def load_train_state(path: str, opt_state_target: Any = None):
    """Returns (params, opt_state, epoch); opt_state is restored onto
    ``opt_state_target`` when given (required to recover namedtuple
    structure), else returned as a raw state dict."""
    state = load_checkpoint(path)
    opt_state = state["opt_state"]
    if opt_state_target is not None:
        opt_state = serialization.from_state_dict(opt_state_target, opt_state)
    return state["params"], opt_state, int(state["epoch"])


def save_torch_checkpoint(params: dict, path: str, model_size: str,
                          kind: str = "efficienttrack") -> None:
    """Export a flax param tree as a reference-loadable .pth state dict."""
    import torch

    if kind == "efficienttrack":
        sd = weights_io.efficienttrack_params_to_torch(params, model_size)
    else:
        sd = weights_io.hybridnet_params_to_torch(params, model_size)
    tensors = {k: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in sd.items()}
    os.makedirs(os.path.dirname(path), exist_ok=True)
    torch.save(tensors, path)


def _latest_run_file(search_path: str, final_names: list[str]) -> str | None:
    """Newest run dir (mtime-sorted) containing a final checkpoint
    (reference: efficienttrack.py:165-183)."""
    if not os.path.isdir(search_path):
        return None
    dirs = [os.path.join(search_path, d) for d in os.listdir(search_path)]
    dirs = [d for d in dirs if os.path.isdir(d)]
    dirs.sort(key=os.path.getmtime, reverse=True)
    for d in dirs:
        for name in final_names:
            p = os.path.join(d, name)
            if os.path.isfile(p):
                return p
    return None


def get_latest_weights(cfg, module: str) -> str | None:
    """module in {'CenterDetect', 'KeypointDetect', 'HybridNet'}."""
    sub_cfg = cfg[module.upper()] if module != "HybridNet" else cfg.KEYPOINTDETECT
    size = sub_cfg.MODEL_SIZE
    search = os.path.join(
        cfg.PARENT_DIR, "projects", cfg.PROJECT_NAME, "models", module
    )
    if module == "HybridNet":
        names = [f"HybridNet-{size}_final.ckpt", f"HybridNet-{size}_final.pth"]
    else:
        names = [
            f"EfficientTrack-{size}_final.ckpt",
            f"EfficientTrack-{size}_final.pth",
        ]
    return _latest_run_file(search, names)


def get_latest_train_state(cfg, module: str) -> str | None:
    """Newest run's resumable ``train_state.ckpt`` (periodic epoch saves
    and the preemption path both write it). module in {'CenterDetect',
    'KeypointDetect', 'HybridNet'}."""
    search = os.path.join(
        cfg.PARENT_DIR, "projects", cfg.PROJECT_NAME, "models", module
    )
    return _latest_run_file(search, ["train_state.ckpt"])


def load_efficienttrack_params(
    cfg,
    module: str,  # 'CenterDetect' or 'KeypointDetect'
    weights: str | None,
    init_params: dict | None = None,
) -> dict | None:
    """Resolve + load EfficientTrack weights into a flax param tree.

    ``init_params`` (a randomly initialized tree) is required for partial
    loads (pretrains with differing head joints) and returned updated.
    Returns None when ``weights`` is None (caller keeps random init).
    """
    sub_cfg = cfg[module.upper()]
    size = sub_cfg.MODEL_SIZE
    num_joints = int(sub_cfg.NUM_JOINTS)

    path = weights
    is_ecoset = weights in ("ecoset", "EcoSet")
    if weights == "latest":
        path = get_latest_weights(cfg, module)
        if path is None:
            # reference behavior: warn and proceed from random init
            # (train_interface.py:92-97)
            clp.warning("Could not find previously saved weights, "
                        "using random initialization instead")
            return init_params
    elif is_ecoset:
        path = os.path.join(cfg.PARENT_DIR, "pretrained", "EcoSet",
                            f"EfficientTrack-{size}.pth")
    elif weights is not None and not os.path.isfile(weights):
        # a pose-pretrain name (reference: efficienttrack.py:138-162)
        prefix = ("EfficientTrack_Center" if module == "CenterDetect"
                  else "EfficientTrack_Keypoints")
        cand = os.path.join(cfg.PARENT_DIR, "pretrained", weights,
                            f"{prefix}-{size}.pth")
        if os.path.isfile(cand):
            path = cand

    if path is None:
        return None
    if not os.path.isfile(path):
        clp.warning(f"Could not load weights: {path}")
        return None

    if path.endswith(".pth"):
        sd = weights_io.load_torch_state_dict(path)
        loaded = weights_io.efficienttrack_params_from_torch(
            sd, size, num_joints=num_joints, drop_head=True
        )
        if is_ecoset:
            # the reference re-initializes final_conv1 and the merge head's
            # pointwise conv when transferring from EcoSet
            # (efficienttrack.py:125-129); the depthwise conv is kept
            loaded.pop("final_conv1", None)
            if "first_conv" in loaded:
                loaded["first_conv"].pop("pointwise_conv", None)
    else:
        loaded = load_checkpoint(path)
    clp.info(f"Successfully loaded weights: {path}")
    if init_params is not None:
        return weights_io.merge_params(init_params, loaded)
    return loaded


def load_hybridnet_params(
    cfg,
    weights: str | None,
    init_params: dict | None = None,
    efficienttrack_weights: str | None = None,
) -> dict | None:
    """Resolve + load HybridNet weights (optionally seeding the embedded
    2D net from a KeypointDetect checkpoint, train_interface.py:166-179)."""
    size = cfg.KEYPOINTDETECT.MODEL_SIZE
    params = init_params

    if efficienttrack_weights is not None and params is not None:
        et = load_efficienttrack_params(
            cfg, "KeypointDetect", efficienttrack_weights,
            init_params=params.get("effTrack"),
        )
        if et is not None:
            params = dict(params)
            params["effTrack"] = et

    path = weights
    if weights == "latest":
        path = get_latest_weights(cfg, "HybridNet")
        if path is None:
            clp.warning("No saved HybridNet weights found.")
            return params
    elif weights is not None and not os.path.isfile(weights):
        cand = os.path.join(cfg.PARENT_DIR, "pretrained", weights,
                            f"HybridNet-{size}.pth")
        if os.path.isfile(cand):
            path = cand

    if path is None:
        return params
    if not os.path.isfile(path):
        # an explicitly requested checkpoint that does not exist is an
        # error (reference aborts, train_interface.py:196-199)
        clp.warning(f"Could not load HybridNet weights: {path}")
        return None

    if path.endswith(".pth"):
        sd = weights_io.load_torch_state_dict(path)
        loaded = weights_io.hybridnet_params_from_torch(sd, size)
    else:
        loaded = load_checkpoint(path)
    clp.info(f"Loaded HybridNet weights: {path}")
    if init_params is not None:
        return weights_io.merge_params(init_params, loaded)
    return loaded
