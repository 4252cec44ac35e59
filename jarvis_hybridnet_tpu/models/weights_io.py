"""Weight import/export between reference ``.pth`` checkpoints and flax.

The reference stores plain ``state_dict`` checkpoints
(jarvis/efficienttrack/efficienttrack.py:399-401). This module converts them
to/from the flax param pytrees of EfficientTrackBackbone so existing JARVIS
projects and the pretrained model zoo load directly.

Layout conversions:
  * conv weight   (O, I, kH, kW)  ->  kernel (kH, kW, I, O)
  * depthwise     (C, 1, kH, kW)  ->  kernel (kH, kW, 1, C)
  * conv_transpose(I, O, kH, kW)  ->  kernel (kH, kW, I, O)
  * 3D conv       (O, I, kD, kH, kW) -> kernel (kD, kH, kW, I, O)

Dead reference parameters are dropped on import and synthesized on export:
``final_conv2`` / head ``gn1`` (model.py:98-110, unused in forward) and the
``_expand_conv`` of blocks with stage_idx < 4 (efficientnet.py:47-53,
created but bypassed in forward).
"""

from __future__ import annotations

import numpy as np

from .efficientnet import build_block_plan, truncate_and_tap
from .efficienttrack import MODEL_SIZES


def _conv_w(t) -> np.ndarray:
    return np.asarray(t).transpose(2, 3, 1, 0)


def _convT_w(t) -> np.ndarray:
    return np.asarray(t).transpose(2, 3, 1, 0)


def _conv3d_w(t) -> np.ndarray:
    return np.asarray(t).transpose(2, 3, 4, 1, 0)


def _convT3d_w(t) -> np.ndarray:
    return np.asarray(t).transpose(2, 3, 4, 1, 0)


def _set(tree: dict, path: tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value, dtype=np.float32)


def load_torch_state_dict(path: str) -> dict:
    """Load a ``.pth`` state dict as numpy arrays (torch runs on CPU)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


def efficienttrack_params_from_torch(
    state_dict: dict,
    model_size: str,
    num_joints: int | None = None,
    drop_head: bool = False,
) -> dict:
    """Convert a reference EfficientTrack state dict to flax params.

    ``drop_head`` mirrors the reference's head filtering when joint counts
    differ (efficienttrack.py:100-106): final_conv1 (and deconv1) are left
    at their existing values in the target tree by the caller.
    Returns a plain nested-dict param tree (pass to flax as ``{'params': t}``).
    """
    spec = MODEL_SIZES[model_size]
    _, full_blocks = build_block_plan(spec.compound_coef)
    blocks, _ = truncate_and_tap(full_blocks)

    p: dict = {}
    _set(p, ("weights_cat",), state_dict["weights_cat"])

    # --- backbone ---------------------------------------------------------
    _set(p, ("backbone_net", "_conv_stem", "kernel"),
         _conv_w(state_dict["backbone_net.model._conv_stem.weight"]))
    for i, b in enumerate(blocks):
        src = f"backbone_net.model._blocks.{i}."
        dst = ("backbone_net", f"_blocks_{i}")
        _set(p, dst + ("_depthwise_conv", "kernel"),
             _conv_w(state_dict[src + "_depthwise_conv.weight"]))
        if b.stage_idx >= 4 and b.expand != 1:
            _set(p, dst + ("_expand_conv", "kernel"),
                 _conv_w(state_dict[src + "_expand_conv.weight"]))
        if b.se_ratio:
            for se in ("_se_reduce", "_se_expand"):
                _set(p, dst + (se, "kernel"),
                     _conv_w(state_dict[src + se + ".weight"]))
                _set(p, dst + (se, "bias"), state_dict[src + se + ".bias"])
        _set(p, dst + ("_project_conv", "kernel"),
             _conv_w(state_dict[src + "_project_conv.weight"]))

    # --- BiFPN cells ------------------------------------------------------
    for i in range(spec.fpn_cell_repeats):
        src = f"bifpn.{i}."
        cell = f"bifpn_{i}"
        for wname in ("p6_w1", "p5_w1", "p4_w1", "p3_w1",
                      "p4_w2", "p5_w2", "p6_w2", "p7_w2"):
            _set(p, (cell, wname, "w"), state_dict[src + wname])
        for conv in ("conv6_up", "conv5_up", "conv4_up", "conv3_up",
                     "conv4_down", "conv5_down", "conv6_down", "conv7_down"):
            _set(p, (cell, conv, "depthwise_conv", "kernel"),
                 _conv_w(state_dict[src + conv + ".depthwise_conv.weight"]))
            _set(p, (cell, conv, "pointwise_conv", "kernel"),
                 _conv_w(state_dict[src + conv + ".pointwise_conv.weight"]))
            _set(p, (cell, conv, "pointwise_conv", "bias"),
                 state_dict[src + conv + ".pointwise_conv.bias"])
        if i == 0:
            for dc in ("p3_down_channel", "p4_down_channel", "p5_down_channel",
                       "p5_to_p6", "p4_down_channel_2", "p5_down_channel_2"):
                _set(p, (cell, dc, "conv", "kernel"),
                     _conv_w(state_dict[src + dc + ".0.weight"]))
                _set(p, (cell, dc, "conv", "bias"),
                     state_dict[src + dc + ".0.bias"])

    # --- head -------------------------------------------------------------
    _set(p, ("first_conv", "depthwise_conv", "kernel"),
         _conv_w(state_dict["first_conv.depthwise_conv.weight"]))
    _set(p, ("first_conv", "pointwise_conv", "kernel"),
         _conv_w(state_dict["first_conv.pointwise_conv.weight"]))
    _set(p, ("first_conv", "pointwise_conv", "bias"),
         state_dict["first_conv.pointwise_conv.bias"])

    head_joints = state_dict["final_conv1.weight"].shape[0]
    if not (drop_head and num_joints is not None and head_joints != num_joints):
        _set(p, ("deconv1", "kernel"), _convT_w(state_dict["deconv1.weight"]))
        _set(p, ("final_conv1", "kernel"),
             _conv_w(state_dict["final_conv1.weight"]))
    return p


def efficienttrack_params_to_torch(params: dict, model_size: str) -> dict:
    """Convert flax params back to a reference-compatible state dict.

    Dead reference parameters (``final_conv2``, idx<4 ``_expand_conv``) are
    synthesized as zeros so ``load_state_dict(strict=True)`` succeeds.
    """
    spec = MODEL_SIZES[model_size]
    _, full_blocks = build_block_plan(spec.compound_coef)
    blocks, _ = truncate_and_tap(full_blocks)

    def cw(path):
        node = params
        for k in path:
            node = node[k]
        return np.asarray(node)

    sd: dict = {}
    sd["weights_cat"] = cw(("weights_cat",))
    sd["backbone_net.model._conv_stem.weight"] = cw(
        ("backbone_net", "_conv_stem", "kernel")).transpose(3, 2, 0, 1)
    for i, b in enumerate(blocks):
        dst = f"backbone_net.model._blocks.{i}."
        src = ("backbone_net", f"_blocks_{i}")
        sd[dst + "_depthwise_conv.weight"] = cw(
            src + ("_depthwise_conv", "kernel")).transpose(3, 2, 0, 1)
        if b.expand != 1:
            if b.stage_idx >= 4:
                sd[dst + "_expand_conv.weight"] = cw(
                    src + ("_expand_conv", "kernel")).transpose(3, 2, 0, 1)
            else:  # dead parameter in the reference architecture
                sd[dst + "_expand_conv.weight"] = np.zeros(
                    (b.in_filters * b.expand, b.in_filters, 1, 1), np.float32)
        if b.se_ratio:
            for se in ("_se_reduce", "_se_expand"):
                sd[dst + se + ".weight"] = cw(
                    src + (se, "kernel")).transpose(3, 2, 0, 1)
                sd[dst + se + ".bias"] = cw(src + (se, "bias"))
        sd[dst + "_project_conv.weight"] = cw(
            src + ("_project_conv", "kernel")).transpose(3, 2, 0, 1)

    for i in range(spec.fpn_cell_repeats):
        dst = f"bifpn.{i}."
        cell = f"bifpn_{i}"
        for wname in ("p6_w1", "p5_w1", "p4_w1", "p3_w1",
                      "p4_w2", "p5_w2", "p6_w2", "p7_w2"):
            sd[dst + wname] = cw((cell, wname, "w"))
        for conv in ("conv6_up", "conv5_up", "conv4_up", "conv3_up",
                     "conv4_down", "conv5_down", "conv6_down", "conv7_down"):
            sd[dst + conv + ".depthwise_conv.weight"] = cw(
                (cell, conv, "depthwise_conv", "kernel")).transpose(3, 2, 0, 1)
            sd[dst + conv + ".pointwise_conv.weight"] = cw(
                (cell, conv, "pointwise_conv", "kernel")).transpose(3, 2, 0, 1)
            sd[dst + conv + ".pointwise_conv.bias"] = cw(
                (cell, conv, "pointwise_conv", "bias"))
        if i == 0:
            for dc in ("p3_down_channel", "p4_down_channel", "p5_down_channel",
                       "p5_to_p6", "p4_down_channel_2", "p5_down_channel_2"):
                sd[dst + dc + ".0.weight"] = cw(
                    (cell, dc, "conv", "kernel")).transpose(3, 2, 0, 1)
                sd[dst + dc + ".0.bias"] = cw((cell, dc, "conv", "bias"))

    sd["first_conv.depthwise_conv.weight"] = cw(
        ("first_conv", "depthwise_conv", "kernel")).transpose(3, 2, 0, 1)
    sd["first_conv.pointwise_conv.weight"] = cw(
        ("first_conv", "pointwise_conv", "kernel")).transpose(3, 2, 0, 1)
    sd["first_conv.pointwise_conv.bias"] = cw(
        ("first_conv", "pointwise_conv", "bias"))
    sd["deconv1.weight"] = cw(("deconv1", "kernel")).transpose(3, 2, 0, 1)
    final1 = cw(("final_conv1", "kernel"))
    sd["final_conv1.weight"] = final1.transpose(3, 2, 0, 1)
    sd["final_conv2.weight"] = np.zeros(
        (final1.shape[3], final1.shape[2], 1, 1), np.float32)
    return sd


# Mapping: flax module path -> (torch prefix, kind). Torch Sequential
# layouts per reference jarvis/hybridnet/v2vnet.py: Basic3DBlock.block =
# [Conv3d, IN, ReLU]; Res3DBlock.res_branch = [Conv3d, IN, ReLU, Conv3d, IN];
# Upsample3DBlock.block = [ConvT3d, IN, ReLU].
_V2V_MAP = {
    ("front_basic", "conv"): ("front_layers.0.block.0", "conv3d"),
    ("front_res", "conv1"): ("front_layers.1.res_branch.0", "conv3d"),
    ("front_res", "conv2"): ("front_layers.1.res_branch.3", "conv3d"),
    ("skip_res1", "conv1"): ("encoder_decoder.skip_res1.res_branch.0", "conv3d"),
    ("skip_res1", "conv2"): ("encoder_decoder.skip_res1.res_branch.3", "conv3d"),
    ("encoder_pool1", "conv"): ("encoder_decoder.encoder_pool1.block.0", "conv3d"),
    ("mid_res", "conv1"): ("encoder_decoder.mid_res.res_branch.0", "conv3d"),
    ("mid_res", "conv2"): ("encoder_decoder.mid_res.res_branch.3", "conv3d"),
    ("decoder_upsample1", "deconv"): (
        "encoder_decoder.decoder_upsample1.block.0", "convT3d"),
    ("decoder_res1", "conv1"): (
        "encoder_decoder.decoder_res1.res_branch.0", "conv3d"),
    ("decoder_res1", "conv2"): (
        "encoder_decoder.decoder_res1.res_branch.3", "conv3d"),
    ("output_layer",): ("output_layer", "conv3d"),
}


def v2v_params_from_torch(state_dict: dict, prefix: str = "") -> dict:
    """Convert a reference V2VNet state dict (optionally prefixed, e.g.
    ``v2vNet.``) to flax params for :class:`models.v2v.V2VNet`."""
    p: dict = {}
    for flax_path, (torch_prefix, kind) in _V2V_MAP.items():
        w = state_dict[prefix + torch_prefix + ".weight"]
        b = state_dict[prefix + torch_prefix + ".bias"]
        wconv = _convT3d_w(w) if kind == "convT3d" else _conv3d_w(w)
        _set(p, flax_path + ("kernel",), wconv)
        _set(p, flax_path + ("bias",), b)
    return p


def v2v_params_to_torch(params: dict, prefix: str = "") -> dict:
    sd: dict = {}
    for flax_path, (torch_prefix, kind) in _V2V_MAP.items():
        node = params
        for k in flax_path:
            node = node[k]
        w = np.asarray(node["kernel"])
        if kind == "convT3d":  # (kD,kH,kW,O,I) -> (I,O,kD,kH,kW)
            sd[prefix + torch_prefix + ".weight"] = w.transpose(4, 3, 0, 1, 2)
        else:  # (kD,kH,kW,I,O) -> (O,I,kD,kH,kW)
            sd[prefix + torch_prefix + ".weight"] = w.transpose(4, 3, 0, 1, 2)
        sd[prefix + torch_prefix + ".bias"] = np.asarray(node["bias"])
    return sd


def hybridnet_params_from_torch(state_dict: dict, model_size: str) -> dict:
    """Convert a reference HybridNetBackbone state dict (keys ``effTrack.*``
    and ``v2vNet.*``, jarvis/hybridnet/model.py:20-51) to flax params for
    :class:`models.hybridnet.HybridNetBackbone`."""
    et_sd = {k[len("effTrack."):]: v for k, v in state_dict.items()
             if k.startswith("effTrack.")}
    return {
        "effTrack": efficienttrack_params_from_torch(et_sd, model_size),
        "v2vNet": v2v_params_from_torch(state_dict, prefix="v2vNet."),
    }


def hybridnet_params_to_torch(params: dict, model_size: str) -> dict:
    sd = {}
    for k, v in efficienttrack_params_to_torch(
        params["effTrack"], model_size
    ).items():
        sd["effTrack." + k] = v
    sd.update(v2v_params_to_torch(params["v2vNet"], prefix="v2vNet."))
    return sd


def merge_params(target: dict, loaded: dict) -> dict:
    """Recursively overlay ``loaded`` onto ``target`` (strict=False load)."""
    out = dict(target)
    for k, v in loaded.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = merge_params(out[k], v)
        else:
            out[k] = v
    return out
