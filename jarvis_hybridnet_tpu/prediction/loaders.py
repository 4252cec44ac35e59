"""Build jitted predictors with resolved weights."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.efficienttrack import EfficientTrackBackbone
from ..models.hybridnet import HybridNetBackbone
from ..training.checkpoints import (
    load_efficienttrack_params,
    load_hybridnet_params,
)
from .predictor2d import build_predict2d
from .predictor3d import build_predict3d


def _dtype_from_cfg(cfg):
    name = str(cfg.get("TPU", {}).get("INFERENCE_DTYPE", "bfloat16"))
    return jnp.bfloat16 if name == "bfloat16" else jnp.float32


def _materialize(init_fn, *args, seed: int = 0, abstract: bool = False):
    """Param tree via real init (training) or eval_shape zeros (inference,
    where checkpoints overwrite everything anyway — avoids a full forward
    pass at build time)."""
    if abstract:
        shapes = jax.eval_shape(init_fn, jax.random.PRNGKey(0), *args)
        return jax.tree.map(
            lambda s: np.zeros(s.shape, s.dtype), shapes
        )["params"]
    # jitted: eager flax init dispatches every conv op-by-op on the host —
    # tens of seconds for the big backbones on a small CPU; the compiled
    # init graph lands in the persistent compilation cache instead.
    return jax.jit(init_fn)(jax.random.PRNGKey(seed), *args)["params"]


def init_efficienttrack_params(
    cfg, module: str, seed: int = 0, abstract: bool = False
) -> dict:
    sub = cfg[module.upper()]
    model = EfficientTrackBackbone(
        model_size=sub.MODEL_SIZE,
        output_channels=int(sub.NUM_JOINTS),
    )
    size = int(sub.IMAGE_SIZE if module == "CenterDetect"
               else cfg.KEYPOINTDETECT.BOUNDING_BOX_SIZE)
    x = jnp.zeros((1, size, size, 3), jnp.float32)
    return _materialize(model.init, x, seed=seed, abstract=abstract)


def init_hybridnet_params(
    cfg, seed: int = 0, abstract: bool = False
) -> dict:
    model = HybridNetBackbone(
        num_joints=int(cfg.KEYPOINTDETECT.NUM_JOINTS),
        model_size=cfg.KEYPOINTDETECT.MODEL_SIZE,
        roi_cube_size=int(cfg.HYBRIDNET.ROI_CUBE_SIZE),
        grid_spacing=int(cfg.HYBRIDNET.GRID_SPACING),
    )
    C = int(cfg.HYBRIDNET.NUM_CAMERAS)
    S = int(cfg.KEYPOINTDETECT.BOUNDING_BOX_SIZE)
    imgs = jnp.zeros((1, C, S, S, 3), jnp.float32)
    center_hm = jnp.full((1, C, 2), S // 2, jnp.int32)
    center3d = jnp.zeros((1, 3), jnp.int32)
    P = jnp.zeros((1, C, 4, 3), jnp.float32).at[:, :, 3, 2].set(1.0)
    K = jnp.eye(3)[None, None].repeat(C, 1).astype(jnp.float32) * 100.0
    D = jnp.zeros((1, C, 1, 5), jnp.float32)
    return _materialize(
        model.init, imgs, center_hm, center3d, P, K, D,
        seed=seed, abstract=abstract,
    )


def make_predictor2d(
    cfg,
    weights_center_detect: str = "latest",
    weights_keypoint_detect: str = "latest",
    dtype=None,
    mesh=None,
):
    """Fused 2D predictor. With ``mesh`` the cascade is jitted with the
    frame batch sharded over 'data' — multi-chip data-parallel 2D
    inference (frames are embarrassingly parallel)."""
    center = load_efficienttrack_params(
        cfg, "CenterDetect", weights_center_detect,
        init_params=init_efficienttrack_params(cfg, "CenterDetect",
                                               abstract=True),
    )
    keypoint = load_efficienttrack_params(
        cfg, "KeypointDetect", weights_keypoint_detect,
        init_params=init_efficienttrack_params(cfg, "KeypointDetect",
                                               abstract=True),
    )
    # explicit weights=None -> run from a real random init (the loader
    # returns None to mean "nothing to load")
    if center is None:
        center = init_efficienttrack_params(cfg, "CenterDetect")
    if keypoint is None:
        keypoint = init_efficienttrack_params(cfg, "KeypointDetect")
    if mesh is not None:
        from ..parallel.predict_step import build_sharded_predict2d

        return build_sharded_predict2d(
            cfg, center, keypoint, mesh=mesh,
            dtype=dtype or _dtype_from_cfg(cfg),
        )
    return build_predict2d(
        cfg, center, keypoint, dtype=dtype or _dtype_from_cfg(cfg)
    )


def make_predictor3d(
    cfg,
    rig,
    weights_center_detect: str = "latest",
    weights_hybridnet: str = "latest",
    dtype=None,
    mesh=None,
    shard_cameras: bool = False,
):
    """Fused 3D predictor. With ``mesh`` the cascade is jitted with
    shardings over it (framesets on 'data', optionally cameras on
    'cameras') — multi-chip data/camera-parallel inference."""
    center = load_efficienttrack_params(
        cfg, "CenterDetect", weights_center_detect,
        init_params=init_efficienttrack_params(cfg, "CenterDetect",
                                               abstract=True),
    )
    hybrid = load_hybridnet_params(
        cfg, weights_hybridnet,
        init_params=init_hybridnet_params(cfg, abstract=True),
    )
    if center is None:
        center = init_efficienttrack_params(cfg, "CenterDetect")
    if hybrid is None:
        hybrid = init_hybridnet_params(cfg)
    if mesh is not None:
        from ..parallel.predict_step import build_sharded_predict3d

        return build_sharded_predict3d(
            cfg, center, hybrid,
            rig.camera_matrices, rig.intrinsics, rig.distortions,
            mesh=mesh, dtype=dtype or _dtype_from_cfg(cfg),
            shard_cameras=shard_cameras,
        )
    return build_predict3d(
        cfg,
        center,
        hybrid,
        rig.camera_matrices,
        rig.intrinsics,
        rig.distortions,
        dtype=dtype or _dtype_from_cfg(cfg),
    )


def make_predictor3d_twophase(
    cfg,
    rig,
    full_size,
    weights_center_detect: str = "latest",
    weights_hybridnet: str = "latest",
    lowres_factor: int = 4,
    dtype=None,
):
    """(phase_a, phase_b, crop_fn) for the split streaming cascade
    (predictor3d.build_predict3d_twophase) with resolved weights."""
    from .predictor3d import build_predict3d_twophase

    center = load_efficienttrack_params(
        cfg, "CenterDetect", weights_center_detect,
        init_params=init_efficienttrack_params(cfg, "CenterDetect",
                                               abstract=True),
    )
    hybrid = load_hybridnet_params(
        cfg, weights_hybridnet,
        init_params=init_hybridnet_params(cfg, abstract=True),
    )
    if center is None:
        center = init_efficienttrack_params(cfg, "CenterDetect")
    if hybrid is None:
        hybrid = init_hybridnet_params(cfg)
    return build_predict3d_twophase(
        cfg, center, hybrid,
        rig.camera_matrices, rig.intrinsics, rig.distortions,
        full_size=full_size, lowres_factor=lowres_factor,
        dtype=dtype or _dtype_from_cfg(cfg),
    )
