"""Sharded multi-chip inference.

Shards the fused predict3D cascade over a device mesh. Two axes:

* ``data``: framesets (the time batch) — each chip processes its shard of
  T with zero cross-chip communication on the hot path.
* ``cameras`` (optional): the camera axis of the multi-view pass. The
  per-camera 2D network then runs C/n_cam cameras per chip, the tiny
  per-frameset DLT sees an all-gather of the (T, C, 2) center predictions,
  and the reprojection layer's camera-mean becomes a cross-chip reduction
  riding ICI — all inserted by GSPMD from the in_shardings alone. This is
  the axis where extra chips help most: the voxel gather (the dominant
  stage, see BASELINE.md) is linear in cameras.

The reference is single-GPU; this is new TPU-native capability
(SURVEY.md §2 parallelism checklist).
"""

from __future__ import annotations

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..prediction.predictor2d import build_predict2d
from ..prediction.predictor3d import build_predict3d


def build_sharded_predict2d(
    cfg,
    center_params,
    keypoint_params,
    mesh: Mesh,
    dtype=None,
):
    """Data-parallel single-camera 2D cascade: imgs (T, H, W, 3) sharded
    on T over 'data', outputs replicated. Each chip runs its frame shard
    fully independently (the 2D cascade has no cross-frame coupling), so
    the only collective is the output all-gather."""
    import jax.numpy as jnp

    fn = build_predict2d(
        cfg, center_params, keypoint_params,
        dtype=dtype or jnp.bfloat16, jit=False,
    )
    data_in = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    from ..prediction.export import wrap_predictor

    return wrap_predictor(
        fn, {"center": center_params, "keypoint": keypoint_params},
        in_shardings=(repl, data_in), out_shardings=(repl, repl, repl),
        params_sharding=repl,
    )


def build_sharded_predict3d(
    cfg,
    center_params,
    hybridnet_params,
    camera_matrices,
    intrinsics,
    distortions,
    mesh: Mesh,
    dtype=None,
    shard_cameras: bool = False,
):
    """Like prediction.predictor3d.build_predict3d but jitted with
    shardings over ``mesh``: imgs (T, C, H, W, 3) sharded on T over 'data'
    (and on C over 'cameras' when ``shard_cameras``); outputs gathered
    replicated. T must be divisible by the data axis size (and C by the
    cameras axis size when sharded)."""
    import jax.numpy as jnp

    fn = build_predict3d(
        cfg, center_params, hybridnet_params,
        camera_matrices, intrinsics, distortions,
        dtype=dtype or jnp.bfloat16, jit=False,
    )
    cam_axis = "cameras" if shard_cameras else None
    data_in = NamedSharding(mesh, P("data", cam_axis))
    repl = NamedSharding(mesh, P())
    from ..prediction.export import wrap_predictor

    return wrap_predictor(
        fn, {"center": center_params, "hybrid": hybridnet_params},
        in_shardings=(repl, data_in), out_shardings=(repl, repl, repl),
        params_sharding=repl,
    )
