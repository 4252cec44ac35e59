"""Sharded multi-chip inference.

Shards the fused predict3D cascade over a device mesh: framesets ride the
'data' axis (each chip processes its shard of the time batch with all
cameras — the per-frameset DLT/crop logic is local), params are replicated.
On a pod slice this turns the streaming pipeline into data-parallel
inference with zero cross-chip communication on the hot path.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..prediction.predictor3d import build_predict3d


def build_sharded_predict3d(
    cfg,
    center_params,
    hybridnet_params,
    camera_matrices,
    intrinsics,
    distortions,
    mesh: Mesh,
    dtype=None,
):
    """Like prediction.predictor3d.build_predict3d but jitted with
    shardings over ``mesh``: imgs (T, C, H, W, 3) sharded on T over 'data';
    outputs gathered replicated. T must be divisible by the data axis."""
    import jax.numpy as jnp

    base = build_predict3d(
        cfg, center_params, hybridnet_params,
        camera_matrices, intrinsics, distortions,
        dtype=dtype or jnp.bfloat16,
    )
    # unwrap the inner function from its single-device jit and re-jit with
    # shardings (jit-of-jit composes, but explicit shardings on the outer
    # jit are what drive GSPMD)
    inner = base.__wrapped__

    data_in = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        inner,
        in_shardings=(data_in,),
        out_shardings=(repl, repl, repl),
    )
