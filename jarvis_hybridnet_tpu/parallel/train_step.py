"""Sharded training steps (pjit over a device mesh).

Data parallelism: framesets sharded over the 'data' mesh axis, params and
optimizer state replicated; XLA/GSPMD inserts the gradient all-reduce over
ICI. The camera axis of the multi-view input can additionally be sharded
over the 'cameras' axis (the natural "sequence-parallel" analog of this
workload — SURVEY.md §5), which shards the per-camera 2D network pass and
turns the reprojection layer's camera-mean into a cross-chip reduction.
"""

from __future__ import annotations


import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.hybridnet import hybridnet_mse_loss


def make_hybridnet_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    shard_cameras: bool = False,
    mean: tuple = (0.485, 0.456, 0.406),
    std: tuple = (0.229, 0.224, 0.225),
):
    """Returns jitted ``step(params, opt_state, rng, batch) ->
    (params, opt_state, loss)`` with dp (+ optional camera) shardings.

    Batch contract matches Trainer3D's thin host↔device layout
    (training/trainer3d.py): ``imgs`` ship raw (uint8 or 0..255 float)
    and are /255 + mean/std normalized inside the step (same fused
    prepare as Trainer3D's production step — reference
    jarvis/dataset/dataset2D.py:272-281 Normalizer); the GT volume
    ships as ``kp_vox``/``keypoints3D``, rendered on device
    (ops/heatmap.gaussian_heatmaps_3d_on_device)."""
    import jax.numpy as jnp

    from ..ops.heatmap import gaussian_heatmaps_3d_on_device

    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)

    g2 = int(model.roi_cube_size / model.grid_spacing / 2)
    repl = NamedSharding(mesh, P())
    cam_axis = "cameras" if shard_cameras else None
    batch_shardings = {
        "imgs": NamedSharding(mesh, P("data", cam_axis)),
        "center_hm": NamedSharding(mesh, P("data", cam_axis)),
        "center3d": NamedSharding(mesh, P("data")),
        "kp_vox": NamedSharding(mesh, P("data")),
        "keypoints3D": NamedSharding(mesh, P("data")),
        "camera_matrices": NamedSharding(mesh, P("data", cam_axis)),
        "intrinsics": NamedSharding(mesh, P("data", cam_axis)),
        "distortions": NamedSharding(mesh, P("data", cam_axis)),
    }

    def step(params, opt_state, rng, batch):
        x = (batch["imgs"].astype(jnp.float32) / 255.0 - mean) / std
        gt = gaussian_heatmaps_3d_on_device(
            batch["kp_vox"], batch["keypoints3D"], g2)

        def loss_fn(p):
            hm_final, _, _, _ = model.apply(
                {"params": p},
                x, batch["center_hm"], batch["center3d"],
                batch["camera_matrices"], batch["intrinsics"],
                batch["distortions"],
                deterministic=False, rngs={"dropout": rng},
            )
            return hybridnet_mse_loss(hm_final, gt)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(
        step,
        in_shardings=(repl, repl, repl, batch_shardings),
        out_shardings=(repl, repl, repl),
    )
