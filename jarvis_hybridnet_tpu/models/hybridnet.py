"""HybridNet 3D backbone (flax, batched).

Re-implements the reference HybridNetBackbone
(jarvis/hybridnet/model.py:20-90): run KeypointDetect on all camera crops as
one batch, zero-pad the stride-2 heatmaps by 1 px, reproject into the voxel
grid, refine with V2VNet, and decode 3D joints by soft-argmax over the voxel
heatmaps.

Reference quirks replicated on purpose:
  * the voxel volume is divided by 255 before V2V (model.py:72);
  * Softplus is applied once before the soft-argmax and a second time to
    the returned volume (model.py:73,88) — the training loss therefore sees
    a double-Softplus while the points come from a single one;
  * world coords: ``pts * spacing * 2 - cube/2 + center3D`` (model.py:86-87);
  * confidences = clamp(max voxel, 255)/255 (model.py:84-85).

Unlike the reference this forward is fully batched (the reference only
processes batch element 0 through its repro layer).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from flax import linen as nn

from .efficienttrack import EfficientTrackBackbone
from .repro import reprojection_layer
from .v2v import V2VNet


class HybridNetBackbone(nn.Module):
    num_joints: int
    model_size: str
    roi_cube_size: int  # mm
    grid_spacing: int  # mm
    dtype: jnp.dtype = jnp.float32
    repro_mode: str = "exact"  # see repro.reprojection_layer

    @nn.compact
    def __call__(
        self,
        imgs: jnp.ndarray,  # (B, C, S, S, 3) normalized crops, NHWC per cam
        center_hm: jnp.ndarray,  # (B, C, 2) int crop centers (full-res px)
        center3d: jnp.ndarray,  # (B, 3) int cube centers (mm)
        camera_matrices: jnp.ndarray,  # (B, C, 4, 3)
        intrinsics: jnp.ndarray,  # (B, C, 3, 3)
        distortions: jnp.ndarray,  # (B, C, 1, 5)
        deterministic: bool = True,
    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        B, C, S = imgs.shape[0], imgs.shape[1], imgs.shape[2]
        grid_size = int(self.roi_cube_size / self.grid_spacing)

        # 2D stage over all cameras as one batch (model.py:57-58)
        flat = imgs.reshape(B * C, S, S, imgs.shape[-1])
        _, heatmaps = EfficientTrackBackbone(
            model_size=self.model_size,
            output_channels=self.num_joints,
            dtype=self.dtype,
            name="effTrack",
        )(flat, deterministic=deterministic)
        # NHWC -> (B, C, J, h, w), zero-pad 1 px (model.py:65-66)
        h = heatmaps.shape[1]
        heatmaps = heatmaps.transpose(0, 3, 1, 2).reshape(
            B, C, self.num_joints, h, h
        )
        heatmaps = jnp.pad(
            heatmaps, ((0, 0), (0, 0), (0, 0), (1, 1), (1, 1))
        )

        voxels = reprojection_layer(
            heatmaps.astype(jnp.float32),
            center3d,
            center_hm,
            camera_matrices,
            intrinsics,
            distortions,
            grid_size,
            float(self.grid_spacing),
            mode=self.repro_mode,
            # bf16 rows halve the HBM-random-read cost of the gather (the
            # dominant stage); 'exact' mode stays float32 (see repro.py)
            gather_dtype=(self.dtype if self.repro_mode != "exact"
                          else None),
        )  # (B, G, G, G, J) — already the V2V layout

        vol = (voxels / 255.0).astype(self.dtype)
        out = V2VNet(
            self.num_joints, dtype=self.dtype,
            fused_upsample_front=self.repro_mode in (
                "half_fused", "quarter_fused"),
            name="v2vNet",
        )(vol, deterministic=deterministic)
        out = jax.nn.softplus(out.astype(jnp.float32))  # (B, g, g, g, J)

        # Soft-argmax (model.py:76-83); grid coords over the half-res output
        g = out.shape[1]
        coords = jnp.arange(g, dtype=jnp.float32)
        norm = jnp.sum(out, axis=(1, 2, 3))  # (B, J)
        x = jnp.einsum("bxyzj,x->bj", out, coords) / norm
        y = jnp.einsum("bxyzj,y->bj", out, coords) / norm
        z = jnp.einsum("bxyzj,z->bj", out, coords) / norm
        points = jnp.stack([x, y, z], axis=-1)  # (B, J, 3)
        points3d = (
            points * self.grid_spacing * 2.0
            - self.roi_cube_size / 2.0
            + center3d[:, None, :].astype(jnp.float32)
        )

        maxvals = jnp.max(out.reshape(B, -1, self.num_joints), axis=1)  # (B, J)
        confidences = jnp.clip(maxvals, max=255.0) / 255.0

        heatmap_final = jax.nn.softplus(out)  # double-Softplus (model.py:88)
        return heatmap_final, heatmaps, points3d, confidences


def hybridnet_mse_loss(
    pred_heatmaps: jnp.ndarray,  # (B, g, g, g, J) — double-Softplus output
    gt_heatmaps: jnp.ndarray,  # (B, g, g, g, J)
) -> jnp.ndarray:
    """Reference MSELoss (jarvis/hybridnet/loss.py:11-22): sum over
    (batch, joint) of per-joint mean squared voxel error, skipping joints
    whose GT volume sums to <= 1 (unlabeled)."""
    sq = jnp.mean(
        jnp.square(pred_heatmaps - gt_heatmaps), axis=(1, 2, 3)
    )  # (B, J)
    valid = jnp.sum(gt_heatmaps, axis=(1, 2, 3)) > 1.0
    return jnp.sum(jnp.where(valid, sq, 0.0))
