"""Voxel reprojection layer (pure jnp, batched).

TPU-native re-implementation of the reference ReprojectionLayer
(jarvis/hybridnet/repro_layer.py:11-119), the geometric core of HybridNet:
project every voxel of a cube centered on the subject into every camera,
gather the 2D keypoint-heatmap values at those pixels, and average over
cameras to build a (J, G, G, G) voxel volume per joint.

The reference's numerics are replicated bit-carefully because the <2 mm
fidelity target depends on them:
  * voxel centers are computed on a *half-resolution* grid
    ((G/2)^3 points, spacing 2*GRID_SPACING, centered: (i - G/4)) and the
    two pixel-index maps are upsampled to G^3 with trilinear interpolation
    (align_corners=False), not recomputed (repro_layer.py:26-36, 70-80);
  * projected coordinates are clamped to the crop window
    [centerHM - (hs-1), centerHM + hs-2] then shifted to crop-local
    coordinates (repro_layer.py:65-68), hs = BOUNDING_BOX_SIZE/2 + 2
    (the stride-2 heatmap padded by 1 px on each side);
  * the final integer index is (v/2).int()*hs + (u/2).int()
    (repro_layer.py:82-83) — truncation, which equals floor here since the
    clamp guarantees non-negative values.

Unlike the reference (which processes only batch element 0,
repro_layer.py:113), this implementation is fully batched via vmap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.reprojection import _HIGHEST


def half_grid_offsets(grid_size: int, grid_spacing: float) -> np.ndarray:
    """(G/2, G/2, G/2, 3) voxel-center offsets around the cube center."""
    g2 = grid_size // 2
    half = g2 // 2
    r = np.arange(g2, dtype=np.float32) - half
    xx, yy, zz = np.meshgrid(r, r, r, indexing="ij")
    return np.stack([xx, yy, zz], axis=-1) * (grid_spacing * 2.0)


@functools.lru_cache(maxsize=None)
def _upsample2_weights(out_size: int, in_size: int):
    """Static index/weight arrays for 1D linear upsampling, matching torch
    F.interpolate(mode='trilinear', align_corners=False) per axis."""
    i = np.arange(out_size, dtype=np.float64)
    s = np.maximum((i + 0.5) * (in_size / out_size) - 0.5, 0.0)
    i0 = np.floor(s).astype(np.int32)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w1 = (s - i0).astype(np.float32)
    return i0, i1, w1


def _upsample_axis(x: jnp.ndarray, axis: int, out_size: int) -> jnp.ndarray:
    i0, i1, w1 = _upsample2_weights(out_size, x.shape[axis])
    a = jnp.take(x, jnp.asarray(i0), axis=axis)
    b = jnp.take(x, jnp.asarray(i1), axis=axis)
    w = jnp.asarray(w1)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w = w.reshape(shape)
    return a * (1.0 - w) + b * w


def upsample_trilinear(x: jnp.ndarray, out: int) -> jnp.ndarray:
    """Trilinear upsample of the trailing three axes of (..., D, H, W)."""
    x = _upsample_axis(x, x.ndim - 3, out)
    x = _upsample_axis(x, x.ndim - 2, out)
    x = _upsample_axis(x, x.ndim - 1, out)
    return x


def reproject_indices(
    center3d: jnp.ndarray,  # (3,) cube center (mm, already grid-snapped ints)
    center_hm: jnp.ndarray,  # (C, 2) crop centers in full-res pixels
    camera_matrices: jnp.ndarray,  # (C, 4, 3)
    intrinsics: jnp.ndarray,  # (C, 3, 3)
    distortions: jnp.ndarray,  # (C, 1, 5)
    grid_size: int,
    grid_spacing: float,
    heatmap_size: int,  # hs = BOUNDING_BOX_SIZE/2 + 2
) -> jnp.ndarray:
    """Flat pixel indices (C, G, G, G) into each camera's padded heatmap."""
    g2 = grid_size // 2
    offsets = jnp.asarray(half_grid_offsets(grid_size, grid_spacing))
    grid = offsets + center3d.astype(jnp.float32)  # (g2, g2, g2, 3)
    flat = grid.reshape(-1, 3)
    hom = jnp.concatenate(
        [flat, jnp.ones((flat.shape[0], 1), flat.dtype)], axis=-1
    )
    proj = jnp.einsum("nk,ckm->cnm", hom, camera_matrices, precision=_HIGHEST)

    fx = intrinsics[:, 0, 0][:, None]
    fy = intrinsics[:, 1, 1][:, None]
    cx = intrinsics[:, 2, 0][:, None]
    cy = intrinsics[:, 2, 1][:, None]
    k1 = distortions[:, 0, 0][:, None]
    k2 = distortions[:, 0, 1][:, None]

    u = proj[:, :, 0] / proj[:, :, 2] - cx
    v = proj[:, :, 1] / proj[:, :, 2] - cy
    r2 = jnp.square(u / fx) + jnp.square(v / fy)
    distort = 1.0 + (k1 + k2 * r2) * r2
    u = u * distort + cx
    v = v * distort + cy

    hs = heatmap_size
    chx = center_hm[:, 0:1].astype(jnp.float32)
    chy = center_hm[:, 1:2].astype(jnp.float32)
    u = jnp.clip(u, chx - (hs - 1), chx + hs - 2) - chx + (hs - 1)
    v = jnp.clip(v, chy - (hs - 1), chy + hs - 2) - chy + (hs - 1)

    u = upsample_trilinear(u.reshape(-1, g2, g2, g2), grid_size)
    v = upsample_trilinear(v.reshape(-1, g2, g2, g2), grid_size)

    idx = (v / 2.0).astype(jnp.int32) * hs + (u / 2.0).astype(jnp.int32)
    return idx  # (C, G, G, G)


def gather_voxel_volume(
    heatmaps: jnp.ndarray,  # (C, J, hs, hs) padded stride-2 heatmaps
    indices: jnp.ndarray,  # (C, G, G, G) flat pixel indices
) -> jnp.ndarray:
    """Gather heatmap values at the projected pixels, mean over cameras.

    Returns (J, G, G, G). Accumulates camera-by-camera to avoid
    materializing the (C, J, G^3) intermediate
    (reference: repro_layer.py:88-107 materializes it; at 12 cams x
    23 joints x 72^3 voxels that is >400 MB).
    """
    C, J = heatmaps.shape[0], heatmaps.shape[1]
    G = indices.shape[1]
    hm_flat = heatmaps.reshape(C, J, -1)
    idx_flat = indices.reshape(C, -1)

    def body(c, acc):
        vals = jnp.take(hm_flat[c], idx_flat[c], axis=1)  # (J, G^3)
        return acc + vals

    acc = jax.lax.fori_loop(
        0, C, body, jnp.zeros((J, G * G * G), heatmaps.dtype)
    )
    return (acc / C).reshape(J, G, G, G)


def reprojection_layer(
    heatmaps: jnp.ndarray,  # (B, C, J, hs, hs) padded heatmaps
    center3d: jnp.ndarray,  # (B, 3)
    center_hm: jnp.ndarray,  # (B, C, 2)
    camera_matrices: jnp.ndarray,  # (B, C, 4, 3)
    intrinsics: jnp.ndarray,  # (B, C, 3, 3)
    distortions: jnp.ndarray,  # (B, C, 1, 5)
    grid_size: int,
    grid_spacing: float,
) -> jnp.ndarray:
    """Batched voxel reprojection: (B, J, G, G, G)."""
    hs = heatmaps.shape[-1]

    def one(hm, c3d, chm, P, K, D):
        idx = reproject_indices(
            c3d, chm, P, K, D, grid_size, grid_spacing, hs
        )
        return gather_voxel_volume(hm, idx)

    return jax.vmap(one)(
        heatmaps, center3d, center_hm, camera_matrices, intrinsics, distortions
    )
