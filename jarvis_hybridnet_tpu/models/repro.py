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



import jax
import jax.numpy as jnp
import numpy as np




def half_grid_offsets(grid_size: int, grid_spacing: float) -> np.ndarray:
    """(G/2, G/2, G/2, 3) voxel-center offsets around the cube center."""
    g2 = grid_size // 2
    half = g2 // 2
    r = np.arange(g2, dtype=np.float32) - half
    xx, yy, zz = np.meshgrid(r, r, r, indexing="ij")
    return np.stack([xx, yy, zz], axis=-1) * (grid_spacing * 2.0)


def _upsample2_axis(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Exact 2x linear upsample along one axis (align_corners=False).

    torch's half-pixel mapping for scale 2 decomposes into even/odd outputs
    ``out[2k] = 0.25*in[k-1] + 0.75*in[k]`` (clamped at the edge) and
    ``out[2k+1] = 0.75*in[k] + 0.25*in[k+1]`` — pure shifted slices +
    interleave, which lower to cheap TPU copies instead of the pathological
    gather that an index-array ``take`` becomes.
    """
    # interleave on the LEADING axis: merging (2, L) -> 2L there is a
    # layout-free row-major reshape, whereas interleaving near the
    # minor-most axes forces tile-padded copies on TPU
    x = jnp.moveaxis(x, axis, 0)
    prev = jnp.concatenate([x[:1], x[:-1]], axis=0)  # in[k-1] (edge clamp)
    nxt = jnp.concatenate([x[1:], x[-1:]], axis=0)  # in[k+1]
    even = 0.25 * prev + 0.75 * x
    odd = 0.75 * x + 0.25 * nxt
    out = jnp.stack([even, odd], axis=1)  # (L, 2, ...)
    out = out.reshape(-1, *x.shape[1:])  # (2L, ...)
    return jnp.moveaxis(out, 0, axis)


def upsample_trilinear(x: jnp.ndarray, out: int) -> jnp.ndarray:
    """Trilinear 2x upsample of the trailing three axes of (..., D, H, W)."""
    assert out == 2 * x.shape[-1], "only exact 2x upsampling is used"
    x = _upsample2_axis(x, x.ndim - 3)
    x = _upsample2_axis(x, x.ndim - 2)
    x = _upsample2_axis(x, x.ndim - 1)
    return x


def _upsample2_aligned_axis(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Center-aligned 2x linear upsample: ``out[2k] = in[k]``,
    ``out[2k+1] = (in[k] + in[k+1]) / 2`` (top edge clamped).

    Used for the quarter->half grid interpolation, where the coarse
    centers coincide exactly with the even fine centers
    (``(2k - G/2)*s = (k - G/4)*2s``) — unlike the half->full upsample,
    whose half-pixel convention needs the 0.25/0.75 stencil above.
    """
    x = jnp.moveaxis(x, axis, 0)
    nxt = jnp.concatenate([x[1:], x[-1:]], axis=0)  # in[k+1] (edge clamp)
    odd = 0.5 * (x + nxt)
    out = jnp.stack([x, odd], axis=1).reshape(-1, *x.shape[1:])
    return jnp.moveaxis(out, 0, axis)


def reproject_indices(
    center3d: jnp.ndarray,  # (3,) cube center (mm, already grid-snapped ints)
    center_hm: jnp.ndarray,  # (C, 2) crop centers in full-res pixels
    camera_matrices: jnp.ndarray,  # (C, 4, 3)
    intrinsics: jnp.ndarray,  # (C, 3, 3)
    distortions: jnp.ndarray,  # (C, 1, 5)
    grid_size: int,
    grid_spacing: float,
    heatmap_size: int,  # hs = BOUNDING_BOX_SIZE/2 + 2
    upsample: bool = True,
) -> jnp.ndarray:
    """Flat pixel indices (C, G, G, G) into each camera's padded heatmap
    (or (C, G/2, G/2, G/2) with ``upsample=False``)."""
    g2 = grid_size // 2
    half = g2 // 2
    # The voxel grid is axis-separable, so the homogeneous projection
    # x@P decomposes into per-axis outer sums: proj_m(i,j,k) =
    # X_i*P[0,m] + Y_j*P[1,m] + Z_k*P[2,m] + P[3,m]. Three broadcast adds
    # per component replace the (N,4)x(4,3) matmul — no trailing-3/4 axes
    # (which tile-pad 32-42x on TPU) ever materialize.
    r = (jnp.arange(g2, dtype=jnp.float32) - half) * (grid_spacing * 2.0)
    coords = r[None, :] + center3d.astype(jnp.float32)[:, None]  # (3, g2)
    P = camera_matrices  # (C, 4, 3)

    def component(m):
        term = (
            P[:, 0, m][:, None, None, None] * coords[0][None, :, None, None]
            + P[:, 1, m][:, None, None, None] * coords[1][None, None, :, None]
            + P[:, 2, m][:, None, None, None] * coords[2][None, None, None, :]
            + P[:, 3, m][:, None, None, None]
        )  # (C, g2, g2, g2)
        return term.reshape(P.shape[0], -1)

    pu, pv, pw = component(0), component(1), component(2)

    fx = intrinsics[:, 0, 0][:, None]
    fy = intrinsics[:, 1, 1][:, None]
    cx = intrinsics[:, 2, 0][:, None]
    cy = intrinsics[:, 2, 1][:, None]
    k1 = distortions[:, 0, 0][:, None]
    k2 = distortions[:, 0, 1][:, None]

    u = pu / pw - cx
    v = pv / pw - cy
    r2 = jnp.square(u / fx) + jnp.square(v / fy)
    distort = 1.0 + (k1 + k2 * r2) * r2
    u = u * distort + cx
    v = v * distort + cy

    hs = heatmap_size
    chx = center_hm[:, 0:1].astype(jnp.float32)
    chy = center_hm[:, 1:2].astype(jnp.float32)
    u = jnp.clip(u, chx - (hs - 1), chx + hs - 2) - chx + (hs - 1)
    v = jnp.clip(v, chy - (hs - 1), chy + hs - 2) - chy + (hs - 1)

    if upsample:
        u = upsample_trilinear(u.reshape(-1, g2, g2, g2), grid_size)
        v = upsample_trilinear(v.reshape(-1, g2, g2, g2), grid_size)

    idx = (v / 2.0).astype(jnp.int32) * hs + (u / 2.0).astype(jnp.int32)
    return idx


def gather_voxel_volume(
    heatmaps: jnp.ndarray,  # (B, C, J, hs, hs) padded stride-2 heatmaps
    indices: jnp.ndarray,  # (B, C, ...) flat within-image pixel indices
    acc_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Gather heatmap values at the projected pixels, mean over cameras.

    Returns (B, N, J) — joints last, which is already the NDHWC layout the
    V2V stage consumes.

    Memory/scheduling choices (all measured on v5e):
      * rows layout (B*hs^2, J): each gathered element is one contiguous
        J-vector (a (J, pixels) layout gathers J strided words per voxel
        and measures ~1.5x slower);
      * the unrolled camera loop is *serialized* by threading a value from
        the accumulator into the next camera's indices — without the data
        dependency XLA schedules all C gathers concurrently and their
        tile-padded outputs (23 joints -> 128 lanes) exceed HBM at
        12 cams x 3M voxels (a lax.fori_loop also bounds memory but its
        non-fused gather runs ~2.5x slower).
    """
    B, C, J = heatmaps.shape[0], heatmaps.shape[1], heatmaps.shape[2]
    hs2 = heatmaps.shape[3] * heatmaps.shape[4]
    N = int(np.prod(indices.shape[2:]))
    # (C, B*hs^2, J): batch folded into the pixel axis
    hm_rows = heatmaps.reshape(B, C, J, hs2).transpose(1, 0, 3, 2)
    hm_rows = hm_rows.reshape(C, B * hs2, J)
    batch_off = (jnp.arange(B, dtype=jnp.int32) * hs2)[:, None]  # (B, 1)
    idx = indices.reshape(B, C, N) + batch_off[:, None]
    idx = idx.transpose(1, 0, 2).reshape(C, B * N)

    # Concurrency/memory trade-off: fully concurrent gathers overlap their
    # DMA descriptor streams (~6x faster than serialized) but keep all C
    # tile-padded outputs live. Gate new groups on the running sum via a
    # zero-valued dependency so at most `group` outputs are in flight.
    #
    # Why not a Pallas kernel: TPU's vector ISA only gathers within a
    # 128-lane vreg row (axis-1 take_along_axis) or an 8-sublane tile, so
    # a VMEM-resident-table kernel must loop over the 133 possible
    # 128-wide segments of the 17k-entry pixel table and repeat that per
    # joint (~9 vector ops per gathered J-vector) — slower than XLA's
    # DMA gather, which fetches each voxel's whole contiguous J-vector
    # with one descriptor (~25M rows/s). The 'half' mode above attacks
    # the real cost (descriptor count) instead.
    # 23 joints tile-pad to 128 lanes
    bytes_per_out = B * N * 128 * heatmaps.dtype.itemsize
    group = C if C * bytes_per_out < 4 << 30 else max(1, (4 << 30) // bytes_per_out)

    acc = None
    for c in range(C):
        idx_c = idx[c]
        if acc is not None and c % group == 0:
            idx_c = idx_c + (acc[0, 0] * 0.0).astype(jnp.int32)
        vals = jnp.take(hm_rows[c], idx_c, axis=0)  # (B*N, J)
        vals = vals.astype(acc_dtype)
        acc = vals if acc is None else acc + vals
    return (acc / C).reshape(B, N, J)


def reprojection_layer(
    heatmaps: jnp.ndarray,  # (B, C, J, hs, hs) padded heatmaps
    center3d: jnp.ndarray,  # (B, 3)
    center_hm: jnp.ndarray,  # (B, C, 2)
    camera_matrices: jnp.ndarray,  # (B, C, 4, 3)
    intrinsics: jnp.ndarray,  # (B, C, 3, 3)
    distortions: jnp.ndarray,  # (B, C, 1, 5)
    grid_size: int,
    grid_spacing: float,
    mode: str = "exact",
    gather_dtype: jnp.dtype | None = None,
) -> jnp.ndarray:
    """Batched voxel reprojection: (B, G, G, G, J) (NDHWC, V2V-ready).

    ``mode='exact'`` replicates the reference bit-carefully: the half-grid
    pixel-index maps are trilinearly upsampled to G^3 and every full-res
    voxel gathers its own heatmap sample (repro_layer.py:70-85).

    ``mode='half'`` gathers at the (G/2)^3 half-grid points directly and
    trilinearly upsamples the gathered *values* — 8x fewer gathers (the
    dominant cost on TPU, where random gather is DMA-per-element). Since
    the heatmaps are smooth Gaussians and the index maps are themselves
    interpolated from the same half grid, the volumes differ only by the
    index-truncation nonlinearity; validated to move the final 3D
    soft-argmax points by far less than the <2 mm fidelity budget.

    ``mode='half_fused'`` is 'half' without materializing the G^3 volume:
    the (G/2)^3 gathered volume is returned directly and V2VNet's front
    layer applies the exact upsample+stride-2-conv composition
    (ops/fused_upfront.py) — same numerics as 'half', no 72^3 buffers.

    ``mode='quarter_fused'`` goes one step further: gather at the (G/4)^3
    quarter grid (64x fewer scattered reads than 'exact', 8x fewer than
    'half') and linearly interpolate the values up to the half grid before
    the fused V2V front. The heatmaps are smooth Gaussians (sigma ~3 px at
    the sampled resolution), so quarter-grid sampling (~2-4 px steps)
    still resolves them; deviation vs 'exact' is checked on-chip by
    ``bench.py --fidelity``.

    ``gather_dtype`` (half modes only): cast the heatmaps to this dtype
    before the gather. The gather is HBM-random-read bound at ~10 GB/s
    effective, so bfloat16 rows (46 B vs 92 B for J=23) halve both the
    scattered reads and the tile-padded per-camera intermediates; values
    are <=255 Gaussians, so the <=1-ulp bf16 rounding is far inside the
    2 mm budget (guarded on-chip by ``bench.py --fidelity``). The camera
    accumulator stays float32. 'exact' mode always gathers float32.
    """
    hs = heatmaps.shape[-1]
    G = grid_size

    if mode == "exact":
        idx = jax.vmap(
            lambda c3d, chm, P, K, D: reproject_indices(
                c3d, chm, P, K, D, grid_size, grid_spacing, hs
            )
        )(center3d, center_hm, camera_matrices, intrinsics, distortions)
        out = gather_voxel_volume(heatmaps, idx)  # (B, G^3, J)
        return out.reshape(-1, G, G, G, out.shape[-1])

    assert mode in ("half", "half_fused", "quarter_fused"), mode
    g2 = G // 2
    if gather_dtype is not None:
        heatmaps = heatmaps.astype(gather_dtype)

    if mode == "quarter_fused":
        # Gather at the (G/4)^3 quarter grid — 8x fewer scattered reads
        # than 'half' — and interpolate the *values* up to the half grid
        # with the center-aligned stencil (quarter centers coincide with
        # even half centers). Passing (grid_size/2, 2*spacing) to
        # reproject_indices yields exactly the quarter grid:
        # r = (i - G/8)*(4*spacing).
        g4 = G // 4
        idx = jax.vmap(
            lambda c3d, chm, P, K, D: reproject_indices(
                c3d, chm, P, K, D, grid_size // 2, grid_spacing * 2.0, hs,
                upsample=False,
            )
        )(center3d, center_hm, camera_matrices, intrinsics, distortions)
        quarter = gather_voxel_volume(heatmaps, idx)  # (B, g4^3, J)
        J = quarter.shape[-1]
        quarter = quarter.reshape(-1, g4, g4, g4, J)
        half = _upsample2_aligned_axis(quarter, 1)
        half = _upsample2_aligned_axis(half, 2)
        half = _upsample2_aligned_axis(half, 3)
        return half  # V2V's fused front layer consumes the half grid

    idx = jax.vmap(
        lambda c3d, chm, P, K, D: reproject_indices(
            c3d, chm, P, K, D, grid_size, grid_spacing, hs, upsample=False
        )
    )(center3d, center_hm, camera_matrices, intrinsics, distortions)
    half = gather_voxel_volume(heatmaps, idx)  # (B, g2^3, J)
    J = half.shape[-1]
    half = half.reshape(-1, g2, g2, g2, J)
    if mode == "half_fused":
        return half  # V2V's fused front layer consumes the half grid
    # upsample values over the three spatial axes (axes 1..3); joints stay
    # on the (wide) minor-most axis throughout
    full = _upsample2_axis(half, 1)
    full = _upsample2_axis(full, 2)
    full = _upsample2_axis(full, 3)
    return full
