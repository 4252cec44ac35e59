"""Projective geometry as pure jnp functions.

TPU-native replacement for the reference's torch ReprojectionTool
(jarvis/utils/reprojection.py:16-90) and numpy ReprojectionTool
(jarvis/dataset/utils.py:17-99). All functions are jit-compatible, batched,
and differentiable.

Layouts follow the calibration module: camera matrices are (C, 4, 3) so a
homogeneous point row-vector is projected as ``p_h @ P``; intrinsics are the
transposed-K convention (``[0,0]=fx, [1,1]=fy, [2,0]=cx, [2,1]=cy``);
distortion uses radial k1, k2 only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Geometry is tiny compute but precision-critical: camera matrices fold K into
# the extrinsics, so projection products reach ~1e6 in magnitude and the
# default (bf16) MXU precision would cost ~3 px. Always run these einsums at
# full float32 precision.
_HIGHEST = jax.lax.Precision.HIGHEST


def project_points(
    points3d: jnp.ndarray,  # (..., 3) world mm
    camera_matrices: jnp.ndarray,  # (C, 4, 3)
    intrinsics: jnp.ndarray,  # (C, 3, 3)
    distortions: jnp.ndarray,  # (C, 1, 5)
) -> jnp.ndarray:
    """Project world points into every camera with k1/k2 distortion.

    Returns (..., C, 2) pixel coordinates. Matches
    ReprojectionTool.reprojectPoint (jarvis/utils/reprojection.py:49-66):
    pinhole projection followed by the reference's forward distortion
    applied around the principal point.
    """
    pts = jnp.asarray(points3d)
    shape = pts.shape[:-1]
    flat = pts.reshape(-1, 3)
    ones = jnp.ones((flat.shape[0], 1), dtype=flat.dtype)
    hom = jnp.concatenate([flat, ones], axis=-1)  # (N, 4)
    # (C, N, 3): p_h @ P per camera
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
    out = jnp.stack([u, v], axis=-1)  # (C, N, 2)
    return jnp.moveaxis(out, 0, -2).reshape(*shape, out.shape[0], 2)


def undistort_points_approx(
    points2d: jnp.ndarray,  # (C, 2) distorted pixels
    intrinsics: jnp.ndarray,
    distortions: jnp.ndarray,
) -> jnp.ndarray:
    """Single-step approximate undistortion.

    Matches the reference's inference-path inverse (divide by the forward
    distortion factor evaluated at the *distorted* radius,
    jarvis/utils/reprojection.py:71-78). Cheap, accurate for small k.
    """
    fx = intrinsics[:, 0, 0]
    fy = intrinsics[:, 1, 1]
    cx = intrinsics[:, 2, 0]
    cy = intrinsics[:, 2, 1]
    k1 = distortions[:, 0, 0]
    k2 = distortions[:, 0, 1]
    u = points2d[:, 0] - cx
    v = points2d[:, 1] - cy
    r2 = jnp.square(u / fx) + jnp.square(v / fy)
    distort = 1.0 + (k1 + k2 * r2) * r2
    u = u / distort + cx
    v = v / distort + cy
    return jnp.stack([u, v], axis=-1)


def triangulate(
    points2d: jnp.ndarray,  # (C, 2) distorted pixels
    weights: jnp.ndarray,  # (C,) confidence weights (0 disables a camera)
    camera_matrices: jnp.ndarray,  # (C, 4, 3)
    intrinsics: jnp.ndarray,
    distortions: jnp.ndarray,
) -> jnp.ndarray:
    """Confidence-weighted DLT triangulation of a single 3D point.

    Matches ReprojectionTool.reconstructPoint
    (jarvis/utils/reprojection.py:69-90): approximate undistortion, rows
    ``[u,v]^T . P_row2 - P_rows01`` scaled by the weights, then the
    null-space of A. The reference takes the last right-singular vector of
    a full SVD and rescales to X[-1]=1; here the equivalent inhomogeneous
    system ``A[:, :3] x = -A[:, 3]`` is solved by QR least squares — the
    same point up to the (tiny) reprojection residual, far faster and more
    float32-accurate on TPU than an SVD of (2C, 4).
    """
    und = undistort_points_approx(points2d, intrinsics, distortions)
    P = jnp.swapaxes(camera_matrices, 1, 2)  # (C, 3, 4) rows of P
    # A rows: for each camera: [u; v] * P[2] - P[0:2]   -> (C, 2, 4)
    uv = und[:, :, None]  # (C, 2, 1)
    A = uv * P[:, 2:3, :] - P[:, 0:2, :]
    A = A * weights.reshape(-1, 1, 1)
    A = A.reshape(-1, 4)
    q, r = jnp.linalg.qr(A[:, :3])
    rhs = jnp.matmul(q.T, -A[:, 3], precision=_HIGHEST)
    return jax.scipy.linalg.solve_triangular(r, rhs, lower=False)


def triangulate_dlt_numpy(
    points2d: np.ndarray,  # (2, C) distorted pixels
    cams_to_use: list[int],
    cameras,  # list of calibration.Camera
) -> np.ndarray:
    """Host-side exact-undistortion DLT used to build GT 3D keypoints.

    Matches the dataset-side ReprojectionTool.reconstructPoint
    (jarvis/dataset/utils.py:60-99): cv2.undistortPoints (iterative, exact)
    followed by unweighted SVD DLT. Returns [0,0,0] when fewer than two
    cameras see the point, like the reference.
    """
    import cv2

    if len(cams_to_use) <= 1:
        return np.array([0.0, 0.0, 0.0])
    rows = []
    for i, cam_idx in enumerate(cams_to_use):
        cam = cameras[cam_idx]
        pt = np.asarray(points2d[:, cam_idx], dtype=np.float64).reshape(1, 1, 2)
        und = cv2.undistortPoints(
            pt, cam.intrinsic.T, cam.distortion
        ).squeeze()
        u = und[0] * cam.intrinsic[0, 0] + cam.intrinsic[2, 0]
        v = und[1] * cam.intrinsic[1, 1] + cam.intrinsic[2, 1]
        P = cam.camera_matrix  # (3, 4)
        rows.append(np.array([u, v]).reshape(2, 1) @ P[2].reshape(1, 4) - P[0:2])
    A = np.concatenate(rows, axis=0)
    _, _, vh = np.linalg.svd(A)
    X = vh.T[:, -1]
    X = X / X[-1]
    return X[:3]
