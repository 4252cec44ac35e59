"""Geometry golden tests: projection/distortion/DLT vs OpenCV ground truth."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from jarvis_hybridnet_tpu.utils.calibration import (
    Camera,
    CameraRig,
    load_camera_rigs,
    load_opencv_yaml,
)
from jarvis_hybridnet_tpu.utils.reprojection import (
    project_points,
    triangulate,
    triangulate_dlt_numpy,
)


@pytest.fixture(scope="module")
def rig(example_dataset):
    rigs = load_camera_rigs(str(example_dataset))
    assert "12Cam_Ralph" in rigs
    return rigs["12Cam_Ralph"]


def test_load_opencv_yaml(example_dataset):
    path = example_dataset / "calib_params" / "12Cam_Ralph" / "Camera_B.yaml"
    mats = load_opencv_yaml(str(path))
    assert mats["intrinsicMatrix"].shape == (3, 3)
    assert mats["distortionCoefficients"].shape == (1, 5)
    assert mats["R"].shape == (3, 3)
    assert mats["T"].size == 3
    # intrinsics are stored transposed: fx at [0,0], cx at [2,0]
    assert mats["intrinsicMatrix"][2, 0] > 100  # cx
    assert mats["intrinsicMatrix"][0, 1] == 0


def test_rig_loading(rig):
    assert rig.num_cameras == 12
    assert rig.camera_matrices.shape == (12, 4, 3)
    assert rig.intrinsics.shape == (12, 3, 3)
    assert rig.distortions.shape == (12, 1, 5)


def test_projection_matches_opencv(rig):
    """Our k1/k2 projection must agree with cv2.projectPoints."""
    rng = np.random.default_rng(0)
    # points near the rig's working volume (~hand rig, mm units); use the
    # GT cloud scale: project the camera positions' centroid neighborhood
    pts = rng.uniform(-50, 50, size=(20, 3)) + np.array([0.0, 100.0, 500.0])

    proj = np.asarray(
        project_points(
            pts.astype(np.float32),
            rig.camera_matrices,
            rig.intrinsics,
            rig.distortions,
        )
    )  # (20, 12, 2)

    for ci, cam in enumerate(rig.camera_list):
        rvec, _ = cv2.Rodrigues(cam.rotation.T)
        tvec = cam.position.reshape(3, 1)
        k = np.zeros(5)
        k[:2] = cam.distortion[0, :2]
        expected, _ = cv2.projectPoints(
            pts.reshape(-1, 1, 3), rvec, tvec, cam.opencv_K, k
        )
        expected = expected.reshape(-1, 2)
        err = np.abs(proj[:, ci] - expected).max()
        assert err < 0.1, f"camera {ci} max err {err}"


def test_triangulate_roundtrip(rig):
    """project -> triangulate must recover the 3D point to sub-mm."""
    rng = np.random.default_rng(1)
    pts = rng.uniform(-40, 40, size=(10, 3)) + np.array([0.0, 100.0, 500.0])
    proj = np.asarray(
        project_points(
            pts.astype(np.float64),
            rig.camera_matrices.astype(np.float64),
            rig.intrinsics.astype(np.float64),
            rig.distortions.astype(np.float64),
        )
    )
    weights = np.ones(rig.num_cameras)
    for i in range(len(pts)):
        rec = np.asarray(
            triangulate(
                proj[i],
                weights,
                rig.camera_matrices.astype(np.float64),
                rig.intrinsics.astype(np.float64),
                rig.distortions.astype(np.float64),
            )
        )
        assert np.linalg.norm(rec - pts[i]) < 0.5, (rec, pts[i])


def test_triangulate_weighted_downweights_outlier(rig):
    rng = np.random.default_rng(2)
    pt = np.array([10.0, 90.0, 480.0])
    proj = np.asarray(
        project_points(
            pt.astype(np.float64),
            rig.camera_matrices.astype(np.float64),
            rig.intrinsics.astype(np.float64),
            rig.distortions.astype(np.float64),
        )
    )
    proj_bad = proj.copy()
    proj_bad[0] += 80.0  # corrupt camera 0
    weights = np.ones(rig.num_cameras)
    weights[0] = 1e-4
    rec = np.asarray(
        triangulate(
            proj_bad,
            weights,
            rig.camera_matrices.astype(np.float64),
            rig.intrinsics.astype(np.float64),
            rig.distortions.astype(np.float64),
        )
    )
    assert np.linalg.norm(rec - pt) < 1.0


def test_host_dlt_matches_jax_dlt(rig):
    """The cv2-exact host DLT and the jnp DLT agree on clean points."""
    pt = np.array([5.0, 110.0, 520.0])
    proj = np.asarray(
        project_points(
            pt.astype(np.float64),
            rig.camera_matrices.astype(np.float64),
            rig.intrinsics.astype(np.float64),
            rig.distortions.astype(np.float64),
        )
    )  # (C, 2)
    host = triangulate_dlt_numpy(
        proj.T, list(range(rig.num_cameras)), rig.camera_list
    )
    dev = np.asarray(
        triangulate(
            proj,
            np.ones(rig.num_cameras),
            rig.camera_matrices.astype(np.float64),
            rig.intrinsics.astype(np.float64),
            rig.distortions.astype(np.float64),
        )
    )
    assert np.linalg.norm(host - pt) < 0.1
    assert np.linalg.norm(dev - host) < 0.5


def test_discover_camera_names_no_dataset():
    """No 3D dataset configured (DATASET_3D=None, the default) must give
    an empty list, not a TypeError (review r3 finding: the interactive
    CLI's duplicated copy crashed on os.path.isabs(None))."""
    from types import SimpleNamespace

    from jarvis_hybridnet_tpu.utils.calibration import discover_camera_names

    cfg = SimpleNamespace(DATASET=SimpleNamespace(DATASET_3D=None))
    assert discover_camera_names(cfg) == []
