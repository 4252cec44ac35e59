"""Multi-camera video -> 3D pose CSV driver.

Equivalent of the reference predict3D (jarvis/prediction/predict3D.py:27-105)
with identical output layout: writes
``projects/<p>/predictions/predictions3D/Predictions_3D_<ts>/`` with
``info.yaml`` and ``data3D.csv`` (two-row header / x,y,z,confidence; NaN rows
when fewer than two cameras detect the subject). Videos are matched to
calibration camera names; framesets are decoded ahead in a prefetch thread
and processed in TPU-sized batches.
"""

from __future__ import annotations

import csv
import os
import time

import numpy as np
from tqdm import tqdm

from ..config.project_manager import ProjectManager
from ..utils import clp
from ..utils.calibration import CameraRig, load_camera_rigs
from ..utils.param_classes import Predict3DParams
from . import compile_cache
from .loaders import make_predictor3d
from .predict2d import _write_header, _write_info, _write_row
from .video_io import MultiCameraReader, get_video_paths


def get_camera_rig(cfg, dataset_name=None) -> CameraRig:
    """Resolve the calibration rig for a project
    (reference get_repro_tool, jarvis/utils/reprojection.py:115-146)."""
    dataset_dir = os.path.join(
        cfg.PARENT_DIR, cfg.DATASET.DATASET_ROOT_DIR, cfg.DATASET.DATASET_3D
    )
    rigs = load_camera_rigs(dataset_dir)
    if dataset_name is not None and dataset_name in rigs:
        return rigs[dataset_name]
    return rigs[next(iter(rigs))]


def _drain(writer, pending, num_joints, bar, params, done, total):
    (points, conf, valid), n = pending
    points = np.asarray(points)
    conf = np.asarray(conf)
    valid = np.asarray(valid)
    for t in range(n):
        _write_row(writer, points[t], conf[t], valid[t], num_joints,
                   with_z=True)
    bar.update(n)
    if params.progress_bar is not None:
        params.progress_bar.progress(min(1.0, (done + n) / total))


def predict3D(params: Predict3DParams) -> str | None:
    project = ProjectManager()
    if not project.load(params.project_name):
        clp.error(f"Could not load project: {params.project_name}! Aborting...")
        return None
    cfg = project.cfg
    compile_cache.configure(cfg, params.trt_mode)

    rig = get_camera_rig(cfg, params.dataset_name)

    params.output_dir = os.path.join(
        project.parent_dir, cfg.PROJECTS_ROOT_PATH, params.project_name,
        "predictions", "predictions3D",
        f'Predictions_3D_{time.strftime("%Y%m%d-%H%M%S")}',
    )
    os.makedirs(params.output_dir, exist_ok=True)
    _write_info(params)

    video_paths = get_video_paths(params.recording_path, rig.camera_names)
    batch = int(cfg.get("TPU", {}).get("FRAME_BATCH", 8))

    # multi-chip: framesets data-parallel over all devices, optionally the
    # camera axis sharded too (TPU.SHARD_CAMERAS=n) so the voxel gather and
    # camera-mean ride ICI (parallel/predict_step.py)
    import jax

    mesh = None
    shard_cameras = False
    if len(jax.devices()) > 1:
        from ..parallel.mesh import make_mesh

        n_cam = int(cfg.get("TPU", {}).get("SHARD_CAMERAS", 1))
        n_dev = len(jax.devices())
        if n_cam > 1 and n_dev % n_cam == 0 and rig.num_cameras % n_cam == 0:
            mesh = make_mesh(n_data=n_dev // n_cam, n_cameras=n_cam)
            shard_cameras = True
        else:
            mesh = make_mesh(n_data=n_dev, n_cameras=1)
        n_data = mesh.shape["data"]
        batch = max(batch, n_data) // n_data * n_data  # divisible by dp
        clp.info(f"Sharded inference over {n_dev} devices "
                 f"(data={n_data}, cameras={mesh.shape['cameras']})")

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as PSpec

        in_sharding = NamedSharding(
            mesh, PSpec("data", "cameras" if shard_cameras else None)
        )
    else:
        in_sharding = None

    reader = MultiCameraReader(
        video_paths,
        frame_start=params.frame_start,
        number_frames=params.number_frames,
        batch_size=batch,
    )

    # AOT-exported artifact (the TRT engine-file analog): 'previous' loads
    # the serialized cascade (weights embedded), 'new' exports it
    from . import export as aot

    W, H = reader.img_size
    shape = (batch, rig.num_cameras, H, W, 3)
    artifact = aot.artifact_path(cfg, "predict3D", shape)
    predictor = None
    if (params.trt_mode == "previous" and os.path.isfile(artifact)
            and mesh is None):
        clp.info(f"Loading exported predictor: {artifact}")
        predictor = aot.load_predictor(artifact)
    if predictor is None:
        predictor = make_predictor3d(
            cfg, rig, params.weights_center_detect, params.weights_hybridnet,
            mesh=mesh, shard_cameras=shard_cameras,
        )
        if params.trt_mode == "new":
            import numpy as _np

            aot.export_predictor(
                predictor, _np.zeros(shape, _np.uint8), artifact
            )
            clp.info(f"Exported compiled predictor: {artifact}")

    profile_dir = cfg.get("TPU", {}).get("PROFILE_DIR")
    if profile_dir:
        import jax

        jax.profiler.start_trace(profile_dir)

    num_joints = int(cfg.KEYPOINTDETECT.NUM_JOINTS)
    with open(os.path.join(params.output_dir, "data3D.csv"), "w",
              newline="") as csvfile:
        writer = csv.writer(csvfile, delimiter=",", quotechar='"',
                            quoting=csv.QUOTE_MINIMAL)
        if len(cfg.KEYPOINT_NAMES) == num_joints:
            _write_header(writer, cfg, per_joint=("x", "y", "z", "confidence"))

        done = 0
        bar = tqdm(total=reader.number_frames)
        # one-deep device pipeline: upload batch k+1 and dispatch its
        # predictor call (async) before fetching batch k's results, so
        # host->device transfer and TPU compute overlap
        import jax

        pending = None  # (outputs, n, host buffer)
        for frames, n in reader:
            dev_frames = (jax.device_put(frames, in_sharding)
                          if in_sharding is not None
                          else jax.device_put(frames))
            outputs = predictor(dev_frames)
            if pending is not None:
                _drain(writer, pending[:2], num_joints, bar, params,
                       done, reader.number_frames)
                done += pending[1]
                # results fetched -> the batch's H2D transfer is long done;
                # hand the ring buffer back to the decode threads
                reader.recycle(pending[2])
            pending = (outputs, n, frames)
        if pending is not None:
            _drain(writer, pending[:2], num_joints, bar, params,
                   done, reader.number_frames)
            done += pending[1]
            reader.recycle(pending[2])
        bar.close()
    reader.release()
    if profile_dir:
        import jax

        jax.profiler.stop_trace()
    return params.output_dir
