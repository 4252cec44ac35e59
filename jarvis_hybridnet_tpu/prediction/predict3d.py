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
from .video_io import (
    get_video_paths,
    open_multi_camera_reader,
    probe_frame_count,
)


def _pod_frame_shard(params, probe_path):
    """Multi-host (pod) streaming: restrict this process to its own
    contiguous time slice of the recording (parallel.multihost.
    process_frame_range) so N hosts decode N disjoint slices instead of
    every host decoding everything. Returns
    (frame_start, number_frames, shard_suffix, process_index,
    process_count). Single-process: the identity.

    ``params.process_index`` / ``params.process_count`` override the jax
    runtime values (simulated-pod tests)."""
    import jax

    pi = getattr(params, "process_index", None)
    pc = getattr(params, "process_count", None)
    pi = jax.process_index() if pi is None else int(pi)
    pc = jax.process_count() if pc is None else int(pc)
    if pc <= 1:
        return params.frame_start, params.number_frames, "", pi, pc
    from ..parallel.multihost import process_frame_range

    number_frames = params.number_frames
    if number_frames == -1:
        total = probe_frame_count(probe_path)
        if total <= 0:
            raise ValueError(
                "Pod-sharded prediction needs a total frame count to "
                "split, but the container reports none — pass "
                "number_frames explicitly."
            )
        number_frames = total - params.frame_start
    lo, hi = process_frame_range(number_frames, pi, pc)
    return params.frame_start + lo, hi - lo, f".part{pi:05d}", pi, pc


def _merge_pod_shards(output_dir, csv_name, pc, write_header):
    """Rank-0 merge: header + the per-process shard rows in rank order
    (shards are contiguous, rank-ordered time slices, so concatenation
    restores global frame order). Raises when a shard is missing — a
    silently absent merged CSV must not read as a successful run."""
    parts = [os.path.join(output_dir, f"{csv_name}.part{pi:05d}")
             for pi in range(pc)]
    missing = [p for p in parts if not os.path.isfile(p)]
    if missing:
        raise RuntimeError(
            f"Cannot merge pod shards into {csv_name}, missing: {missing} "
            "(a host failed to write its shard, or the shared filesystem "
            "has not made it visible). The .partNNNNN files are left in "
            "place for a manual merge.")
    with open(os.path.join(output_dir, csv_name), "w", newline="") as out:
        writer = csv.writer(out, delimiter=",", quotechar='"',
                            quoting=csv.QUOTE_MINIMAL)
        write_header(writer)
        for p in parts:
            with open(p, newline="") as f:
                out.write(f.read())
    for p in parts:
        os.remove(p)


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
    if params.progress_bar is not None and total:
        params.progress_bar.progress(min(1.0, (done + n) / total))


def _stream_rows(params, cfg, reader, steps, shard_suffix, pi, pc):
    """Shared streaming tail of both 3D drivers: write each batch's rows
    to the (possibly pod-sharded) ``data3D.csv``, keep a one-deep pending
    slot so CSV writing / ring recycling overlap the device call already
    dispatched for the next batch, then sync and rank-0-merge pod shards.

    ``steps`` yields ``(outputs, n, ring_buffer)`` — the caller dispatches
    its device work inside the generator, before the previous batch is
    drained here.
    """
    import jax

    num_joints = int(cfg.KEYPOINTDETECT.NUM_JOINTS)

    def write_header(writer):
        if len(cfg.KEYPOINT_NAMES) == num_joints:
            _write_header(writer, cfg, per_joint=("x", "y", "z",
                                                  "confidence"))

    with open(os.path.join(params.output_dir, f"data3D.csv{shard_suffix}"),
              "w", newline="") as csvfile:
        writer = csv.writer(csvfile, delimiter=",", quotechar='"',
                            quoting=csv.QUOTE_MINIMAL)
        if not shard_suffix:
            write_header(writer)
        # pod shards carry no header — the rank-0 merge writes it once
        done = 0
        bar = tqdm(total=reader.number_frames)
        pending = None  # (outputs, n, ring buffer)
        for item in steps:
            if pending is not None:
                _drain(writer, pending[:2], num_joints, bar, params,
                       done, reader.number_frames)
                done += pending[1]
                # results fetched -> the batch's H2D transfer is long
                # done; hand the ring buffer back to the decode threads
                reader.recycle(pending[2])
            pending = item
        if pending is not None:
            _drain(writer, pending[:2], num_joints, bar, params,
                   done, reader.number_frames)
            reader.recycle(pending[2])
        bar.close()
    reader.release()

    if shard_suffix:
        if jax.process_count() > 1:
            # real pod: wait for every host's shard before merging
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("predict3D_shards")
        if pi == 0 and getattr(params, "merge_shards", True):
            _merge_pod_shards(params.output_dir, "data3D.csv", pc,
                              write_header)
    return params.output_dir


def _predict3d_twophase(params, cfg, rig, video_paths, frame_start,
                        number_frames, batch, shard_suffix, pi, pc):
    """Split-cascade streaming loop (predictor3d.build_predict3d_twophase):
    the host uploads 4x-downscaled frames for CenterDetect and only the
    bbox^2 crop windows for the rest of the cascade — ~9x less H2D than
    shipping full frames. Requires the native decode pipeline (its paired
    lowres ring comes from the same decoded frame at no extra decode)."""
    import jax

    from .loaders import make_predictor3d_twophase
    from .video_io import NativeMultiCameraReader

    factor = int(cfg.get("TPU", {}).get("LOWRES_FACTOR", 4))
    reader = NativeMultiCameraReader(
        video_paths, frame_start=frame_start, number_frames=number_frames,
        batch_size=batch, lowres_factor=factor,
    )
    phase_a, phase_b, crop_fn = make_predictor3d_twophase(
        cfg, rig, reader.img_size,
        weights_center_detect=params.weights_center_detect,
        weights_hybridnet=params.weights_hybridnet,
        lowres_factor=factor,
    )

    def steps():
        for full, low, n in iter(reader._pool):
            cx, cy, c3d, valid = phase_a(jax.device_put(low))
            # tiny D2H sync: the host needs the crop centers to slice
            crops = crop_fn(full, np.asarray(cx), np.asarray(cy))
            pts, conf = phase_b(jax.device_put(crops), cx, cy, c3d)
            yield (pts, conf, valid), n, full

    return _stream_rows(params, cfg, reader, steps(), shard_suffix, pi, pc)


def predict3D(params: Predict3DParams) -> str | None:
    import jax

    project = ProjectManager()
    if not project.load(params.project_name):
        clp.error(f"Could not load project: {params.project_name}! Aborting...")
        return None
    cfg = project.cfg
    compile_cache.configure(cfg, params.trt_mode)

    rig = get_camera_rig(cfg, params.dataset_name)

    video_paths = get_video_paths(params.recording_path, rig.camera_names)

    # pod streaming: this process handles only its own time slice
    frame_start, number_frames, shard_suffix, pi, pc = _pod_frame_shard(
        params, video_paths[0]
    )

    if not params.output_dir:
        stamp = time.strftime("%Y%m%d-%H%M%S")
        if jax.process_count() > 1:
            # all processes must agree on the run directory name
            from jax.experimental import multihost_utils

            stamp = time.strftime(
                "%Y%m%d-%H%M%S",
                time.localtime(float(multihost_utils.broadcast_one_to_all(
                    np.asarray(time.time())
                ))),
            )
        params.output_dir = os.path.join(
            project.parent_dir, cfg.PROJECTS_ROOT_PATH, params.project_name,
            "predictions", "predictions3D", f"Predictions_3D_{stamp}",
        )
    os.makedirs(params.output_dir, exist_ok=True)
    if pi == 0:
        _write_info(params)

    batch = int(cfg.get("TPU", {}).get("FRAME_BATCH", 8))

    # split-cascade streaming (lowres CenterDetect + host crops): takes
    # precedence over the fused path when enabled — it exists to beat the
    # host->device bandwidth wall, which multi-chip sharding cannot fix
    if (params.trt_mode != "previous"
            and bool(cfg.get("TPU", {}).get("TWO_PHASE", False))):
        from .. import native

        if native.video_available():
            return _predict3d_twophase(
                params, cfg, rig, video_paths, frame_start, number_frames,
                batch, shard_suffix, pi, pc,
            )
        clp.warning("TPU.TWO_PHASE requires the native video pipeline; "
                    "falling back to the fused predictor.")

    # multi-chip: framesets data-parallel, optionally the camera axis
    # sharded too (TPU.SHARD_CAMERAS=n) so the voxel gather and
    # camera-mean ride ICI (parallel/predict_step.py). On a pod each
    # process meshes only its LOCAL chips: the time axis is sharded
    # across hosts by _pod_frame_shard already, so the per-host compute
    # is fully independent and nothing rides DCN.
    from ..parallel.mesh import plan_inference_devices

    all_devices = jax.local_devices() if pc > 1 else jax.devices()
    devices, n_cam = plan_inference_devices(
        all_devices,
        n_data_cap=int(cfg.get("TPU", {}).get("MESH_DATA_AXIS", -1)),
        n_cam=int(cfg.get("TPU", {}).get("SHARD_CAMERAS", 1)),
        num_cameras=rig.num_cameras,
    )
    mesh = None
    shard_cameras = n_cam > 1
    if len(devices) > 1:
        from ..parallel.mesh import make_mesh

        n_dev = len(devices)
        mesh = make_mesh(n_data=n_dev // n_cam, n_cameras=n_cam,
                         devices=devices)
        n_data = mesh.shape["data"]
        batch = max(batch, n_data) // n_data * n_data  # divisible by dp
        clp.info(f"Sharded inference over {n_dev} devices "
                 f"(data={n_data}, cameras={mesh.shape['cameras']})")
    else:
        shard_cameras = False

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as PSpec

        in_sharding = NamedSharding(
            mesh, PSpec("data", "cameras" if shard_cameras else None)
        )
    else:
        in_sharding = None

    reader = open_multi_camera_reader(
        video_paths,
        backend=cfg.get("TPU", {}).get("DECODE_BACKEND"),
        frame_start=frame_start,
        number_frames=number_frames,
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
        jax.profiler.start_trace(profile_dir)

    def steps():
        # one-deep device pipeline: upload batch k+1 and dispatch its
        # predictor call (async) before batch k's results are drained by
        # _stream_rows, so host->device transfer and TPU compute overlap
        for frames, n in reader:
            dev_frames = (jax.device_put(frames, in_sharding)
                          if in_sharding is not None
                          else jax.device_put(frames))
            yield predictor(dev_frames), n, frames

    out = _stream_rows(params, cfg, reader, steps(), shard_suffix, pi, pc)
    if profile_dir:
        jax.profiler.stop_trace()
    return out
