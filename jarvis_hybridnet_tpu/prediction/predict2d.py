"""Video -> 2D keypoint CSV driver.

Equivalent of the reference predict2D (jarvis/prediction/predict2D.py:30-117)
with identical output layout: writes
``projects/<p>/predictions/predictions2D/Predictions_2D_<ts>/`` containing
``info.yaml`` and ``data2D.csv`` (two-row header of joint names /
x,y,confidence when KEYPOINT_NAMES matches; NaN rows for undetected frames).
Frames are decoded ahead in a prefetch thread and processed in TPU-sized
batches instead of one at a time.
"""

from __future__ import annotations

import csv
import os
import time

import numpy as np
import yaml
from tqdm import tqdm

from ..config.project_manager import ProjectManager
from ..utils import clp
from ..utils.param_classes import Predict2DParams
from . import compile_cache
from .loaders import make_predictor2d
from .video_io import open_single_video_reader


def _pod_identity(params):
    """(process_index, process_count); params override the jax runtime
    values (simulated-pod tests)."""
    import jax

    pi = getattr(params, "process_index", None)
    pc = getattr(params, "process_count", None)
    pi = jax.process_index() if pi is None else int(pi)
    pc = jax.process_count() if pc is None else int(pc)
    return pi, pc


def predict2D(params: Predict2DParams) -> str | None:
    import jax

    project = ProjectManager()
    if not project.load(params.project_name):
        clp.error(f"Could not load project: {params.project_name}! Aborting...")
        return None
    cfg = project.cfg
    compile_cache.configure(cfg, params.trt_mode)

    pi, pc = _pod_identity(params)

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
            "predictions", "predictions2D",
            f"Predictions_2D_{stamp}",
        )
    os.makedirs(params.output_dir, exist_ok=True)
    if pi == 0:
        _write_info(params)

    predictor = None  # built lazily once the frame size is known

    recording_paths = []
    multiple_videos = False
    if os.path.isfile(params.recording_path):
        recording_paths.append(params.recording_path)
    elif os.path.exists(params.recording_path):
        multiple_videos = True
        recording_paths = [
            os.path.join(params.recording_path, f)
            for f in sorted(os.listdir(params.recording_path))
        ]

    batch = int(cfg.get("TPU", {}).get("FRAME_BATCH", 8))
    num_joints = int(cfg.KEYPOINTDETECT.NUM_JOINTS)

    # multi-chip: frames data-parallel over all devices (mirrors
    # predict3D's mesh wiring; the 2D cascade has no cross-frame coupling)
    import jax

    from ..parallel.mesh import local_inference_devices, \
        plan_inference_devices

    mesh = None
    in_sharding = None
    devices, _ = plan_inference_devices(
        local_inference_devices(),
        n_data_cap=int(cfg.get("TPU", {}).get("MESH_DATA_AXIS", -1)),
    )
    n_dev = len(devices)
    if n_dev > 1:
        from jax.sharding import NamedSharding, PartitionSpec as PSpec

        from ..parallel.mesh import make_mesh

        mesh = make_mesh(n_data=n_dev, n_cameras=1, devices=devices)
        batch = max(batch, n_dev) // n_dev * n_dev  # divisible by dp
        in_sharding = NamedSharding(mesh, PSpec("data"))
        clp.info(f"Sharded 2D inference over {n_dev} devices")

    for recording_path in recording_paths:
        csv_name = "data2D.csv"
        if multiple_videos:
            stem = os.path.basename(recording_path).split(".")[0]
            csv_name = f"{stem}_{csv_name}"
        # pod streaming: each host decodes and predicts only its own
        # contiguous time slice of this video (mirrors predict3D's
        # _pod_frame_shard), writes a CSV shard, rank 0 merges below
        frame_start, number_frames, shard_suffix = (
            params.frame_start, params.number_frames, "")
        if pc > 1:
            from ..parallel.multihost import process_frame_range
            from .predict3d import _merge_pod_shards
            from .video_io import probe_frame_count

            total = params.number_frames
            if total == -1:
                probed = probe_frame_count(recording_path)
                if probed <= 0:
                    raise ValueError(
                        "Pod-sharded prediction needs a total frame count "
                        "to split, but the container reports none — pass "
                        "number_frames explicitly.")
                total = probed - params.frame_start
            lo, hi = process_frame_range(total, pi, pc)
            frame_start = params.frame_start + lo
            number_frames = hi - lo
            shard_suffix = f".part{pi:05d}"
        reader = open_single_video_reader(
            recording_path,
            backend=cfg.get("TPU", {}).get("DECODE_BACKEND"),
            frame_start=frame_start,
            number_frames=number_frames,
            batch_size=batch,
        )
        if predictor is None:
            # AOT artifact (TRT engine-file analog), keyed by input shape
            from . import export as aot

            W, H = reader.img_size
            shape = (batch, H, W, 3)
            artifact = aot.artifact_path(cfg, "predict2D", shape)
            if (params.trt_mode == "previous" and os.path.isfile(artifact)
                    and mesh is None):
                clp.info(f"Loading exported predictor: {artifact}")
                predictor = aot.load_predictor(artifact)
            else:
                predictor = make_predictor2d(
                    cfg, params.weights_center_detect,
                    params.weights_keypoint_detect,
                    mesh=mesh,
                )
                if params.trt_mode == "new":
                    aot.export_predictor(
                        predictor, np.zeros(shape, np.uint8), artifact
                    )
                    clp.info(f"Exported compiled predictor: {artifact}")
        def write_header(writer):
            if len(cfg.KEYPOINT_NAMES) == num_joints:
                _write_header(writer, cfg, per_joint=("x", "y", "confidence"))

        with open(os.path.join(params.output_dir, csv_name + shard_suffix),
                  "w", newline="") as csvfile:
            writer = csv.writer(csvfile, delimiter=",", quotechar='"',
                                quoting=csv.QUOTE_MINIMAL)
            if not shard_suffix:
                write_header(writer)

            done = 0
            bar = tqdm(total=reader.number_frames)
            # one-deep device pipeline: dispatch batch k+1 before fetching
            # batch k's results so H2D transfer overlaps TPU compute
            pending = None
            for frames, n in reader:
                outputs = predictor(jax.device_put(frames, in_sharding)
                                    if in_sharding is not None
                                    else jax.device_put(frames))
                if pending is not None:
                    done += _drain2d(writer, pending[:2], num_joints, bar,
                                     params, done, reader.number_frames)
                    reader.recycle(pending[2])
                pending = (outputs, n, frames)
            if pending is not None:
                done += _drain2d(writer, pending[:2], num_joints, bar, params,
                                 done, reader.number_frames)
                reader.recycle(pending[2])
            bar.close()
        reader.release()
        if shard_suffix:
            if jax.process_count() > 1:
                # real pod: wait for every host's shard before merging
                from jax.experimental import multihost_utils

                multihost_utils.sync_global_devices("predict2D_shards")
            if pi == 0 and getattr(params, "merge_shards", True):
                _merge_pod_shards(params.output_dir, csv_name, pc,
                                  write_header)
    return params.output_dir


def _drain2d(writer, pending, num_joints, bar, params, done, total):
    (points, conf, valid), n = pending
    points = np.asarray(points)
    conf = np.asarray(conf)
    valid = np.asarray(valid)
    for t in range(n):
        _write_row(writer, points[t], conf[t], valid[t], num_joints)
    bar.update(n)
    if params.progress_bar is not None and total:
        params.progress_bar.progress(min(1.0, (done + n) / total))
    return n


def _write_row(writer, points, conf, valid, num_joints, with_z=False):
    if not valid:
        writer.writerow(["NaN"] * (num_joints * (4 if with_z else 3)))
        return
    row = []
    for j in range(num_joints):
        row += [float(x) for x in points[j]] + [float(conf[j])]
    writer.writerow(row)


def _write_header(writer, cfg, per_joint):
    joints = [name for name in cfg.KEYPOINT_NAMES for _ in per_joint]
    coords = list(per_joint) * len(cfg.KEYPOINT_NAMES)
    writer.writerow(joints)
    writer.writerow(coords)


def _write_info(params, dataset_name=None):
    info = {
        "recording_path": params.recording_path,
        "frame_start": params.frame_start,
        "number_frames": params.number_frames,
    }
    if dataset_name is not None or hasattr(params, "dataset_name"):
        info["dataset_name"] = getattr(params, "dataset_name", dataset_name)
    with open(os.path.join(params.output_dir, "info.yaml"), "w") as f:
        yaml.safe_dump(info, f, sort_keys=False)
