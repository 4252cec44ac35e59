"""Overlay reprojected 3D poses on every camera's video
(reference: jarvis/visualization/create_videos3D.py:22-143): reads the
data3D.csv, reprojects each frame's 3D pose into all cameras (host numpy),
and writes one overlay mp4 per selected camera."""

from __future__ import annotations

import os
import time

import numpy as np
from tqdm import tqdm

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from ..config.project_manager import ProjectManager
from ..prediction.predict3d import get_camera_rig
from ..utils import clp
from ..utils.param_classes import CreateVideos3DParams
from ..utils.reprojection import project_points
from ..utils.skeleton import get_skeleton
from . import visualization_utils as utils


def _has_text_header(csv_path: str) -> bool:
    """True when the CSV starts with the two-row joint-name header. A NaN
    check on the first value would misfire on an undetected (all-'NaN')
    first frame row, which is numeric."""
    with open(csv_path) as f:
        first = f.readline().split(",")[0].strip()
    try:
        float(first)
        return False
    except ValueError:
        return True


def create_videos3D(params: CreateVideos3DParams) -> str | None:
    project = ProjectManager()
    if not project.load(params.project_name):
        clp.error(f"Could not load project: {params.project_name}!")
        return None
    cfg = project.cfg
    rig = get_camera_rig(cfg, params.dataset_name)

    params.output_dir = os.path.join(
        project.parent_dir, cfg.PROJECTS_ROOT_PATH, params.project_name,
        "visualization", f'Videos_3D_{time.strftime("%Y%m%d-%H%M%S")}',
    )
    os.makedirs(params.output_dir, exist_ok=True)

    from ..prediction.video_io import get_video_paths

    video_paths = get_video_paths(params.recording_path, rig.camera_names)
    make_video = [
        not params.video_cam_list or camera in params.video_cam_list
        for camera in rig.camera_names
    ]

    caps, outs = [], []
    img_size = [0, 0]
    for i, path in enumerate(video_paths):
        cap = cv2.VideoCapture(path)
        size = [int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
                int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))]
        assert img_size == [0, 0] or img_size == size, (
            "All videos need to have the same resolution")
        img_size = size
        cap.set(cv2.CAP_PROP_POS_FRAMES, params.frame_start)
        caps.append(cap)
        if make_video[i]:
            stem = os.path.basename(path).split(".")[0]
            outs.append(cv2.VideoWriter(
                os.path.join(params.output_dir, stem + ".mp4"),
                cv2.VideoWriter_fourcc("m", "p", "4", "v"),
                cap.get(cv2.CAP_PROP_FPS), (img_size[0], img_size[1]),
            ))
        else:
            outs.append(None)

    colors, line_idxs = get_skeleton(cfg)
    data = np.genfromtxt(params.data_csv, delimiter=",")
    if _has_text_header(params.data_csv):
        data = data[2:]
    points3D = np.delete(data, list(range(3, data.shape[1], 4)), axis=1)

    total = int(caps[0].get(cv2.CAP_PROP_FRAME_COUNT))
    if params.number_frames == -1:
        params.number_frames = total - params.frame_start
    else:
        assert params.frame_start + params.number_frames <= total

    for frame_num in tqdm(range(min(params.number_frames, len(points3D)))):
        imgs = []
        for cap in caps:
            ret, img = cap.read()
            imgs.append(img if ret else None)
        pts3d = points3D[frame_num].reshape(-1, 3)
        if not np.isnan(pts3d[0, 0]):
            points2D = np.asarray(project_points(
                pts3d.astype(np.float32), rig.camera_matrices,
                rig.intrinsics, rig.distortions,
            ))  # (J, C, 2)
            for ci in range(len(caps)):
                if make_video[ci] and imgs[ci] is not None:
                    cam_pts = points2D[:, ci]
                    for line in line_idxs:
                        utils.draw_line(imgs[ci], line, cam_pts, img_size,
                                        colors[line[1]])
                    for j, pt in enumerate(cam_pts):
                        utils.draw_point(imgs[ci], pt, img_size, colors[j])
        for ci, out in enumerate(outs):
            if out is not None and imgs[ci] is not None:
                out.write(imgs[ci])
        if params.progress_bar is not None:
            params.progress_bar.progress(
                (frame_num + 1) / params.number_frames)

    for out in outs:
        if out is not None:
            out.release()
    for cap in caps:
        cap.release()
    return params.output_dir
