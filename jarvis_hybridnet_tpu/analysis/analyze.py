"""Validation-set accuracy analysis.

Equivalent of the reference analyze_validation_data
(jarvis/analysis/analyze.py:22-96): runs the fused 3D predictor over the
val split (full frames, analysisMode) and writes ``frame_names.csv``,
``points_HybridNet.csv`` and ``points_GroundTruth.csv`` to
``projects/<p>/analysis/Validation_Predictions_<ts>/``. Framesets the
network cannot detect are excluded (with a warning), like the reference.
This is the de-facto accuracy regression harness (SURVEY.md §4).
"""

from __future__ import annotations

import os
import time

import numpy as np
from tqdm import tqdm

from ..config.project_manager import ProjectManager
from ..dataset.dataset3d import Dataset3D
from ..prediction.loaders import make_predictor3d
from ..utils import clp


def _native_frameset_stream(dataset, cfg):
    """Background C++ decode of whole framesets (native.FramesetPipeline):
    full-frame JPEG decode for all cameras runs in worker threads ahead of
    the predictor, instead of 12 serial cv2 reads per frameset. None when
    the native library / JPEG-only / uniform-size preconditions fail."""
    from .. import native

    if not native.available():
        return None
    framesets = []
    size = None
    for key in dataset.frameset_keys:
        fs = dataset.dataset["framesets"][key]
        frame_ids = fs["frames"]
        if dataset.use_idxs is not None:
            frame_ids = [frame_ids[i] for i in dataset.use_idxs]
        paths = []
        for img_id in frame_ids:
            name = dataset.imgs[img_id]["file_name"]
            if not name.lower().endswith((".jpg", ".jpeg")):
                return None
            meta = dataset.imgs[img_id]
            wh = (int(meta.get("width", cfg.DATASET.IMAGE_SIZE[0])),
                  int(meta.get("height", cfg.DATASET.IMAGE_SIZE[1])))
            if size is None:
                size = wh
            elif size != wh:
                return None
            paths.append(os.path.join(dataset.root_dir, dataset.set_name,
                                      name))
        framesets.append(paths)
    if not framesets:
        return None
    return native.FramesetPipeline(framesets, size[0], size[1], prefetch=4)


def analyze_validation_data(
    project_name,
    weights_center="latest",
    weights_hybridnet="latest",
    cameras_to_use=None,
    progress_bar=None,
    frame_batch=8,
    max_framesets=None,
    repro_mode=None,
):
    project = ProjectManager()
    if not project.load(project_name):
        return None
    cfg = project.get_cfg()
    if repro_mode is not None:
        # protocol-level fidelity comparisons (BASELINE.md "Fidelity at the
        # trained checkpoint"): run the same eval in exact/half_fused/
        # quarter_fused numerics without editing the project config
        cfg.TPU.REPRO_MODE = repro_mode

    output_dir = os.path.join(
        project.parent_dir, cfg.PROJECTS_ROOT_PATH, project_name,
        "analysis", f'Validation_Predictions_{time.strftime("%Y%m%d-%H%M%S")}',
    )
    os.makedirs(output_dir)

    dataset = Dataset3D(cfg, set="val", analysisMode=True,
                        cameras_to_use=cameras_to_use)
    if max_framesets is not None:
        dataset.frameset_keys = dataset.frameset_keys[:max_framesets]
        dataset.keypoints3D = dataset.keypoints3D[:max_framesets]

    points_net, points_gt, filenames = [], [], []
    # one predictor per calibration session (camera matrices are baked into
    # the jitted graph); typically there is a single session
    predictors = {}

    n = len(dataset)
    buf, metas = [], []

    def flush():
        if not buf:
            return
        name = metas[0][1]
        if name not in predictors:
            predictors[name] = make_predictor3d(
                cfg, dataset.rigs[name], weights_center, weights_hybridnet
            )
        n = len(buf)
        imgs = np.stack(buf)
        if n < frame_batch:
            # zero-pad the tail batch: a smaller leading dim would retrace
            # and recompile the whole fused cascade
            pad = np.repeat(imgs[-1:], frame_batch - n, axis=0)
            imgs = np.concatenate([imgs, pad], axis=0)
        pts, conf, valid = predictors[name](imgs)
        pts, valid = np.asarray(pts)[:n], np.asarray(valid)[:n]
        for sample_meta, p, v in zip(metas, pts, valid):
            kp3d, _, fname = sample_meta[0], sample_meta[1], sample_meta[2]
            if v:
                points_net.append(p)
                points_gt.append(kp3d)
                filenames.append(fname)
        buf.clear()
        metas.clear()

    pipeline = _native_frameset_stream(dataset, cfg)

    def meta_for(idx):
        fs = dataset.dataset["framesets"][dataset.frameset_keys[idx]]
        kp3d = dataset.keypoints3D[idx].astype(np.float32)
        return (kp3d, fs["datasetName"],
                dataset.imgs[fs["frames"][0]]["file_name"])

    if pipeline is not None:
        # uint8 framesets streamed by the C++ prefetcher; the fused
        # predictor's uint8 path applies the /255 on-device
        for count, (idx, imgs) in enumerate(tqdm(pipeline, total=n)):
            m = meta_for(idx)
            if metas and metas[0][1] != m[1]:
                flush()
            buf.append(imgs)
            metas.append(m)
            if len(buf) == frame_batch:
                flush()
            if progress_bar is not None:
                progress_bar.progress((count + 1) / n)
        pipeline.close()
    else:
        for idx in tqdm(range(n)):
            s = dataset[idx]
            if metas and metas[0][1] != s["dataset_name"]:
                flush()
            buf.append(s["imgs"])
            metas.append((s["keypoints3D"], s["dataset_name"],
                          s["file_name"]))
            if len(buf) == frame_batch:
                flush()
            if progress_bar is not None:
                progress_bar.progress((idx + 1) / n)
    flush()

    clp.success("Successfully analysed all validation frames!")
    if len(points_net) != n:
        clp.warning(
            f"Network could not detect instance in {n - len(points_net)} "
            "frameSets. Those were not included in the output files!"
        )

    J = int(cfg.KEYPOINTDETECT.NUM_JOINTS)
    np.savetxt(os.path.join(output_dir, "frame_names.csv"),
               np.array(filenames), delimiter=",", fmt="%s")
    np.savetxt(os.path.join(output_dir, "points_HybridNet.csv"),
               np.array(points_net).reshape(-1, J * 3), delimiter=",")
    np.savetxt(os.path.join(output_dir, "points_GroundTruth.csv"),
               np.array(points_gt).reshape(-1, J * 3), delimiter=",")
    return output_dir
