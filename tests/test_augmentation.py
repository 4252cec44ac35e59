"""Augmentation pipeline tests (all random branches exercised)."""

import numpy as np

from jarvis_hybridnet_tpu.config import get_default_cfg
from jarvis_hybridnet_tpu.dataset.augmentation import AugmentationPipeline


def test_all_branches_run():
    cfg = get_default_cfg().AUGMENTATION
    img = np.random.default_rng(0).random((64, 64, 3)).astype(np.float32)
    kps = np.array([[10.0, 20.0], [0.0, 0.0], [40.0, 50.0]], np.float32)
    # many seeds so every Sometimes() branch (incl. the scalar
    # per-channel-multiply path) fires at least once
    for seed in range(64):
        pipe = AugmentationPipeline(cfg, mirror=True, affine=True, seed=seed)
        out, moved = pipe(img, kps)
        assert out.shape == img.shape and out.dtype == np.float32
        assert np.isfinite(out).all()
        # unlabeled keypoints stay (0, 0)
        assert moved[1, 0] == 0 and moved[1, 1] == 0


def test_flip_moves_keypoints():
    cfg = get_default_cfg().AUGMENTATION
    cfg.COLOR_MANIPULATION.ENABLED = False
    cfg.AFFINE_TRANSFORM.PROBABILITY = 0.0
    cfg.MIRROR.PROBABILITY = 1.0
    img = np.zeros((64, 64, 3), np.float32)
    img[:, :10] = 1.0
    kps = np.array([[10.0, 20.0]], np.float32)
    pipe = AugmentationPipeline(cfg, mirror=True, seed=0)
    out, moved = pipe(img, kps)
    assert out[:, -5:].min() == 1.0  # left band moved right
    assert moved[0, 0] == 63 - 10
    assert moved[0, 1] == 20


def test_affine_rotates_keypoints_with_image():
    import cv2

    cfg = get_default_cfg().AUGMENTATION
    cfg.COLOR_MANIPULATION.ENABLED = False
    cfg.MIRROR.PROBABILITY = 0.0
    cfg.AFFINE_TRANSFORM.PROBABILITY = 1.0
    cfg.AFFINE_TRANSFORM.ROTATION_RANGE = [90, 90]
    cfg.AFFINE_TRANSFORM.SCALE_RANGE = [1.0, 1.0]
    img = np.zeros((64, 64, 3), np.float32)
    img[20, 40] = 1.0
    kps = np.array([[40.0, 20.0]], np.float32)
    pipe = AugmentationPipeline(cfg, seed=1)
    out, moved = pipe(img, kps)
    # the bright pixel must land where the keypoint moved
    y, x = np.unravel_index(out[:, :, 0].argmax(), out[:, :, 0].shape)
    assert abs(moved[0, 0] - x) <= 1.5 and abs(moved[0, 1] - y) <= 1.5
