"""Augmentation pipeline tests (all random branches exercised), plus
host<->device equivalence for the on-device color pipeline
(ops/augment.py, TPU.DEVICE_AUG)."""

import numpy as np

from jarvis_hybridnet_tpu.config import get_default_cfg
from jarvis_hybridnet_tpu.dataset.augmentation import AugmentationPipeline
from jarvis_hybridnet_tpu.ops.augment import (
    PARAM_KEYS,
    make_color_aug,
    sample_color_params,
)


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


def _pinned_color_cfg(sigma=0.4):
    """Every component fires with a single-point parameter range, so the
    host pipeline's internal draws and sample_color_params produce the
    SAME values and the two pipelines are comparable pixel-for-pixel.
    Noise stays off here — it is distribution-equivalent by construction
    (independent normal fields), never bitwise."""
    cfg = get_default_cfg().AUGMENTATION
    cm = cfg.COLOR_MANIPULATION
    cm.ENABLED = True
    cm.GAUSSIAN_BLUR.PROBABILITY = 1.0
    cm.GAUSSIAN_BLUR.SIGMA = [sigma, sigma]
    cm.GAUSSIAN_NOISE.SCALE = [0.0, 0.0]
    cm.LINEAR_CONTRAST.PROBABILITY = 1.0
    cm.LINEAR_CONTRAST.SCALE = [1.13, 1.13]
    cm.MULTIPLY.PROBABILITY = 1.0
    cm.MULTIPLY.SCALE = [0.9, 0.9]
    cm.PER_CHANNEL_MULTIPLY.PROBABILITY = 1.0
    cm.PER_CHANNEL_MULTIPLY.PER_CHANNEL_PROBABILITY = 0.0
    cm.PER_CHANNEL_MULTIPLY.SCALE = [1.07, 1.07]
    return cfg


def test_device_color_aug_matches_host_pinned():
    """ops/augment.py device pipeline == AugmentationPipeline._color at
    pinned parameters — blur taps/edges (cv2 GaussianBlur ksize=(0,0),
    BORDER_REFLECT_101), op order, and the single final clip. σ=0.4 and
    0.5 both map to radius 2 under cv2's ksize rule AND ours."""
    import jax.numpy as jnp

    for sigma in (0.4, 0.5):
        cfg = _pinned_color_cfg(sigma)
        img = np.random.default_rng(3).random((40, 48, 3), np.float64)
        img = img.astype(np.float32)
        host = AugmentationPipeline(cfg, mirror=False, affine=False,
                                    seed=0)._color(img)

        params = sample_color_params(cfg.COLOR_MANIPULATION,
                                     np.random.default_rng(1), 2)
        assert set(params) == set(PARAM_KEYS)
        apply = make_color_aug(cfg)
        dev = np.asarray(apply(
            jnp.asarray(np.stack([img, img])),
            {k: jnp.asarray(v) for k, v in params.items()}))
        np.testing.assert_allclose(dev[0], host, atol=2e-4)
        np.testing.assert_allclose(dev[1], host, atol=2e-4)


def test_device_color_aug_zero_sigma_is_identity():
    """Images whose blur didn't fire (sigma 0 -> delta taps) pass through
    the static-radius separable blur unchanged."""
    import jax.numpy as jnp

    cfg = _pinned_color_cfg(0.5)
    cm = cfg.COLOR_MANIPULATION
    cm.LINEAR_CONTRAST.SCALE = [1.0, 1.0]
    cm.MULTIPLY.SCALE = [1.0, 1.0]
    cm.PER_CHANNEL_MULTIPLY.SCALE = [1.0, 1.0]
    apply = make_color_aug(cfg)
    img = np.random.default_rng(5).random((16, 16, 3)).astype(np.float32)
    params = sample_color_params(cm, np.random.default_rng(2), 2)
    params["blur_sigma"] = np.array([0.0, 0.5], np.float32)
    out = np.asarray(apply(jnp.asarray(np.stack([img, img])),
                           {k: jnp.asarray(v) for k, v in params.items()}))
    np.testing.assert_allclose(out[0], img, atol=1e-6)  # delta kernel
    assert np.abs(out[1] - img).max() > 1e-3  # real blur happened


def test_device_color_aug_noise_per_channel_flag():
    """noise_pc=0 broadcasts ONE field across channels (host path's
    (H, W, 1) draw); noise_pc=1 gives independent per-channel fields;
    realized noise std tracks the requested scale."""
    import jax.numpy as jnp

    cfg = get_default_cfg().AUGMENTATION
    cm = cfg.COLOR_MANIPULATION
    cm.ENABLED = True
    cm.GAUSSIAN_BLUR.PROBABILITY = 0.0
    cm.GAUSSIAN_NOISE.SCALE = [0.05, 0.05]
    cm.LINEAR_CONTRAST.PROBABILITY = 0.0
    cm.MULTIPLY.PROBABILITY = 0.0
    cm.PER_CHANNEL_MULTIPLY.PROBABILITY = 0.0
    apply = make_color_aug(cfg)
    img = np.full((64, 64, 3), 0.5, np.float32)
    params = sample_color_params(cm, np.random.default_rng(0), 2)
    params["noise_pc"] = np.array([0.0, 1.0], np.float32)
    out = np.asarray(apply(jnp.asarray(np.stack([img, img])),
                           {k: jnp.asarray(v) for k, v in params.items()}))
    d = out - img
    # shared field: channels identical
    np.testing.assert_allclose(d[0, :, :, 0], d[0, :, :, 1], atol=1e-7)
    # independent fields: channels differ
    assert np.abs(d[1, :, :, 0] - d[1, :, :, 1]).max() > 1e-3
    assert 0.03 < d[0].std() < 0.07  # std ~ scale (clip shaves a little)


def test_device_color_aug_disabled_passthrough():
    cfg = get_default_cfg().AUGMENTATION
    cfg.COLOR_MANIPULATION.ENABLED = False
    apply = make_color_aug(cfg)
    img = np.random.default_rng(1).random((8, 8, 3)).astype(np.float32)
    out = apply(img[None], None)
    np.testing.assert_array_equal(np.asarray(out)[0], img)


def test_device_aug_2d_full_pipeline_matches_host_order_variant():
    """The 2D device-aug contract, pinned end to end: host mirror/affine
    (AugmentationPipeline.geometric) -> device color (make_color_aug) ->
    device border re-zero (make_border_zero) equals the same ops run
    entirely on the host in that order. This is the exact pipeline
    trainer2d's jitted step executes under TPU.DEVICE_AUG; the op-order
    deviation vs the all-host path (color first, reference
    dataset2D.py:97-126) is intentional and documented in PARITY.md."""
    import jax.numpy as jnp

    from jarvis_hybridnet_tpu.ops.augment import make_border_zero

    cfg = _pinned_color_cfg(0.5)
    cfg.MIRROR.PROBABILITY = 1.0
    cfg.AFFINE_TRANSFORM.PROBABILITY = 1.0
    cfg.AFFINE_TRANSFORM.ROTATION_RANGE = [11.0, 11.0]
    cfg.AFFINE_TRANSFORM.SCALE_RANGE = [1.06, 1.06]

    img = np.random.default_rng(4).random((64, 64, 3)).astype(np.float32)
    kps = np.array([[10.0, 20.0], [40.0, 50.0]], np.float32)
    pipe = AugmentationPipeline(cfg, mirror=True, affine=True, seed=0)
    warped, moved, minv = pipe.geometric(img, kps)
    assert not np.allclose(minv, np.eye(2, 3))  # affine actually fired

    # host-order-variant reference: color on the warped image, then the
    # same outside-frame mask the device applies
    host_color = AugmentationPipeline(cfg, mirror=False, affine=False,
                                      seed=0)._color(warped)
    ys, xs = np.mgrid[0:64, 0:64].astype(np.float32)
    sx = minv[0, 0] * xs + minv[0, 1] * ys + minv[0, 2]
    sy = minv[1, 0] * xs + minv[1, 1] * ys + minv[1, 2]
    inside = (sx >= 0) & (sx <= 63) & (sy >= 0) & (sy <= 63)
    host_ref = host_color * inside[..., None]

    params = sample_color_params(cfg.COLOR_MANIPULATION,
                                 np.random.default_rng(1), 1)
    apply = make_color_aug(cfg)
    border = make_border_zero()
    dev = border(
        apply(jnp.asarray(warped)[None],
              {k: jnp.asarray(v) for k, v in params.items()}),
        jnp.asarray(minv)[None])
    np.testing.assert_allclose(np.asarray(dev)[0], host_ref, atol=2e-4)


def test_border_zero_identity_is_noop():
    import jax.numpy as jnp

    from jarvis_hybridnet_tpu.ops.augment import make_border_zero

    border = make_border_zero()
    img = np.random.default_rng(2).random((2, 32, 48, 3)).astype(np.float32)
    ident = np.tile(np.eye(2, 3, dtype=np.float32), (2, 1, 1))
    out = np.asarray(border(jnp.asarray(img), jnp.asarray(ident)))
    np.testing.assert_array_equal(out, img)


def test_dataset2d_device_aug_sample_structure():
    """Train samples under device_aug carry (uint8 img, kps, record) with
    the full parameter pytree + the affine inverse; the val split and the
    device_aug=False path keep the 2-tuple contract."""
    from jarvis_hybridnet_tpu.config import ProjectManager
    from jarvis_hybridnet_tpu.dataset.dataset2d import Dataset2D

    pm = ProjectManager(parent_dir="/root/reference")
    assert pm.load("Example_Project")
    cfg = pm.get_cfg()
    ds = Dataset2D(cfg, set="train", mode="KeypointDetect",
                   device_targets=True, device_aug=True)
    s = ds[0]
    assert len(s) == 3
    img, kps, rec = s
    assert img.dtype == np.uint8
    assert set(rec) == set(PARAM_KEYS) | {"minv"}
    assert rec["minv"].shape == (2, 3)
    for k in PARAM_KEYS:  # squeezed per-sample leaves -> (B, ...) batches
        assert np.ndim(rec[k]) in (0, 1), (k, np.shape(rec[k]))

    val = Dataset2D(cfg, set="val", mode="KeypointDetect",
                    device_targets=True, device_aug=True)
    assert len(val[0]) == 2  # no aug on val regardless of the flag
    plain = Dataset2D(cfg, set="train", mode="KeypointDetect",
                      device_targets=True)
    assert len(plain[0]) == 2


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
