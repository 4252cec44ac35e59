"""On-device training-time color augmentation.

TPU-first split of the color pipeline in
``dataset/augmentation.py::AugmentationPipeline._color`` (itself the
equivalent of the reference's imgaug color block,
jarvis/dataset/dataset3D.py:143-166): the host samples only the
per-image *parameters* — a handful of scalars per camera crop,
microseconds — and the pixel work (Gaussian blur, additive Gaussian
noise, linear contrast, global and per-channel gain) runs inside the
jitted train step, where XLA fuses it into the existing
uint8→f32/255→normalize prologue.

Why: the host-side numpy/cv2 color pass measured 34.2 ms/sample = 33.2%
of the whole 3D train-sample build and was the largest GIL-held
component after the round-4 thin contract moved target rendering on
device (BASELINE.md, host split at HEAD). Shipping raw uint8 crops plus
a ~100-byte parameter record removes that cost from the host budget
entirely, and also removes the f32→uint8 re-quantization the thin
contract previously paid (pixels now reach the device bit-identical to
the JPEG source). The device cost is a few elementwise passes over a
~2 MB batch — noise in the HBM-bound train step's shadow.

Fidelity vs the host pipeline: identical parameter distributions (the
host sampler below mirrors ``_color``'s draw structure), identical op
order (blur → noise → contrast → multiply → per-channel multiply →
single final clip), and the blur matches ``cv2.GaussianBlur(ksize=(0,0))``
semantics — separable Gaussian taps truncated at radius round(4σ_max)
with BORDER_REFLECT_101 edges (``jnp.pad mode='reflect'``). Equivalence
at pinned parameters is tested in tests/test_augmentation.py.
"""

from __future__ import annotations

import numpy as np

PARAM_KEYS = ("blur_sigma", "noise_scale", "noise_pc", "noise_seed",
              "contrast", "mul", "chan_mul")


def sample_color_params(cm_cfg, rng, n: int) -> dict:
    """Draw per-image color-aug parameters for ``n`` images on the host.

    ``rng`` is the dataset's augmentation stream
    (utils/rng.ThreadLocalGenerator) so the parameters inherit the
    loader's absolute-epoch reseeding and preemption-replay determinism
    exactly as the host pipeline's draws did. Inactive components get
    their neutral value (sigma 0, gain 1) rather than being omitted, so
    the shipped pytree structure — and therefore the jitted step's
    signature — is identical across batches.
    """
    def span(r):
        return float(r[0]), float(r[1])

    blo, bhi = span(cm_cfg.GAUSSIAN_BLUR.SIGMA)
    blur_on = rng.random(n) < float(cm_cfg.GAUSSIAN_BLUR.PROBABILITY)
    blur_sigma = np.where(blur_on, rng.uniform(blo, bhi, n), 0.0)

    nlo, nhi = span(cm_cfg.GAUSSIAN_NOISE.SCALE)
    noise_scale = rng.uniform(nlo, nhi, n)
    noise_pc = (rng.random(n)
                < float(cm_cfg.GAUSSIAN_NOISE.PER_CHANNEL_PROBABILITY))
    noise_seed = rng.integers(0, 2**31 - 1, n).astype(np.uint32)

    clo, chi = span(cm_cfg.LINEAR_CONTRAST.SCALE)
    con_on = rng.random(n) < float(cm_cfg.LINEAR_CONTRAST.PROBABILITY)
    contrast = np.where(con_on, rng.uniform(clo, chi, n), 1.0)

    mlo, mhi = span(cm_cfg.MULTIPLY.SCALE)
    mul_on = rng.random(n) < float(cm_cfg.MULTIPLY.PROBABILITY)
    mul = np.where(mul_on, rng.uniform(mlo, mhi, n), 1.0)

    pcm = cm_cfg.PER_CHANNEL_MULTIPLY
    plo, phi = span(pcm.SCALE)
    pcm_on = rng.random(n) < float(pcm.PROBABILITY)
    pcm_pc = rng.random(n) < float(pcm.PER_CHANNEL_PROBABILITY)
    f3 = rng.uniform(plo, phi, (n, 3))
    f1 = rng.uniform(plo, phi, (n, 1))
    chan_mul = np.where(pcm_on[:, None],
                        np.where(pcm_pc[:, None], f3, f1), 1.0)

    return {
        "blur_sigma": blur_sigma.astype(np.float32),
        "noise_scale": noise_scale.astype(np.float32),
        "noise_pc": noise_pc.astype(np.float32),
        "noise_seed": noise_seed,
        "contrast": contrast.astype(np.float32),
        "mul": mul.astype(np.float32),
        "chan_mul": chan_mul.astype(np.float32),
    }


def make_border_zero():
    """Build the jittable warp-border re-zero closure (2D device aug).

    The 2D train path warps on the host (cv2.warpAffine, BORDER_CONSTANT
    0) *before* the on-device color ops; contrast/gain would lift the
    warp's black out-of-frame border to a nonzero flat value, so after
    color the step re-zeroes every output pixel whose inverse-mapped
    source center falls outside the frame. ``apply(x, minv)`` takes
    ``x`` of shape ``lead + (H, W, 3)`` and ``minv`` of shape
    ``lead + (2, 3)`` — the dst→src affine recorded by
    ``dataset/augmentation.py::AugmentationPipeline.geometric``
    (identity rows when no affine triggered → no-op mask). The zeroed
    band is ≤1 px wider than cv2's exact partial-support falloff (pixels
    with partial out-of-frame bilinear support are fully zeroed here);
    the band is already an interpolation artifact, and the pinned
    host==device contract in tests/test_augmentation.py includes this
    mask."""
    import jax.numpy as jnp

    def apply(x, minv):
        h, w = x.shape[-3], x.shape[-2]
        xo = jnp.arange(w, dtype=jnp.float32)[None, :]
        yo = jnp.arange(h, dtype=jnp.float32)[:, None]
        a = minv[..., 0, 0][..., None, None]
        b = minv[..., 0, 1][..., None, None]
        c = minv[..., 0, 2][..., None, None]
        d = minv[..., 1, 0][..., None, None]
        e = minv[..., 1, 1][..., None, None]
        f = minv[..., 1, 2][..., None, None]
        sx = a * xo + b * yo + c
        sy = d * xo + e * yo + f
        inside = ((sx >= 0.0) & (sx <= w - 1.0)
                  & (sy >= 0.0) & (sy <= h - 1.0))
        return x * inside[..., None].astype(x.dtype)

    return apply


def _sep_blur(x, taps, radius: int):
    """Separable blur with per-image taps, BORDER_REFLECT_101 edges.

    Per-image kernels rule out a single weight-shared convolution, so
    each pass is a static shift-multiply-accumulate over 2·radius+1
    slices — K fused elementwise FMAs per axis, which XLA keeps in the
    HBM-bound regime (no MXU needed, no gather). ``taps`` has shape
    ``lead + (K,)``; ``x`` is ``lead + (H, W, 3)``.
    """
    import jax.numpy as jnp
    from jax import lax

    k_taps = taps.shape[-1]
    lead_nd = x.ndim - 3

    def tap(k):
        return taps[..., k][..., None, None, None]

    h = x.shape[-3]
    xp = jnp.pad(x, [(0, 0)] * lead_nd + [(radius, radius), (0, 0), (0, 0)],
                 mode="reflect")
    x = sum(tap(k) * lax.slice_in_dim(xp, k, k + h, axis=-3)
            for k in range(k_taps))
    w = x.shape[-2]
    xp = jnp.pad(x, [(0, 0)] * lead_nd + [(0, 0), (radius, radius), (0, 0)],
                 mode="reflect")
    x = sum(tap(k) * lax.slice_in_dim(xp, k, k + w, axis=-2)
            for k in range(k_taps))
    return x


def make_color_aug(aug_cfg):
    """Build the jittable device-side color-aug closure.

    Static structure (which components compile in, the blur tap count)
    is baked from the config here, so disabled components cost nothing
    at trace time. The returned ``apply(x, p)`` takes f32 images in
    [0, 1] of shape ``lead + (H, W, 3)`` with ``lead`` of rank 1
    (dataset-level: cameras) or 2 (step-level: batch, cameras) and the
    parameter pytree from :func:`sample_color_params` with matching
    leading shape.
    """
    import jax
    import jax.numpy as jnp

    cm = aug_cfg.COLOR_MANIPULATION
    enabled = bool(cm.ENABLED)
    sig_hi = float(cm.GAUSSIAN_BLUR.SIGMA[1])
    use_blur = (enabled and float(cm.GAUSSIAN_BLUR.PROBABILITY) > 0.0
                and sig_hi > 1e-3)
    # cv2.GaussianBlur(ksize=(0,0), sigma) for float images uses
    # ksize = 2*round(4*sigma)+1; taking the config's sigma upper bound
    # keeps the tap count static for XLA while never truncating harder
    # than cv2 would.
    radius = max(1, int(round(4.0 * sig_hi)))
    use_noise = enabled and float(cm.GAUSSIAN_NOISE.SCALE[1]) > 0.0

    def apply(x, p):
        if not enabled:
            return x
        h, w = x.shape[-3], x.shape[-2]

        if use_blur:
            offs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
            sig = jnp.maximum(p["blur_sigma"], 1e-3)[..., None]
            taps = jnp.exp(-(offs ** 2) / (2.0 * sig * sig))
            taps = taps / taps.sum(axis=-1, keepdims=True)
            delta = (offs == 0).astype(jnp.float32)
            taps = jnp.where((p["blur_sigma"] > 1e-3)[..., None],
                             taps, delta)
            x = _sep_blur(x, taps, radius)

        if use_noise:
            def one(seed):
                return jax.random.normal(jax.random.PRNGKey(seed),
                                         (h, w, 3), jnp.float32)

            # nested vmaps (not flatten+vmap) keep the lead axes — and
            # their mesh shardings, e.g. ('data','cameras') — intact
            draw = one
            for _ in range(p["noise_seed"].ndim):
                draw = jax.vmap(draw)
            noise = draw(p["noise_seed"])
            pc = p["noise_pc"][..., None, None, None]
            # per_channel: independent field per channel; otherwise the
            # host path broadcasts one (H, W, 1) field — channel 0 here
            noise = noise * pc + noise[..., :1] * (1.0 - pc)
            x = x + noise * p["noise_scale"][..., None, None, None]

        x = (x - 0.5) * p["contrast"][..., None, None, None] + 0.5
        x = x * p["mul"][..., None, None, None]
        x = x * p["chan_mul"][..., None, None, :]
        return jnp.clip(x, 0.0, 1.0)

    return apply
