"""Image ops with torch-matching numerics.

``resize_bilinear`` replicates torchvision's tensor resize as used by the
reference predictors (jarvis/prediction/jarvis2D.py:111-112,
jarvis3D.py:143-144): half-pixel-center bilinear *without* antialiasing
(2-tap kernel regardless of scale) — jax.image.resize would antialias when
downsampling and deviate. Index/weight tables are static per (in, out) pair,
so under jit this lowers to two cheap gathers per axis.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _linear_tables(out_size: int, in_size: int):
    i = np.arange(out_size, dtype=np.float64)
    s = (i + 0.5) * (in_size / out_size) - 0.5
    s = np.clip(s, 0.0, in_size - 1)
    i0 = np.floor(s).astype(np.int32)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w1 = (s - i0).astype(np.float32)
    return i0, i1, w1


def _resize_axis(x: jnp.ndarray, axis: int, out_size: int) -> jnp.ndarray:
    if x.shape[axis] == out_size:
        return x
    i0, i1, w1 = _linear_tables(out_size, x.shape[axis])
    a = jnp.take(x, jnp.asarray(i0), axis=axis)
    b = jnp.take(x, jnp.asarray(i1), axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w = jnp.asarray(w1).reshape(shape)
    return a * (1.0 - w) + b * w


def resize_bilinear(x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Resize (..., H, W, C) to (..., height, width, C), no antialias."""
    x = _resize_axis(x, x.ndim - 3, height)
    x = _resize_axis(x, x.ndim - 2, width)
    return x


def normalize_imagenet(
    x: jnp.ndarray, mean, std
) -> jnp.ndarray:
    """(x - mean) / std over the trailing channel axis."""
    mean = jnp.asarray(mean, dtype=x.dtype)
    std = jnp.asarray(std, dtype=x.dtype)
    return (x - mean) / std
