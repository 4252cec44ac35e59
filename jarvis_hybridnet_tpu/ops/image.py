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

import jax
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


def _strided(x: jnp.ndarray, axis: int, start: int, step: int,
             count: int) -> jnp.ndarray:
    return jax.lax.slice_in_dim(
        x, start, start + (count - 1) * step + 1, stride=step, axis=axis
    )


def _resize_axis(x: jnp.ndarray, axis: int, out_size: int) -> jnp.ndarray:
    in_size = x.shape[axis]
    if in_size == out_size and jnp.issubdtype(x.dtype, jnp.floating):
        return x
    # Fast path: integer downscale ratios lower to strided slices, which are
    # plain TPU copies — an index-array take lowers to a pathological gather.
    # Half-pixel mapping: src = r*i + (r-1)/2, so odd ratios sample exactly
    # one element and even ratios blend two with weight 1/2.
    if in_size % out_size == 0 and in_size != out_size:
        r = in_size // out_size
        if r % 2 == 1:
            return _strided(x, axis, (r - 1) // 2, r, out_size).astype(
                jnp.float32
            )
        a = _strided(x, axis, r // 2 - 1, r, out_size).astype(jnp.float32)
        b = _strided(x, axis, r // 2, r, out_size).astype(jnp.float32)
        return 0.5 * (a + b)
    i0, i1, w1 = _linear_tables(out_size, in_size)
    a = jnp.take(x, jnp.asarray(i0), axis=axis).astype(jnp.float32)
    b = jnp.take(x, jnp.asarray(i1), axis=axis).astype(jnp.float32)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w = jnp.asarray(w1).reshape(shape)
    return a * (1.0 - w) + b * w


def resize_bilinear(x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Resize (..., H, W, C) to (..., height, width, C), no antialias.

    uint8 inputs are gathered as uint8 and blended in float32; the output
    is float32 in the input's value range.

    Axis order is H then W. Measured on the 96-frame 12-cam batch
    (tools/micro_bench.py): strided access along W costs per *element*
    (it breaks the lane tiling), so the fastest schedule minimizes the
    element count passing through the W pass — blend H first (sublane
    slices are cheap), then slice W once on the narrowed intermediate.
    Alternatives measured slower: W-first (13.8 ms vs 6.0), all-slices-
    first on uint8 (11.0 ms — the W slice runs once per H tap).

    For bf16 pipelines with integer downscale ratios, see
    ``resize_bilinear_mxu``.
    """
    h_axis, w_axis = x.ndim - 3, x.ndim - 2
    return (
        _resize_axis(_resize_axis(x, h_axis, height), w_axis, width)
    )


@functools.lru_cache(maxsize=None)
def _selection_matrix(in_size: int, out_size: int):
    """(in, out) resampling matrix for an integer half-pixel downscale."""
    m = np.zeros((in_size, out_size), np.float32)
    r = in_size // out_size
    idx = np.arange(out_size)
    if r % 2 == 1:
        m[idx * r + (r - 1) // 2, idx] = 1.0
    else:
        m[idx * r + r // 2 - 1, idx] = 0.5
        m[idx * r + r // 2, idx] += 0.5
    return m


def resize_bilinear_mxu(
    x: jnp.ndarray, height: int, width: int, dtype=jnp.bfloat16
) -> jnp.ndarray:
    """Integer-ratio resize as two MXU selection matmuls; returns ``dtype``.

    Both axis reductions run as selection-matrix matmuls in ``dtype`` on
    the MXU — the uint8 cast fuses into the first matmul's operand read
    and no full-width float intermediate is ever materialized (measured
    4.1 ms vs 6.0 ms for the slice/blend schedule on the 96-frame batch,
    tools/micro_bench.py). bf16 blending rounds half-integer blend
    results (ulp(255) = 1), so this path is only for pipelines whose next
    consumer is bf16 anyway; use ``resize_bilinear`` for exact float32
    resampling. Falls back to the exact path for non-integer ratios.
    """
    h_axis, w_axis = x.ndim - 3, x.ndim - 2
    H, W = x.shape[h_axis], x.shape[w_axis]
    if H % height or W % width:
        return resize_bilinear(x, height, width).astype(dtype)
    hsel = jnp.asarray(_selection_matrix(H, height), dtype)
    wsel = jnp.asarray(_selection_matrix(W, width), dtype)
    y = jnp.einsum("...hwc,hs->...swc", x.astype(dtype), hsel,
                   preferred_element_type=dtype)
    return jnp.einsum("...hwc,ws->...hsc", y, wsel,
                      preferred_element_type=dtype)


def normalize_imagenet(
    x: jnp.ndarray, mean, std
) -> jnp.ndarray:
    """(x - mean) / std over the trailing channel axis."""
    mean = jnp.asarray(mean, dtype=x.dtype)
    std = jnp.asarray(std, dtype=x.dtype)
    return (x - mean) / std
