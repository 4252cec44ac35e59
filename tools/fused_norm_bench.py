"""Fused one-pass InstanceNorm(+SiLU) Pallas kernel — REJECTED, kept as
the measured experiment (see BASELINE.md "fused-IN kernel" note).

Hypothesis (round 3): the HBM-bound 2D cascades re-read every
InstanceNorm input once for the (mean, var) statistics pass, so a
one-pass kernel that keeps a sample's feature map VMEM-resident should
cut one HBM read per IN (~0.6 GB per 96-crop KeypointDetect batch).

Measured result on the bench chip (this tool, chained in-graph so launch
overhead amortizes): the kernel runs at ~140 GB/s effective and loses
2-4x to plain XLA at every production shape. Two reasons, both
structural:

1. XLA already fuses the normalize of one IN into the stats pass of the
   next elementwise consumer, so its real in-graph footprint is ~2x the
   feature map (measured 850 GB/s effective at the 3x-footprint
   accounting), not the naive 3x — the byte saving the kernel targets
   mostly does not exist inside a compiled graph.
2. The kernel is VPU-throughput-bound, not DMA-bound: ~10 vector ops
   per element (f32 cast, square, two reduction chains, normalize,
   sigmoid) cap it far below the 819 GB/s HBM roofline, and packing
   multiple samples per grid step (latency hiding) does not move it.

Numerics match ``models.layers.instance_norm`` (reference semantics:
torch nn.InstanceNorm2d defaults — eps=1e-5, no affine, biased variance;
jarvis/efficienttrack/efficientnet.py:50) to float32 round-off.

Kernel layout notes kept for future reference: each sample flattens to
(H*W // FOLD, FOLD * C) with FOLD chosen so the minor dim is a multiple
of 128 (channel-minor would lane-pad C -> 128, an 8x VMEM blowup at the
stem's C=16). Per-channel statistics reduce the sublane axis with a
plain sum, then fold the spatial groups out of the lane axis with a
one-hot selector matmul (Mosaic does not support lane->sublane
reshapes); the inverse selector broadcasts the statistics back.

Usage:  python tools/fused_norm_bench.py [--iters 30] [--chain 20]
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from jarvis_hybridnet_tpu.models.layers import instance_norm, silu



# VMEM budget per block (input + output + double buffering leaves ~4x
# headroom under the ~16 MB/core budget).
_MAX_BLOCK_BYTES = 2 * 1024 * 1024


def _kernel(x_ref, o_ref, *, samples: int, rows: int, cols: int,
            channels: int, eps: float, apply_silu: bool):
    """One grid step = ``samples`` samples, each laid out as (rows, cols)
    with cols = spatial_fold * channels (spatial-major, channel-minor).
    The per-sample loop is unrolled so the independent reduce->matmul->
    normalize chains interleave and hide each other's latency."""
    fold = cols // channels
    n = rows * fold  # spatial positions per channel

    # One-hot fold selector: M[l, c] = 1 where lane l holds channel c
    # (lanes are spatial-major, channel-minor groups of size C). Compile-
    # time constant; Mosaic folds the iota/compare chain.
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (cols, channels), 0)
    ch = jax.lax.broadcasted_iota(jnp.int32, (cols, channels), 1)
    sel = (lane_c % channels == ch).astype(jnp.float32)  # (cols, C)
    lane_r = jax.lax.broadcasted_iota(jnp.int32, (channels, cols), 1)
    ch_r = jax.lax.broadcasted_iota(jnp.int32, (channels, cols), 0)
    sel_t = (lane_r % channels == ch_r).astype(jnp.float32)  # (C, cols)

    for s in range(samples):
        xf = x_ref[s].astype(jnp.float32)  # (rows, cols)
        # Per-channel sums: reduce sublanes with a plain sum, then fold
        # the spatial groups out of the lane axis with the selector
        # matmul (Mosaic does not support lane->sublane reshapes). All
        # intermediates stay 2-D (TPU vregs are 2-D tiles).
        s1 = jnp.sum(xf, axis=0, keepdims=True)  # (1, cols)
        s2 = jnp.sum(xf * xf, axis=0, keepdims=True)
        mean_c = jnp.dot(s1, sel, preferred_element_type=jnp.float32) / n
        var_c = (
            jnp.dot(s2, sel, preferred_element_type=jnp.float32) / n
            - mean_c * mean_c
        )
        inv_c = jax.lax.rsqrt(var_c + eps)  # (1, C)

        # Broadcast back to the folded lane layout via the inverse
        # selector.
        mean = jnp.dot(mean_c, sel_t, preferred_element_type=jnp.float32)
        inv = jnp.dot(inv_c, sel_t, preferred_element_type=jnp.float32)
        y = (xf - mean) * inv
        if apply_silu:
            y = y * jax.nn.sigmoid(y)
        o_ref[s] = y.astype(o_ref.dtype)


@functools.lru_cache(maxsize=None)
def _build(shape, dtype_name, eps, apply_silu, interpret):
    """Compile-cached pallas_call for a given (B, H, W, C) problem."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = shape
    dtype = jnp.dtype(dtype_name)
    hw = H * W

    # Fold spatial positions into the lane axis until the minor dim is a
    # multiple of 128 (dense tiles for any channel count).
    fold = 1
    while (fold * C) % 128 and fold < hw:
        fold *= 2
    if (fold * C) % 128 or hw % fold:
        return None  # odd shape: let the XLA path handle it
    rows, cols = hw // fold, fold * C
    sample_bytes = rows * cols * dtype.itemsize
    if sample_bytes > _MAX_BLOCK_BYTES:
        return None
    # The in-kernel one-hot selectors are (cols, C) f32; decline when they
    # would rival the block itself (deep small-spatial/large-C layers are
    # a negligible share of the cascade's IN bytes anyway).
    if 2 * cols * C * 4 > _MAX_BLOCK_BYTES // 2:
        return None
    # Pack several samples per grid step (unrolled in-kernel) so the
    # serial reduce->matmul->normalize latency chain of one sample hides
    # behind its neighbours'.
    samples = 1
    while (samples * 2 * sample_bytes <= _MAX_BLOCK_BYTES
           and B % (samples * 2) == 0 and samples < 8):
        samples *= 2

    kernel = functools.partial(
        _kernel, samples=samples, rows=rows, cols=cols, channels=C,
        eps=eps, apply_silu=apply_silu,
    )
    call = pl.pallas_call(
        kernel,
        grid=(B // samples,),
        in_specs=[pl.BlockSpec(
            (samples, rows, cols), lambda b: (b, 0, 0),
            memory_space=pltpu.VMEM,
        )],
        out_specs=pl.BlockSpec(
            (samples, rows, cols), lambda b: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, rows, cols), dtype),
        interpret=interpret,
    )

    def apply(x):
        y = call(x.reshape(B, rows, cols))
        return y.reshape(B, H, W, C)

    return apply


def supports(x: jnp.ndarray) -> bool:
    """Whether the fused kernel handles this shape/dtype."""
    if x.ndim != 4:
        return False
    return _build(tuple(x.shape), x.dtype.name, 1e-5, False, False) is not None


def instance_norm_silu_fused(
    x: jnp.ndarray, eps: float = 1e-5, apply_silu: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused one-pass InstanceNorm (+ optional SiLU) over NHWC.

    Falls back to None-signal (caller uses the XLA path) via ``supports``;
    callers must check ``supports(x)`` first.
    """
    apply = _build(tuple(x.shape), x.dtype.name, eps, bool(apply_silu),
                   interpret)
    if apply is None:
        raise ValueError(f"unsupported shape for fused norm: {x.shape}")
    return apply(x)


# Top IN input shapes by total bytes in the 96-crop KeypointDetect trace
# (spy harness over models.layers.instance_norm; counts in parentheses):
SHAPES = [
    (96, 64, 64, 56),    # 4x BiFPN P3 lanes
    (96, 128, 128, 16),  # 2x stem / stage-1
    (96, 32, 32, 56),    # 8x BiFPN P4
    (96, 64, 64, 64),    # 1x final merge conv
    (96, 16, 16, 56),    # 11x BiFPN P5
    (96, 16, 16, 240),   # 2x deep MBConv (gated out: selector too big)
]


def bench(f, x, iters):
    y = f(x)
    y.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        y = f(x)
    y.block_until_ready()
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument(
        "--chain", type=int, default=20,
        help="apply the op CHAIN times inside one jit so per-launch tunnel "
        "overhead amortizes out; reported times are per application",
    )
    args = ap.parse_args()
    print(jax.devices())
    chain = args.chain

    def chained(op):
        def f(x):
            # +x*1e-6 between links prevents XLA folding repeated idempotent
            # normalizations into one.
            for _ in range(chain):
                x = op(x) + x * 1e-6
            return x
        return jax.jit(f)

    rng = np.random.default_rng(0)
    xla = chained(lambda x: silu(instance_norm(x)))
    fused = chained(
        lambda x: instance_norm_silu_fused(x, apply_silu=True)
    )
    one_xla = jax.jit(lambda x: silu(instance_norm(x)))
    one_fused = jax.jit(
        lambda x: instance_norm_silu_fused(x, apply_silu=True)
    )
    for shape in SHAPES:
        x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        if not supports(x):
            print(f"{shape}: fused UNSUPPORTED (falls back to XLA)")
            continue
        t_xla = bench(xla, x, args.iters) / chain
        t_f = bench(fused, x, args.iters) / chain
        gb = np.prod(shape) * 2 / 1e9
        y1 = np.asarray(one_xla(x), np.float32)
        y2 = np.asarray(one_fused(x), np.float32)
        err = np.abs(y1 - y2).max()
        print(
            f"{shape}: xla {t_xla:.3f} ms ({3 * gb / t_xla * 1e3:.0f} GB/s "
            f"@3xfootprint) fused {t_f:.3f} ms ({2 * gb / t_f * 1e3:.0f} "
            f"GB/s @2x)  speedup {t_xla / t_f:.2f}x  max|diff| {err:.5f}"
        )


if __name__ == "__main__":
    main()
