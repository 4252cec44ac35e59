"""KeypointDetect byte-lever sweep (VERDICT r3 #8).

BASELINE.md's inference roofline charges the KeypointDetect stage
8.1 GB of logical bytes for 96 crops; at the measured 6.9 ms the stage
physically moves ~5.6 GB — a ~4x re-read factor over the live
activations, consistent with each SeparableConvBlock's
depthwise->pointwise->InstanceNorm chain making ~4 HBM passes over its
P3-sized feature map. This sweep measures the levers that could cut
those passes without a hand-written kernel (the one-pass Pallas
fused-IN kernel was already measured 2-4x SLOWER than XLA —
tools/fused_norm_bench.py):

  base-bf16   the shipped config (bf16 activations, 56 FPN channels)
  f32         dtype scaling check: if the stage is byte-bound, f32 runs
              ~2x the bf16 time
  pad64       FPN/backbone widths padded 56->64 (8-sublane multiples):
              does lane/sublane padding of the odd 56-channel tensors
              cost real bandwidth? (weights random — timing only; a
              shipped pad would zero-extend real weights losslessly)
  crops48/192 batch scaling: descriptor/launch overheads vs pure
              streaming (bytes scale linearly if HBM-bound)

Usage: PYTHONPATH=. python tools/bifpn_sweep.py [--iters N]
Prints a table on stderr and one JSON line on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _time_forward(model, params, x, iters):
    import jax

    jf = jax.jit(lambda p, a: model.apply({"params": p}, a)[1])
    xa = jax.device_put(x)
    xb = jax.device_put(np.roll(x, 1, axis=2).copy())
    out = jf(params, xa)
    _ = float(out[0, 0, 0, 0])
    t0 = time.perf_counter()
    for i in range(iters):
        out = jf(params, xa if i % 2 == 0 else xb)
    _ = float(out[0, 0, 0, 0])
    ms = (time.perf_counter() - t0) / iters * 1000.0
    ca = jf.lower(params, xa).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return ms, float(ca.get("bytes accessed", 0.0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    print("devices:", jax.devices(), file=sys.stderr)

    import jax.numpy as jnp

    from jarvis_hybridnet_tpu.models import efficienttrack as et

    rng = np.random.default_rng(0)
    crops = (rng.random((96, 256, 256, 3), np.float32) - 0.5).astype(
        np.float32)

    rows = []

    def run(label, model_size, dtype, n_crops=96, spec_override=None):
        if spec_override is not None:
            # temporary size-table entry for the padded variant
            et.MODEL_SIZES["_sweep"] = spec_override
            model_size = "_sweep"
        model = et.EfficientTrackBackbone(
            model_size=model_size, output_channels=23, dtype=dtype)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))["params"]
        x = crops[:n_crops] if n_crops <= 96 else np.concatenate(
            [crops] * (n_crops // 96), axis=0)
        if dtype == jnp.bfloat16:
            x = x.astype(np.float32)  # input cast happens in-graph
        ms, by = _time_forward(model, params, x, args.iters)
        per_crop = ms / n_crops
        rows.append({"variant": label, "crops": n_crops,
                     "ms": round(ms, 2), "us_per_crop": round(
                         per_crop * 1000, 1),
                     "logical_gb": round(by / 1e9, 2),
                     "phys_gbs_if_hbm": round(by / 1e9 / (ms / 1e3), 0)})
        print(f"{label:12s} crops={n_crops:4d}: {ms:7.2f} ms "
              f"({per_crop*1000:6.1f} us/crop, {by/1e9:5.2f} GB logical)",
              file=sys.stderr)
        et.MODEL_SIZES.pop("_sweep", None)

    from jarvis_hybridnet_tpu.models.efficienttrack import ModelSizeSpec

    run("base-bf16", "small", jnp.bfloat16)
    run("f32", "small", jnp.float32)
    run("pad64", None, jnp.bfloat16,
        spec_override=ModelSizeSpec(0, 64, 3, 64))
    run("crops48", "small", jnp.bfloat16, n_crops=48)
    run("crops192", "small", jnp.bfloat16, n_crops=192)

    print(json.dumps({"rows": rows}))


if __name__ == "__main__":
    main()
