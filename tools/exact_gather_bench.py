"""Exact-mode gather experiments on the live chip (VERDICT r3 task #7).

'exact' repro mode (bit-careful reference parity) runs ~10x slower than
quarter_fused because it gathers all G^3 voxels per camera. This script
isolates the exact-scale gather and measures the candidate levers:

  1. row dtype (f32 baseline vs bf16) — halves scattered-read bytes but
     costs 1-ulp value rounding (no longer bit-exact);
  2. camera-group concurrency (the in-flight-output cap in
     models/repro.gather_voxel_volume);
  3. sublane-batched index shape ((N/8, 8) vs flat (N,)).

Each variant is measured standalone at production exact shapes
(T=8, C=12, G=72, J=23, hs=130).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def bench(fn, a, b, iters=8):
    _ = float(np.asarray(fn(a)).ravel()[0])
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(a if i % 2 == 0 else b)
    _ = float(np.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    T, C, J, G, hs = 8, 12, 23, 72, 130
    N = G * G * G
    rng = np.random.default_rng(0)
    hm = rng.random((T, C, J, hs, hs), np.float32) * 255.0
    idx_a = rng.integers(0, hs * hs, (T, C, N), dtype=np.int32)
    idx_b = rng.integers(0, hs * hs, (T, C, N), dtype=np.int32)
    hm_d = jax.device_put(hm)
    ia = jax.device_put(idx_a)
    ib = jax.device_put(idx_b)

    def make_gather(dtype, group, sublane=False):
        def run(idx):
            h = hm_d.astype(dtype) if dtype != jnp.float32 else hm_d
            hs2 = hs * hs
            hm_rows = h.reshape(T, C, J, hs2).transpose(1, 0, 3, 2)
            hm_rows = hm_rows.reshape(C, T * hs2, J)
            batch_off = (jnp.arange(T, dtype=jnp.int32) * hs2)[:, None]
            ix = idx.reshape(T, C, N) + batch_off[:, None]
            ix = ix.transpose(1, 0, 2).reshape(C, T * N)
            if sublane:
                ix = ix.reshape(C, T * N // 8, 8)
            acc = None
            for c in range(C):
                ic = ix[c]
                if acc is not None and group and c % group == 0:
                    bump = (acc.ravel()[0] * 0.0).astype(jnp.int32)
                    ic = ic + bump
                vals = jnp.take(hm_rows[c], ic, axis=0)
                vals = vals.astype(jnp.float32)
                acc = vals if acc is None else acc + vals
            return (acc / C).sum()  # tiny output for the tunnel

        return jax.jit(run)

    print(f"exact-scale gather: T={T} C={C} J={J} G={G} "
          f"({T*C*N/1e6:.1f}M rows)", flush=True)
    for name, dtype, group, sub in (
        ("f32 group=2 (production exact)", jnp.float32, 2, False),
        ("f32 group=4", jnp.float32, 4, False),
        ("f32 group=12 (unbounded)", jnp.float32, 0, False),
        ("bf16 group=2", jnp.bfloat16, 2, False),
        ("bf16 group=4", jnp.bfloat16, 4, False),
        ("bf16 group=12 (unbounded)", jnp.bfloat16, 0, False),
        ("f32 group=2 sublane8", jnp.float32, 2, True),
    ):
        try:
            ms = bench(make_gather(dtype, group, sub), ia, ib)
            print(f"{name:32s} {ms:8.2f} ms/batch "
                  f"({T*C*N/ms*1e-3/1e6:.1f}M rows/s)", flush=True)
        except Exception as e:  # OOM etc. — record and continue
            print(f"{name:32s} FAILED: {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
