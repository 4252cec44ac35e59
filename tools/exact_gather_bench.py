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

    def make_patch_gather():
        """Prototype of the 'exact via patch gather' candidate.

        One descriptor per HALF-grid anchor (36^3 per (t,c), 8x fewer than
        exact's per-fine-voxel gather) fetches a contiguous 8x8xJ tile of
        the heatmap (stride-4 overlapping tiling, built densely on-chip);
        each fine voxel then selects its exact f32 value from its anchor's
        tile with a one-hot batched matmul (bit-exact: coefficients are
        0/1). Perf-shaped only: tile ids / in-tile offsets are random with
        the right shapes and ranges.
        """
        A = (G // 2) ** 3  # anchors per (t, c)
        n_t = (hs + 3) // 4  # stride-4 tile grid
        rng2 = np.random.default_rng(1)
        tile_id = jax.device_put(rng2.integers(
            0, n_t * n_t, (T, C, A), np.int32))
        # in-tile offset of each fine voxel, (T, C, A, 8) in [0, 64)
        off = jax.device_put(rng2.integers(
            0, 64, (T, C, A, 8), np.int32))

        def run(hm_in):
            # build overlapping tiles: pad so tile (tv,tu) = rows
            # [4tv..4tv+8) of the padded map, then 64 stride-4 slices
            x = jnp.pad(hm_in.transpose(0, 1, 3, 4, 2),
                        ((0, 0), (0, 0), (2, 8), (2, 8), (0, 0)))
            cols = []
            for dv in range(8):
                for du in range(8):
                    cols.append(jax.lax.slice(
                        x, (0, 0, dv, du, 0),
                        (T, C, dv + 4 * n_t, du + 4 * n_t, J),
                        (1, 1, 4, 4, 1)))
            tiles = jnp.stack(cols, axis=4)  # (T, C, n_t, n_t, 64, J)
            tiles = tiles.reshape(T, C, n_t * n_t, 64 * J)
            tiles = tiles.transpose(1, 0, 2, 3).reshape(C, T * n_t * n_t,
                                                        64 * J)
            t_off = (jnp.arange(T, dtype=jnp.int32)
                     * (n_t * n_t))[:, None, None]
            tid = (tile_id + t_off).transpose(1, 0, 2).reshape(C, T * A)
            acc = None
            for c in range(C):
                tc = tid[c]
                if acc is not None and c % 2 == 0:
                    tc = tc + (acc.ravel()[0] * 0.0).astype(jnp.int32)
                patch = jnp.take(tiles[c], tc, axis=0)  # (T*A, 64*J)
                patch = patch.reshape(T * A, 64, J)
                oh = jax.nn.one_hot(
                    off.transpose(1, 0, 2, 3).reshape(C, T * A, 8)[c],
                    64, dtype=jnp.float32)  # (T*A, 8, 64)
                vals = jnp.einsum("nfp,npj->nfj", oh, patch)  # (T*A, 8, J)
                acc = vals if acc is None else acc + vals
            return (acc / C).sum()

        return jax.jit(run)

    variants = (
        ("f32 group=2 (production exact)", jnp.float32, 2, False),
        ("f32 group=4", jnp.float32, 4, False),
        ("f32 group=12 (unbounded)", jnp.float32, 0, False),
        ("bf16 group=4", jnp.bfloat16, 4, False),
        ("f32 group=2 sublane8", jnp.float32, 2, True),
        ("patch-gather prototype (exact)", None, 0, False),
    )
    sel = [int(a) for a in sys.argv[1:]] or range(len(variants))
    print(f"exact-scale gather: T={T} C={C} J={J} G={G} "
          f"({T*C*N/1e6:.1f}M rows)", flush=True)
    hm_b = jax.device_put(hm + 1.0)
    for i in sel:
        name, dtype, group, sub = variants[i]
        try:
            if dtype is None:  # patch prototype alternates heatmap inputs
                ms = bench(make_patch_gather(), hm_d, hm_b, iters=4)
            else:
                ms = bench(make_gather(dtype, group, sub), ia, ib, iters=4)
            print(f"[{i}] {name:32s} {ms:8.2f} ms/batch "
                  f"({T*C*N/ms*1e-3/1e3:.0f}M rows/s)", flush=True)
        except Exception as e:  # OOM etc. — record and continue
            print(f"[{i}] {name:32s} FAILED: {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
