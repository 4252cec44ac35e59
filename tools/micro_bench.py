"""Micro-benchmarks on the live TPU for targeted perf experiments.

Current experiments:
  * v2v-pad: V2VNet at J=23 (channels 46/92, MXU-lane padded by hardware)
    vs zero-padded J=32 (64/128) — does explicit channel padding beat the
    hardware's implicit lane padding?
  * center-split: resize+normalize vs the full CenterDetect net on the
    96-frame batch — attributes the 11 ms center stage.

Usage: python tools/micro_bench.py [v2v-pad|center-split]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def _sync(x):
    return float(np.asarray(x).ravel()[0])


def _time(fn, a, b, iters=20):
    _sync(fn(a))
    _sync(fn(b))
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(a if i % 2 == 0 else b)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1000.0


def v2v_pad():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from jarvis_hybridnet_tpu.models.v2v import V2VNet

    B, g = 8, 36
    rng = np.random.default_rng(0)
    vol23 = rng.random((B, g, g, g, 23), np.float32).astype(jnp.bfloat16)
    vol23b = np.roll(np.asarray(vol23, np.float32), 1, axis=1).astype(
        jnp.bfloat16)

    for J in (23, 24, 32):
        model = V2VNet(J, dtype=jnp.bfloat16, fused_upsample_front=True)
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, g, g, g, J), jnp.bfloat16))["params"]

        pad = J - 23

        @jax.jit
        def run(x, params=params, pad=pad, model=model):
            if pad:
                x = jnp.pad(x, ((0, 0),) * 4 + ((0, pad),))
            out = model.apply({"params": params}, x)
            return jnp.sum(out[..., :23].astype(jnp.float32))

        a = jax.device_put(vol23)
        b = jax.device_put(vol23b)
        print(f"V2V channels J={J}: {_time(run, a, b):.2f} ms/batch")


def center_split():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from jarvis_hybridnet_tpu.models.efficienttrack import (
        EfficientTrackBackbone,
    )
    from jarvis_hybridnet_tpu.ops.image import (
        normalize_imagenet,
        resize_bilinear,
    )

    N, H, W, S = 96, 1024, 1280, 256
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (N, H, W, 3), dtype=np.uint8)
    imgs_b = np.roll(imgs, 1, axis=2)
    mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
    std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)

    model = EfficientTrackBackbone(model_size="small", output_channels=1,
                                   dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, S, S, 3), jnp.float32))["params"]

    @jax.jit
    def resize_only(x):
        r = resize_bilinear(x, S, S) / 255.0
        return jnp.sum(normalize_imagenet(r, mean, std)[:, ::32, ::32])

    @jax.jit
    def full(x):
        r = resize_bilinear(x, S, S) / 255.0
        inp = normalize_imagenet(r, mean, std).astype(jnp.bfloat16)
        _, hm = model.apply({"params": params}, inp)
        return jnp.sum(hm.astype(jnp.float32)[:, ::32, ::32])

    a = jax.device_put(imgs)
    b = jax.device_put(imgs_b)
    print(f"resize+normalize only: {_time(resize_only, a, b):.2f} ms")
    print(f"resize+CenterDetect:   {_time(full, a, b):.2f} ms")


def resize_variants():
    """W-downsample strategies for 1280->256 (stride 5) after the H blend:
    (a) strided slice (current), (b) one-hot selection matmul on the MXU,
    (c) reshape-to-(256,5) + contiguous index."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from jarvis_hybridnet_tpu.ops.image import _strided

    N, H, W, S = 96, 1024, 1280, 256
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (N, H, W, 3), dtype=np.uint8)
    imgs_b = np.roll(imgs, 1, axis=2)

    onehot = np.zeros((W, S), np.float32)
    onehot[np.arange(S) * 5 + 2, np.arange(S)] = 1.0
    onehot_bf = jnp.asarray(onehot, jnp.bfloat16)

    def h_blend(x):
        a = _strided(x, 1, 1, 4, S).astype(jnp.float32)
        b = _strided(x, 1, 2, 4, S).astype(jnp.float32)
        return 0.5 * (a + b)  # (N, S, W, 3) f32

    @jax.jit
    def v_slice(x):
        y = h_blend(x)
        y = _strided(y, 2, 2, 5, S)
        return jnp.sum(y[:, ::32, ::32])

    @jax.jit
    def v_matmul(x):
        y = h_blend(x).astype(jnp.bfloat16)
        y = jnp.einsum("nhwc,ws->nhsc", y, onehot_bf,
                       preferred_element_type=jnp.float32)
        return jnp.sum(y[:, ::32, ::32])

    @jax.jit
    def v_reshape(x):
        y = h_blend(x)
        y = y.reshape(N, S, S, 5, 3)[:, :, :, 2, :]
        return jnp.sum(y[:, ::32, ::32])

    # both axes on the MXU: uint8 cast fuses into the first matmul's
    # operand read; intermediates stay bf16
    hsel = np.zeros((H, S), np.float32)
    hsel[np.arange(S) * 4 + 1, np.arange(S)] = 0.5
    hsel[np.arange(S) * 4 + 2, np.arange(S)] += 0.5
    hsel_bf = jnp.asarray(hsel, jnp.bfloat16)

    @jax.jit
    def v_bothmm(x):
        y = jnp.einsum("nhwc,hs->nswc", x.astype(jnp.bfloat16), hsel_bf,
                       preferred_element_type=jnp.bfloat16)
        y = jnp.einsum("nhwc,ws->nhsc", y, onehot_bf,
                       preferred_element_type=jnp.float32)
        return jnp.sum(y[:, ::32, ::32])

    a = jax.device_put(imgs)
    b = jax.device_put(imgs_b)
    for name, fn in (("slice", v_slice), ("matmul", v_matmul),
                     ("reshape", v_reshape), ("both-matmul", v_bothmm)):
        print(f"W-downsample {name}: {_time(fn, a, b):.2f} ms")


def gather_dtype():
    """Voxel-gather row dtype: is the quarter-grid gather still byte-bound
    (uint8 rows would help) or descriptor-bound (they would not)?
    Mirrors gather_voxel_volume's layout at the production shapes."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    B, C, J, hs, g4 = 8, 12, 23, 130, 18
    N = g4 ** 3
    rng = np.random.default_rng(0)
    rows = rng.random((C, B * hs * hs, J), np.float32) * 255.0
    idx = rng.integers(0, B * hs * hs, (C, B * N)).astype(np.int32)
    idx_b = rng.integers(0, B * hs * hs, (C, B * N)).astype(np.int32)

    for dt in (jnp.float32, jnp.bfloat16, jnp.uint8):
        table = jax.device_put(
            np.clip(rows, 0, 255).astype(dt) if dt == jnp.uint8
            else rows.astype(dt))

        @jax.jit
        def run(ix, table=table):
            acc = None
            for c in range(C):
                ic = ix[c]
                if acc is not None:
                    ic = ic + (acc[0, 0] * 0.0).astype(jnp.int32)
                vals = jnp.take(table[c], ic, axis=0).astype(jnp.float32)
                acc = vals if acc is None else acc + vals
            return jnp.sum(acc[::997])

        a = jax.device_put(idx)
        b = jax.device_put(idx_b)
        print(f"gather rows {np.dtype(dt).name}: {_time(run, a, b):.2f} "
              f"ms ({C * B * N / 1e6:.2f}M rows)")


def repro_layout():
    """Does the NCJHW round-trip around the voxel gather cost real time?

    The 2D head emits NHWC (B*C, h, h, J); hybridnet.py transposes it to
    (B, C, J, h, h) and gather_voxel_volume transposes straight back to
    J-minor rows (repro.py:182). A channels-last gather needs ZERO
    transposes: pad NHWC, flatten to (B*C*hs^2, J) rows (layout-free
    reshape) and fold (b, c) into the row offset, idx + (b*C + c)*hs^2.
    Measures the full in-model repro subgraph (pad -> indices -> gather ->
    quarter->half value upsample -> /255 -> bf16) both ways at production
    shapes, plus indices-only to attribute."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from jarvis_hybridnet_tpu.models.repro import (
        _upsample2_aligned_axis,
        reproject_indices,
        reprojection_layer,
    )

    B, C, J, h, G, spacing = 8, 12, 23, 128, 72, 2
    hs = h + 2
    g4 = G // 4
    N = g4 ** 3
    rng = np.random.default_rng(0)
    hm = (rng.random((B * C, h, h, J), np.float32) * 255.0).astype(
        jnp.bfloat16)
    hm_b = np.roll(np.asarray(hm, np.float32), 1, axis=1).astype(jnp.bfloat16)

    # plausible rig: cameras at 600 mm looking at the origin; P = [R|t]K in
    # the reference's x@P row layout, so pu = fx*X + cx*(Z+600) and the
    # +-36 mm grid spreads +-120 px across the crop window
    fx = 2000.0
    P = np.zeros((C, 4, 3), np.float32)
    P[:, 0, 0] = fx
    P[:, 1, 1] = fx
    P[:, 2, 0] = 640.0
    P[:, 2, 1] = 512.0
    P[:, 2, 2] = 1.0
    P[:, 3, 0] = 640.0 * 600.0
    P[:, 3, 1] = 512.0 * 600.0
    P[:, 3, 2] = 600.0
    K = np.tile(np.eye(3, dtype=np.float32) * fx, (C, 1, 1))
    K[:, 2, 2] = 1.0
    K[:, 2, 0] = 640.0
    K[:, 2, 1] = 512.0
    D = np.zeros((C, 1, 5), np.float32)
    Pb = np.broadcast_to(P, (B, C, 4, 3))
    Kb = np.broadcast_to(K, (B, C, 3, 3))
    Db = np.broadcast_to(D, (B, C, 1, 5))
    center3d = np.tile(np.array([0, 0, 20], np.int32), (B, 1))
    center_hm = np.tile(np.array([640, 512], np.int32), (B, C, 1))

    @jax.jit
    def current(x):
        x = x.reshape(B, C, h, h, J).transpose(0, 1, 4, 2, 3)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 1), (1, 1)))
        vox = reprojection_layer(
            x.astype(jnp.float32), center3d, center_hm, Pb, Kb, Db,
            G, float(spacing), mode="quarter_fused",
            gather_dtype=jnp.bfloat16,
        )
        out = (vox / 255.0).astype(jnp.bfloat16)
        return jnp.sum(out[:, ::7, ::7, ::7].astype(jnp.float32))

    @jax.jit
    def nhwc(x):
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))  # (B*C, hs, hs, J)
        rows = x.reshape(B * C * hs * hs, J)
        idx = jax.vmap(
            lambda c3d, chm, p, k, d: reproject_indices(
                c3d, chm, p, k, d, G // 2, spacing * 2.0, hs, upsample=False,
            )
        )(center3d, center_hm, Pb, Kb, Db)  # (B, C, N)
        base = (jnp.arange(B, dtype=jnp.int32) * C)[:, None] * (hs * hs)
        acc = None
        for c in range(C):
            ic = (idx[:, c].reshape(B, N) + base + c * hs * hs).reshape(-1)
            if acc is not None and c % 12 == 0:
                ic = ic + (acc[0, 0] * 0.0).astype(jnp.int32)
            vals = jnp.take(rows, ic, axis=0).astype(jnp.float32)
            acc = vals if acc is None else acc + vals
        quarter = (acc / C).reshape(B, g4, g4, g4, J)
        half = _upsample2_aligned_axis(quarter, 1)
        half = _upsample2_aligned_axis(half, 2)
        half = _upsample2_aligned_axis(half, 3)
        out = (half / 255.0).astype(jnp.bfloat16)
        return jnp.sum(out[:, ::7, ::7, ::7].astype(jnp.float32))

    @jax.jit
    def indices_only(x):
        idx = jax.vmap(
            lambda c3d, chm, p, k, d: reproject_indices(
                c3d, chm, p, k, d, G // 2, spacing * 2.0, hs, upsample=False,
            )
        )(center3d, center_hm, Pb, Kb, Db)
        return jnp.sum(idx.astype(jnp.float32)) + jnp.sum(
            x[0, 0, 0, :3].astype(jnp.float32))

    a = jax.device_put(hm)
    b = jax.device_put(hm_b)
    va, vb = float(_sync(current(a))), float(_sync(nhwc(a)))
    print(f"value check: current={va:.1f} nhwc={vb:.1f} "
          f"(identical gather -> must match)")
    print(f"repro subgraph, NCJHW round-trip (current): "
          f"{_time(current, a, b):.2f} ms")
    print(f"repro subgraph, channels-last (no transpose): "
          f"{_time(nhwc, a, b):.2f} ms")
    print(f"indices only: {_time(indices_only, a, b):.2f} ms")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "v2v-pad"
    {"v2v-pad": v2v_pad, "center-split": center_split,
     "resize-variants": resize_variants, "gather-dtype": gather_dtype,
     "repro-layout": repro_layout,
     }[which]()
