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


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "v2v-pad"
    {"v2v-pad": v2v_pad, "center-split": center_split,
     "resize-variants": resize_variants, "gather-dtype": gather_dtype,
     }[which]()
