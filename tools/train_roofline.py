"""MFU / roofline accounting for the HybridNet train step.

Counterpart of tools/roofline.py for training: compiles three cumulative
graphs — forward (loss only), forward+backward (value_and_grad), and the
full optimizer step — reads XLA ``cost_analysis()`` FLOPs / bytes from
each, differences them, and combines with measured step times to report
achieved TFLOP/s and GB/s against chip peaks. Gives the training-side
utilization statement to match the inference table in BASELINE.md.

Usage: PYTHONPATH=. python tools/train_roofline.py [--batch N] [--iters N]
Peaks default to TPU v5e (197 bf16 TFLOP/s, 819 GB/s HBM); training runs
float32 by default, for which the MXU peak is ~49 TFLOP/s — pass
--peak-tflops 49 to rate against the f32 systolic peak instead.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--peak-tflops", type=float, default=197.0)
    ap.add_argument("--peak-gbs", type=float, default=819.0)
    ap.add_argument("--dtype", default=None,
                    choices=["float32", "bfloat16"],
                    help="override TPU.TRAIN_DTYPE (the trainers' mixed-"
                         "precision knob: bf16 compute, f32 params)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    # initialize the backend before torch/optax imports: plugin discovery
    # is fragile once unrelated native libraries are loaded
    print("devices:", jax.devices(), file=sys.stderr)

    import optax

    from jarvis_hybridnet_tpu.config import ProjectManager
    from jarvis_hybridnet_tpu.dataset.dataset3d import Dataset3D
    from jarvis_hybridnet_tpu.models.hybridnet import (
        HybridNetBackbone,
        hybridnet_mse_loss,
    )
    from jarvis_hybridnet_tpu.prediction.loaders import init_hybridnet_params
    from jarvis_hybridnet_tpu.training import checkpoints

    pm = ProjectManager(parent_dir="/root/reference")
    assert pm.load("Example_Project")
    cfg = pm.get_cfg()
    B = args.batch

    ds = Dataset3D(cfg, set="val")
    sample = ds[0]

    def rep(x):
        return np.broadcast_to(np.asarray(x)[None],
                               (B,) + np.asarray(x).shape).copy()

    batch = {
        "imgs": rep(sample["imgs"]).astype(np.float32),
        "center_hm": rep(sample["center_hm"]),
        "center3d": rep(sample["center3d"]),
        "heatmap3d": rep(sample["heatmap3d"]).astype(np.float32),
        "camera_matrices": rep(sample["camera_matrices"]),
        "intrinsics": rep(sample["intrinsics"]),
        "distortions": rep(sample["distortions"]),
    }

    import jax.numpy as jnp

    if args.dtype:
        cfg.TPU.TRAIN_DTYPE = args.dtype
    train_dtype = str(cfg.TPU.get("TRAIN_DTYPE", "float32"))
    model = HybridNetBackbone(
        num_joints=int(cfg.KEYPOINTDETECT.NUM_JOINTS),
        model_size=cfg.KEYPOINTDETECT.MODEL_SIZE,
        roi_cube_size=int(cfg.HYBRIDNET.ROI_CUBE_SIZE),
        grid_spacing=int(cfg.HYBRIDNET.GRID_SPACING),
        repro_mode=str(cfg.TPU.REPRO_MODE),
        dtype=(jnp.bfloat16 if train_dtype == "bfloat16"
               else jnp.float32),
    )
    params = init_hybridnet_params(cfg, seed=3)
    params["effTrack"] = checkpoints.load_efficienttrack_params(
        cfg, "KeypointDetect",
        "/root/reference/pretrained/MonkeyHand/"
        "EfficientTrack_Keypoints-small.pth",
        init_params=params["effTrack"])
    tx = optax.adamw(1e-4)
    opt_state = tx.init(params)
    rng = jax.random.PRNGKey(0)

    def loss_fn(p, batch, rng):
        hm, _, _, _ = model.apply(
            {"params": p}, batch["imgs"], batch["center_hm"],
            batch["center3d"], batch["camera_matrices"],
            batch["intrinsics"], batch["distortions"],
            deterministic=False, rngs={"dropout": rng})
        gt = batch["heatmap3d"].transpose(0, 2, 3, 4, 1)
        return hybridnet_mse_loss(hm, gt)

    def fwd(params, opt_state, rng, batch):
        return loss_fn(params, batch, rng)

    def fwd_bwd(params, opt_state, rng, batch):
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(p, batch, rng))(params)
        # reduce grads to a scalar so XLA cannot DCE the backward pass
        # while keeping output transfer negligible
        gsum = jax.tree_util.tree_reduce(
            lambda a, x: a + x.astype(np.float32).sum(), grads, 0.0)
        return loss + gsum

    def full_step(params, opt_state, rng, batch):
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(p, batch, rng))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    dev_batch = jax.device_put(batch)
    alt = dict(batch)
    alt["imgs"] = np.roll(batch["imgs"], 1, axis=3).copy()
    dev_alt = jax.device_put(alt)

    names = ["forward", "fwd+bwd", "full step"]
    fns = [fwd, fwd_bwd, full_step]
    cum = []
    for name, f in zip(names, fns):
        jf = jax.jit(f)
        compiled = jf.lower(params, opt_state, rng, dev_batch).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        fl = float(ca.get("flops", 0.0))
        by = float(ca.get("bytes accessed", 0.0))

        # warm + time; full step updates state, others return scalars
        if name == "full step":
            p2, o2, loss = jf(params, opt_state, rng, dev_batch)
            _ = float(loss)
            t0 = time.perf_counter()
            p2, o2 = params, opt_state
            for i in range(args.iters):
                p2, o2, loss = jf(p2, o2, rng,
                                  dev_batch if i % 2 == 0 else dev_alt)
            _ = float(loss)
        else:
            _ = float(jf(params, opt_state, rng, dev_batch))
            t0 = time.perf_counter()
            for i in range(args.iters):
                out = jf(params, opt_state, rng,
                         dev_batch if i % 2 == 0 else dev_alt)
            _ = float(out)
        ms = (time.perf_counter() - t0) / args.iters * 1000.0
        cum.append((name, ms, fl, by))

    print(f"# Train-step roofline, B={B}, dtype="
          f"{cfg.TPU.get('TRAIN_DTYPE', 'float32')}, mode="
          f"{cfg.TPU.REPRO_MODE} (peaks: {args.peak_tflops} TFLOP/s, "
          f"{args.peak_gbs} GB/s)")
    print(f"{'graph':10s} {'ms':>8s} {'GFLOP':>9s} {'GB':>8s} "
          f"{'TFLOP/s':>8s} {'GB/s':>7s} {'%MXU':>6s} {'%HBM':>6s}")
    rows = []
    for name, ms, fl, by in cum:
        tflops = fl / (ms / 1e3) / 1e12
        gbs = by / (ms / 1e3) / 1e9
        rows.append({"graph": name, "ms": round(ms, 2),
                     "gflop": round(fl / 1e9, 2), "gb": round(by / 1e9, 3),
                     "tflops": round(tflops, 2), "gbs": round(gbs, 1),
                     "pct_mxu": round(100 * tflops / args.peak_tflops, 1),
                     "pct_hbm": round(100 * gbs / args.peak_gbs, 1)})
        print(f"{name:10s} {ms:8.2f} {fl/1e9:9.2f} {by/1e9:8.3f} "
              f"{tflops:8.2f} {gbs:7.1f} "
              f"{100*tflops/args.peak_tflops:6.1f} "
              f"{100*gbs/args.peak_gbs:6.1f}")
    # deltas: backward = fwd+bwd - forward; optimizer = full - fwd+bwd
    f_ms, f_fl, f_by = cum[0][1], cum[0][2], cum[0][3]
    fb_ms, fb_fl, fb_by = cum[1][1], cum[1][2], cum[1][3]
    fu_ms, fu_fl, fu_by = cum[2][1], cum[2][2], cum[2][3]
    print(f"{'(backward)':10s} {fb_ms-f_ms:8.2f} {(fb_fl-f_fl)/1e9:9.2f} "
          f"{(fb_by-f_by)/1e9:8.3f}")
    print(f"{'(optim)':10s} {fu_ms-fb_ms:8.2f} {(fu_fl-fb_fl)/1e9:9.2f} "
          f"{(fu_by-fb_by)/1e9:8.3f}")
    print(json.dumps({"rows": rows}), file=sys.stderr)


if __name__ == "__main__":
    main()
