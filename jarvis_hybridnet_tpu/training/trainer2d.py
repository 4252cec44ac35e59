"""EfficientTrack (2D) trainer.

Equivalent of the reference EfficientTrack convenience class
(jarvis/efficienttrack/efficienttrack.py:32-401): mode-switched
CenterDetect/KeypointDetect training with AdamW/SGD, OneCycle or plateau
scheduling, per-epoch validation, px-accuracy (argmax-vs-GT distance with
the reference's ``(pred+0.5)*2`` decode, :383-396), TensorBoard logging and
periodic checkpoints (native .ckpt plus reference-compatible .pth).

The train step is a single jitted function: forward, dual-scale MSE
(jarvis/efficienttrack/loss.py:10-20, summed over scales), grad, update.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from tqdm import tqdm

from ..models.efficienttrack import EfficientTrackBackbone
from ..utils import clp
from ..utils.logger import AverageMeter, NetLogger
from . import checkpoints, optim


def heatmap_loss(outputs, targets):
    """Per-scale mean MSE, summed (reference sums the per-scale batch means,
    efficienttrack.py:266-271)."""
    total = 0.0
    for out, tgt in zip(outputs, targets):
        total = total + jnp.mean(jnp.square(out - tgt))
    return total


def accuracy_from_preds(preds: np.ndarray, gt: np.ndarray) -> float:
    """Mean px distance of stride-2 argmax decode to GT
    (efficienttrack.py:383-396). preds: (B, J, 2) argmax coords on the
    stride-2 heatmap (decoded on device — the train step ships back 2*J
    ints per sample, not heatmaps); gt: (B, J, 2) input-resolution px."""
    mask = gt.sum(axis=2)
    dist = np.linalg.norm((preds + 0.5) * 2 - gt, axis=2)
    masked = np.ma.masked_where(mask == 0, dist)
    if masked.mask.all():
        return -1.0
    return float(np.nanmean(masked))


def calculate_accuracy(heatmaps: np.ndarray, gt: np.ndarray) -> float:
    """Host-side variant of :func:`accuracy_from_preds` taking raw
    heatmaps (B, H, W, J)."""
    B, H, W, J = heatmaps.shape
    flat = heatmaps.transpose(0, 3, 1, 2).reshape(B, J, -1)
    m = flat.argmax(axis=2)
    preds = np.stack([m % W, m // W], axis=-1)
    return accuracy_from_preds(preds, gt)


class EfficientTrackTrainer:
    def __init__(self, mode: str, cfg, weights=None, run_name=None):
        assert mode in ("CenterDetect", "KeypointDetect")
        self.mode = mode
        self.main_cfg = cfg
        self.cfg = cfg[mode.upper()]
        train_dtype = str(cfg.get("TPU", {}).get("TRAIN_DTYPE", "float32"))
        self.model = EfficientTrackBackbone(
            model_size=self.cfg.MODEL_SIZE,
            output_channels=int(self.cfg.NUM_JOINTS),
            dtype=jnp.bfloat16 if train_dtype == "bfloat16" else jnp.float32,
        )
        if run_name is None:
            run_name = "Run_" + time.strftime("%Y%m%d-%H%M%S")
        self.model_savepath = os.path.join(cfg.savePaths[mode], run_name)
        os.makedirs(self.model_savepath, exist_ok=True)
        self.logger = NetLogger(os.path.join(cfg.logPaths[mode], run_name))
        self.lossMeter = AverageMeter()
        self.accuracyMeter = AverageMeter()

        size = int(self.cfg.IMAGE_SIZE if mode == "CenterDetect"
                   else cfg.KEYPOINTDETECT.BOUNDING_BOX_SIZE)
        self.input_size = size
        # jitted init: eager flax init dispatches op-by-op on the host
        self.params = jax.jit(self.model.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, size, size, 3), jnp.float32),
        )["params"]
        loaded = checkpoints.load_efficienttrack_params(
            cfg, mode, weights, init_params=self.params
        )
        self.found_weights = loaded is not None or weights is None
        if loaded is not None:
            self.params = loaded

    def _device_aug(self) -> bool:
        """True when the color pipeline runs inside the jitted train step
        (TPU.DEVICE_AUG, ops/augment.py) — the host then does only the
        keypoint-moving mirror/affine half (0.5 ms) and ships raw uint8
        plus a per-sample parameter record, instead of the 2.4 ms
        GIL-held numpy/cv2 color pass that dominates the post-preload 2D
        sample build (BASELINE.md "2D-stage training throughput")."""
        return (bool(self.main_cfg.get("TPU", {}).get("DEVICE_AUG", True))
                and bool(self.main_cfg.AUGMENTATION
                         .COLOR_MANIPULATION.ENABLED))

    # -- jitted steps -----------------------------------------------------
    def _build_steps(self, tx, mesh=None, device_aug=False):
        """Fresh jitted step closures per train() call — jitting methods
        with a static ``self`` would cache the first optimizer/trace across
        reconfigured runs.

        With ``mesh`` (multi-chip: parallel/mesh.auto_data_mesh) steps are
        jitted with 'data' shardings on the batch; params/optimizer state
        replicated, gradient all-reduce inserted by GSPMD over ICI.

        The host↔device contract is deliberately thin (critical on narrow
        links, and free bandwidth everywhere): images ship as raw uint8
        (cast + mean/std normalize fuse into the first conv's read),
        Gaussian targets are rendered on device from the (B, J, 2)
        keypoints (ops/heatmap.gaussian_heatmaps_on_device), and only the
        stride-2 argmax coords come back for the px-accuracy meter —
        ~100 KB/step instead of the ~21 MB/step a f32-image + f32-target
        + heatmap-readback layout costs at batch 8."""
        model = self.model
        from ..ops.heatmap import argmax_2d, gaussian_heatmaps_on_device

        size = self.input_size
        sig = 1.0 if self.mode == "CenterDetect" else 1.5
        mean = jnp.asarray(self.main_cfg.DATASET.MEAN, jnp.float32)
        std = jnp.asarray(self.main_cfg.DATASET.STD, jnp.float32)
        if device_aug:
            from ..ops.augment import make_border_zero, make_color_aug

            color_aug = make_color_aug(self.main_cfg.AUGMENTATION)
            border_zero = make_border_zero()

        def prepare(imgs, kps, aug=None):
            # imgs uint8 (B, S, S, 3); kps float32 (B, 1, J*3) [x, y, vis]
            x = imgs.astype(jnp.float32) / 255.0
            if aug is not None:
                # on-device color aug after the host's mirror/affine; the
                # mask restores the warp's black out-of-frame border that
                # contrast/gain would otherwise lift (ops/augment.py)
                x = border_zero(color_aug(x, aug), aug["minv"])
            x = (x - mean) / std
            kxy = kps.reshape(kps.shape[0], -1, 3)[..., :2]
            t4 = gaussian_heatmaps_on_device(kxy, size, size // 4,
                                             sig * (size // 4) / 64)
            t2 = gaussian_heatmaps_on_device(kxy, size, size // 2,
                                             sig * (size // 2) / 64)
            return x, t4, t2

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            data = NamedSharding(mesh, P("data"))
            train_in = (repl, repl, repl, repl, data, data)
            if device_aug:
                train_in = train_in + (data,)  # aug pytree: every leaf (B, ...)
            train_jit = lambda f: jax.jit(  # noqa: E731
                f,
                in_shardings=train_in,
                out_shardings=(repl, repl, repl, data),
            )
            eval_jit = lambda f: jax.jit(  # noqa: E731
                f,
                in_shardings=(repl, data, data),
                out_shardings=(repl, data),
            )
        else:
            train_jit = eval_jit = jax.jit

        def _train_step(params, opt_state, lr_scale, rng, imgs, kps,
                        aug=None):
            x, t4, t2 = prepare(imgs, kps, aug)

            def loss_fn(p):
                outputs = model.apply(
                    {"params": p}, x, deterministic=False,
                    rngs={"dropout": rng},
                )
                return heatmap_loss(outputs, (t4, t2)), outputs[1]

            (loss, hm2), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            updates = jax.tree.map(lambda u: u * lr_scale, updates)
            params = optax.apply_updates(params, updates)
            xy, _ = argmax_2d(hm2)
            return params, opt_state, loss, xy

        # fixed-arity jitted signatures (shardings are per-positional)
        if device_aug:
            train_step = train_jit(_train_step)
        else:
            train_step = train_jit(
                lambda params, opt_state, lr_scale, rng, imgs, kps:
                _train_step(params, opt_state, lr_scale, rng, imgs, kps))

        @eval_jit
        def eval_step(params, imgs, kps):
            x, t4, t2 = prepare(imgs, kps)
            outputs = model.apply({"params": params}, x)
            xy, _ = argmax_2d(outputs[1])
            return heatmap_loss(outputs, (t4, t2)), xy

        return train_step, eval_step

    # -- main loop --------------------------------------------------------
    def train(self, training_set, validation_set, num_epochs,
              start_epoch=0, streamlitWidgets=None,
              resume_from=None) -> dict:
        cfg = self.cfg
        workers = int(self.main_cfg.get("DATALOADER_NUM_WORKERS", 4))
        from ..parallel.mesh import auto_data_mesh
        from ..parallel.multihost import local_np, make_dp_loaders

        # thin host↔device contract: raw uint8 images + keypoints only,
        # targets rendered on device (see _build_steps); with
        # TPU.DEVICE_AUG the train split also skips the host color pass
        # and ships per-sample aug parameters instead (ops/augment.py)
        training_set.device_targets = True
        validation_set.device_targets = True
        device_aug = (self._device_aug()
                      and training_set.set_name == "train")
        training_set.device_aug = device_aug
        from ..dataset.loader import maybe_preload

        maybe_preload(self.main_cfg, training_set, validation_set)

        mesh = auto_data_mesh(int(cfg.BATCH_SIZE))
        train_loader, val_loader = make_dp_loaders(
            training_set, validation_set, int(cfg.BATCH_SIZE), workers,
            mesh, drop_last=True,
            worker_mode=str(self.main_cfg.get("DATALOADER_WORKER_MODE",
                                              "thread")))
        steps_per_epoch = len(train_loader)
        use_onecycle = bool(cfg.USE_ONECYLCLE)
        if use_onecycle:
            schedule = optim.onecycle_schedule(
                float(cfg.MAX_LEARNING_RATE), steps_per_epoch * num_epochs
            )
            self.tx = optim.make_optimizer(cfg.OPTIMIZER, schedule)
            plateau = None
        else:
            self.tx = optim.make_optimizer(
                cfg.OPTIMIZER, float(cfg.MAX_LEARNING_RATE)
            )
            plateau = optim.PlateauScheduler(float(cfg.MAX_LEARNING_RATE))
        train_step, eval_step = self._build_steps(
            self.tx, mesh, device_aug=device_aug)
        opt_state = self.tx.init(self.params)
        if resume_from is not None:
            # full-state resume (params + optimizer + epoch) — new
            # capability over the reference's weights-only checkpoints
            self.params, opt_state, start_epoch = \
                checkpoints.load_train_state(resume_from, opt_state)
            clp.info(f"Resumed training state from {resume_from} "
                     f"(epoch {start_epoch})")
            if start_epoch >= num_epochs:
                clp.warning(
                    f"Resumed state is already at epoch {start_epoch} of "
                    f"{num_epochs}: training was complete; nothing to do.")
                return {"train_loss": 0, "train_acc": 0, "val_loss": 0,
                        "val_acc": 0, "already_complete": True}

        rng = jax.random.PRNGKey(1)
        lr_scale = 1.0
        results = {"train_loss": 0, "train_acc": 0,
                   "val_loss": 0, "val_acc": 0}
        history = {k: [] for k in
                   ("train_loss", "train_acc", "val_loss", "val_acc")}
        results["history"] = history  # per-epoch curves (tests, GUI)

        from ..utils.st_monitor import StreamlitTrainingMonitor
        from ..utils.preemption import POD_POLL_STRIDE, PreemptionGuard

        monitor = StreamlitTrainingMonitor(streamlitWidgets, self.mode,
                                           acc_unit="px")
        monitor.start(num_epochs)

        step = 0
        guard = PreemptionGuard()

        # One-step-delayed metric readback: fetching step k's (loss,
        # argmax coords) blocks until the device finishes step k, so a
        # same-iteration fetch serializes device compute with the host's
        # metric work and the device-link round trip. Dispatching step
        # k+1 FIRST and then consuming step k's pending metrics overlaps
        # them — same meter totals (every step is consumed exactly once,
        # flushed before any epoch-end reader), the progress bar just
        # trails by one step.
        pending = None  # (loss, preds, gt)

        def consume(p):
            loss, preds, gt = p
            acc = accuracy_from_preds(local_np(preds), gt)
            self.lossMeter.update(float(loss))
            if acc != -1:
                self.accuracyMeter.update(acc)

        with guard:
            for epoch in range(start_epoch, num_epochs):
                # shuffle/augmentation streams follow the ABSOLUTE epoch,
                # so preemption resumes never replay early epochs' orders
                train_loader.set_epoch(epoch)
                bar = tqdm(train_loader, total=steps_per_epoch)
                for count, b in enumerate(bar):
                    imgs, keypoints = b[0], b[1]
                    rng, sub = jax.random.split(rng)
                    if device_aug:  # b[2]: per-sample aug record
                        self.params, opt_state, loss, preds = train_step(
                            self.params, opt_state, lr_scale, sub, imgs,
                            keypoints, b[2],
                        )
                    else:
                        self.params, opt_state, loss, preds = train_step(
                            self.params, opt_state, lr_scale, sub, imgs,
                            keypoints,
                        )
                    step += 1
                    if guard.should_stop_global(stride=POD_POLL_STRIDE):
                        if pending is not None:
                            consume(pending)
                            pending = None
                        self._save_preempted(opt_state, epoch)
                        results["preempted"] = True
                        return results
                    gt = local_np(keypoints).reshape(
                        -1, self.model.output_channels, 3)[:, :, :2]
                    if pending is not None:
                        consume(pending)
                    pending = (loss, preds, gt)
                    bar.set_description(
                        "Epoch: {}/{}. Loss: {:.5f}. Acc: {:1.3f}".format(
                            epoch + 1, num_epochs, self.lossMeter.read(),
                            self.accuracyMeter.read())
                    )
                    if streamlitWidgets is not None:
                        monitor.step(count, steps_per_epoch)
                if pending is not None:  # flush before epoch-end readers
                    consume(pending)
                    pending = None

                if plateau is not None:
                    new_lr = plateau.step(self.lossMeter.read())
                    lr_scale = new_lr / float(cfg.MAX_LEARNING_RATE)

                current_lr = (
                    float(optim.onecycle_schedule(
                        float(cfg.MAX_LEARNING_RATE),
                        steps_per_epoch * num_epochs)(step))
                    if use_onecycle else plateau.lr
                )
                self.logger.update_learning_rate(current_lr)
                self.logger.update_train_loss(self.lossMeter.read())
                self.logger.update_train_accuracy(self.accuracyMeter.read())
                results["train_loss"] = self.lossMeter.read()
                results["train_acc"] = self.accuracyMeter.read()
                history["train_loss"].append(results["train_loss"])
                history["train_acc"].append(results["train_acc"])
                self.lossMeter.reset()
                self.accuracyMeter.reset()

                if (epoch + 1) % int(cfg.CHECKPOINT_SAVE_INTERVAL) == 0 \
                        and epoch + 1 < num_epochs:
                    self.save_checkpoint(
                        f"EfficientTrack-{cfg.MODEL_SIZE}_Epoch_{epoch+1}")
                    checkpoints.save_train_state(
                        os.path.join(self.model_savepath, "train_state.ckpt"),
                        self.params, opt_state, epoch + 1)
                if epoch + 1 == num_epochs:
                    self.save_checkpoint(f"EfficientTrack-{cfg.MODEL_SIZE}_final")

                if (epoch + 1) % int(cfg.VAL_INTERVAL) == 0:
                    for imgs, keypoints in val_loader:
                        loss, preds = eval_step(self.params, imgs, keypoints)
                        gt = local_np(keypoints).reshape(
                            -1, self.model.output_channels, 3)[:, :, :2]
                        acc = accuracy_from_preds(local_np(preds), gt)
                        self.lossMeter.update(float(loss))
                        if acc != -1:
                            self.accuracyMeter.update(acc)
                    print("Val. Epoch: {}/{}. Loss: {:1.5f}. Acc: {:1.3f}".format(
                        epoch + 1, num_epochs, self.lossMeter.read(),
                        self.accuracyMeter.read()))
                    results["val_loss"] = self.lossMeter.read()
                    results["val_acc"] = self.accuracyMeter.read()
                    if np.isnan(results["val_acc"]):
                        results["val_acc"] = 0
                    history["val_loss"].append(results["val_loss"])
                    history["val_acc"].append(results["val_acc"])
                    self.logger.update_val_loss(self.lossMeter.read())
                    self.logger.update_val_accuracy(self.accuracyMeter.read())
                    self.lossMeter.reset()
                    self.accuracyMeter.reset()

                if streamlitWidgets is not None:
                    monitor.epoch(epoch, num_epochs, history)

                # A signal during epoch-end work (val loop, checkpoint IO)
                # must not start another epoch — unless this WAS the last
                # epoch, in which case training is complete, not preempted.
                if guard.should_stop_global() and epoch + 1 < num_epochs:
                    self._save_preempted(opt_state, epoch + 1)
                    results["preempted"] = True
                    return results

        return results

    def _save_preempted(self, opt_state, resume_epoch: int) -> None:
        """Preemption path (utils/preemption.py): write a full resumable
        train state and leave. ``resume_epoch`` is the epoch a resumed run
        starts at — the interrupted epoch restarts from its beginning; data
        order is epoch-deterministic via ``set_epoch``."""
        from ..utils.preemption import is_primary_host

        path = os.path.join(self.model_savepath, "train_state.ckpt")
        if is_primary_host():
            checkpoints.save_train_state(path, self.params, opt_state,
                                         resume_epoch)
            clp.warning(f"Training preempted; resumable state saved to "
                        f"{path} (resumes at epoch {resume_epoch + 1})")
        else:
            clp.warning("Training preempted; the primary host saves the "
                        "resumable state.")

    def save_checkpoint(self, name: str) -> None:
        checkpoints.save_checkpoint(
            self.params, os.path.join(self.model_savepath, name + ".ckpt")
        )
        try:
            checkpoints.save_torch_checkpoint(
                self.params, os.path.join(self.model_savepath, name + ".pth"),
                self.cfg.MODEL_SIZE,
            )
        except ImportError:
            clp.warning("torch unavailable; skipped .pth export")
