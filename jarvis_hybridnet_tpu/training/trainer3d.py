"""HybridNet (3D) trainer.

Equivalent of the reference HybridNet convenience class
(jarvis/hybridnet/hybridnet.py:31-388): masked voxel-MSE training with
AdamW/SGD, OneCycle or plateau schedules, mm-accuracy (mean 3D distance to
GT keypoints over labeled joints, :224-233), partial-freeze training modes
('all'/'bifpn'/'last_layers'/'3D_only') implemented as optax.multi_transform
label trees, checkpoints in both native .ckpt and reference .pth formats.
"""

from __future__ import annotations

import os
import time

import jax
import numpy as np
import optax
from tqdm import tqdm

from ..models.hybridnet import HybridNetBackbone, hybridnet_mse_loss
from ..utils import clp
from ..utils.logger import AverageMeter, NetLogger
from . import checkpoints, optim


def calculate_accuracy_mm(points3d: np.ndarray, gt: np.ndarray) -> float:
    """Mean euclidean mm distance over labeled joints
    (hybridnet.py:224-233)."""
    labeled = np.any(gt != 0, axis=-1)
    if not labeled.any():
        return -1.0
    dist = np.linalg.norm(gt - points3d, axis=-1)
    return float(dist[labeled].mean())


class HybridNetTrainer:
    def __init__(self, mode: str, cfg, weights=None,
                 efficienttrack_weights=None, run_name=None,
                 training_mode: str = "all"):
        self.cfg = cfg
        self.training_mode = training_mode
        import jax.numpy as jnp

        train_dtype = str(cfg.get("TPU", {}).get("TRAIN_DTYPE", "float32"))
        self.model = HybridNetBackbone(
            num_joints=int(cfg.KEYPOINTDETECT.NUM_JOINTS),
            model_size=cfg.KEYPOINTDETECT.MODEL_SIZE,
            roi_cube_size=int(cfg.HYBRIDNET.ROI_CUBE_SIZE),
            grid_spacing=int(cfg.HYBRIDNET.GRID_SPACING),
            repro_mode=str(cfg.get("TPU", {}).get("REPRO_MODE", "exact")),
            dtype=jnp.bfloat16 if train_dtype == "bfloat16" else jnp.float32,
        )
        if run_name is None:
            run_name = "Run_" + time.strftime("%Y%m%d-%H%M%S")
        self.model_savepath = os.path.join(cfg.savePaths["HybridNet"],
                                           run_name)
        os.makedirs(self.model_savepath, exist_ok=True)
        self.logger = NetLogger(
            os.path.join(cfg.logPaths["HybridNet"], run_name))
        self.lossMeter = AverageMeter()
        self.accuracyMeter = AverageMeter()

        from ..prediction.loaders import init_hybridnet_params

        self.params = init_hybridnet_params(cfg)
        loaded = checkpoints.load_hybridnet_params(
            cfg, weights, init_params=self.params,
            efficienttrack_weights=efficienttrack_weights,
        )
        # None only when an explicitly requested checkpoint failed to load
        self.found_weights = loaded is not None
        if loaded is not None:
            self.params = loaded

    def set_training_mode(self, mode: str) -> None:
        """'all' | 'bifpn' | 'last_layers' | '3D_only'
        (reference: hybridnet.py:367-388)."""
        self.training_mode = mode

    def _device_aug(self) -> bool:
        """True when color augmentation runs inside the jitted step
        (TPU.DEVICE_AUG, ops/augment.py) — the host then ships raw uint8
        crops plus a per-camera parameter record instead of spending
        34.2 ms/sample (33% of the build, BASELINE.md host split) in the
        GIL-held numpy/cv2 color pass."""
        return (bool(self.cfg.get("TPU", {}).get("DEVICE_AUG", True))
                and bool(self.cfg.AUGMENTATION.COLOR_MANIPULATION.ENABLED))

    def _build_steps(self, tx, mesh=None, device_aug=False):
        """Fresh jitted step closures per train() call (a static-self
        method jit would cache the first optimizer/freeze-label trace
        across set_training_mode + retrain).

        With ``mesh`` (multi-chip: parallel/mesh.auto_data_mesh) the steps
        are jitted with 'data' shardings on every batch leaf — params and
        optimizer state replicated, gradient all-reduce inserted by GSPMD
        over ICI.

        Host↔device contract (thin, like trainer2d): crops ship as raw
        uint8, the (J, g2^3) Gaussian GT volume is rendered on device from
        the (J, 3) voxel keypoints, and only points3d comes back — per
        B=1 step that is ~2.4 MB instead of ~14 MB."""
        model = self.model
        import jax.numpy as jnp

        from ..ops.heatmap import gaussian_heatmaps_3d_on_device

        g2 = int(float(self.cfg.HYBRIDNET.ROI_CUBE_SIZE)
                 / float(self.cfg.HYBRIDNET.GRID_SPACING) / 2.0)
        mean = jnp.asarray(self.cfg.DATASET.MEAN, jnp.float32)
        std = jnp.asarray(self.cfg.DATASET.STD, jnp.float32)
        if device_aug:
            from ..ops.augment import make_color_aug

            color_aug = make_color_aug(self.cfg.AUGMENTATION)

        def prepare(batch, train=False):
            x = batch["imgs"].astype(jnp.float32) / 255.0
            if train and device_aug:
                # on-device color augmentation (ops/augment.py): pixels
                # arrive raw uint8, the host shipped only per-camera
                # parameters in batch['aug']
                x = color_aug(x, batch["aug"])
            x = (x - mean) / std
            gt = gaussian_heatmaps_3d_on_device(
                batch["kp_vox"], batch["keypoints3D"], g2)
            return x, gt
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            data = NamedSharding(mesh, P("data"))
            # camera-carrying leaves shard their C axis over 'cameras'
            # (size-1 axis on data-only meshes — a no-op there); the
            # reprojection layer's camera-mean then reduces over ICI
            fs = NamedSharding(mesh, P("data", "cameras"))
            batch_sh = {
                "imgs": fs, "center_hm": fs, "center3d": data,
                "kp_vox": data, "keypoints3D": data,
                "camera_matrices": fs, "intrinsics": fs, "distortions": fs,
            }
            # aug parameters lead with (B, C): shard like the images so
            # the noise/blur math stays local to each camera shard
            train_sh = dict(batch_sh)
            if device_aug:
                from ..ops.augment import PARAM_KEYS

                train_sh["aug"] = {k: fs for k in PARAM_KEYS}
            train_jit = lambda f: jax.jit(  # noqa: E731
                f,
                in_shardings=(repl, repl, repl, repl, train_sh),
                out_shardings=(repl, repl, repl, data),
            )
            eval_jit = lambda f: jax.jit(  # noqa: E731
                f, in_shardings=(repl, batch_sh), out_shardings=(repl, data)
            )
        else:
            train_jit = eval_jit = jax.jit

        @train_jit
        def train_step(params, opt_state, lr_scale, rng, batch):
            x, gt = prepare(batch, train=True)

            def loss_fn(p):
                hm_final, _, points3d, _ = model.apply(
                    {"params": p},
                    x, batch["center_hm"], batch["center3d"],
                    batch["camera_matrices"], batch["intrinsics"],
                    batch["distortions"],
                    deterministic=False, rngs={"dropout": rng},
                )
                return hybridnet_mse_loss(hm_final, gt), points3d

            (loss, pts), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            updates = jax.tree.map(lambda u: u * lr_scale, updates)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, pts

        @eval_jit
        def eval_step(params, batch):
            x, gt = prepare(batch)
            hm_final, _, points3d, _ = model.apply(
                {"params": params},
                x, batch["center_hm"], batch["center3d"],
                batch["camera_matrices"], batch["intrinsics"],
                batch["distortions"],
            )
            return hybridnet_mse_loss(hm_final, gt), points3d

        return train_step, eval_step

    def train(self, training_set, validation_set, num_epochs,
              start_epoch=0, streamlitWidgets=None,
              resume_from=None) -> dict:
        cfg = self.cfg.HYBRIDNET
        workers = int(self.cfg.get("DATALOADER_NUM_WORKERS", 4))
        from ..parallel.mesh import auto_train_mesh
        from ..parallel.multihost import local_np, make_dp_loaders

        # thin host↔device contract: raw uint8 crops + voxel keypoints,
        # GT volumes rendered on device (see _build_steps); with
        # TPU.DEVICE_AUG the train split also skips the host color pass
        # and ships per-camera aug parameters instead (ops/augment.py)
        training_set.device_targets = True
        validation_set.device_targets = True
        # effective only on a real train split (dataset3d gates identically;
        # tests that train on the val split keep the no-'aug' batch pytree,
        # so the jitted signature stays consistent with the loader output)
        device_aug = (self._device_aug()
                      and training_set.set_name == "train"
                      and not training_set.analysisMode)
        training_set.device_aug = device_aug
        from ..dataset.loader import maybe_preload

        maybe_preload(self.cfg, training_set, validation_set)

        mesh = auto_train_mesh(int(cfg.BATCH_SIZE),
                               int(cfg.NUM_CAMERAS))
        train_loader, val_loader = make_dp_loaders(
            training_set, validation_set, int(cfg.BATCH_SIZE), workers, mesh,
            worker_mode=str(self.cfg.get("DATALOADER_WORKER_MODE",
                                         "thread")))
        steps_per_epoch = len(train_loader)
        use_onecycle = bool(cfg.USE_ONECYLCLE)
        labels = optim.hybridnet_freeze_labels(
            self.params, self.training_mode)
        if use_onecycle:
            schedule = optim.onecycle_schedule(
                float(cfg.MAX_LEARNING_RATE), steps_per_epoch * num_epochs)
            self.tx = optim.make_optimizer(cfg.OPTIMIZER, schedule, labels)
            plateau = None
        else:
            self.tx = optim.make_optimizer(
                cfg.OPTIMIZER, float(cfg.MAX_LEARNING_RATE), labels)
            plateau = optim.PlateauScheduler(float(cfg.MAX_LEARNING_RATE))
        train_step, eval_step = self._build_steps(
            self.tx, mesh, device_aug=device_aug)
        opt_state = self.tx.init(self.params)
        if resume_from is not None:
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

        rng = jax.random.PRNGKey(2)
        lr_scale = 1.0
        results = {"train_loss": 0, "train_acc": 0,
                   "val_loss": 0, "val_acc": 0}
        history = {k: [] for k in
                   ("train_loss", "train_acc", "val_loss", "val_acc")}
        results["history"] = history  # per-epoch curves (tests, GUI)
        step = 0

        from ..utils.st_monitor import StreamlitTrainingMonitor
        from ..utils.preemption import POD_POLL_STRIDE, PreemptionGuard

        monitor = StreamlitTrainingMonitor(streamlitWidgets, "HybridNet",
                                           acc_unit="mm")
        monitor.start(num_epochs)

        def to_batch(b):
            out = {
                "imgs": b["imgs"],  # raw uint8, normalized on device
                "center_hm": b["center_hm"],
                "center3d": b["center3d"],
                "kp_vox": b["kp_vox"],
                "keypoints3D": b["keypoints3D"],
                "camera_matrices": b["camera_matrices"],
                "intrinsics": b["intrinsics"],
                "distortions": b["distortions"],
            }
            if "aug" in b:  # train split with TPU.DEVICE_AUG
                out["aug"] = b["aug"]
            return out

        guard = PreemptionGuard()

        # One-step-delayed metric readback (same scheme + rationale as
        # trainer2d): dispatch step k+1 before blocking on step k's
        # (loss, points3d), so the mm-accuracy fetch and host metric
        # work overlap the device step instead of serializing with it.
        # Totals are unchanged — every step consumed once, flushed
        # before the plateau scheduler and epoch-end readers.
        pending = None  # (loss, pts, gt_np)

        def consume(p):
            loss, pts, gt = p
            acc = calculate_accuracy_mm(local_np(pts), gt)
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
                    rng, sub = jax.random.split(rng)
                    self.params, opt_state, loss, pts = train_step(
                        self.params, opt_state, lr_scale, sub, to_batch(b))
                    step += 1
                    if guard.should_stop_global(stride=POD_POLL_STRIDE):
                        if pending is not None:
                            consume(pending)
                            pending = None
                        self._save_preempted(opt_state, epoch)
                        results["preempted"] = True
                        return results
                    gt = local_np(b["keypoints3D"])
                    if pending is not None:
                        consume(pending)
                    pending = (loss, pts, gt)
                    bar.set_description(
                        "Epoch: {}/{}. Loss: {:.4f}. Acc: {:.2f}".format(
                            epoch + 1, num_epochs, self.lossMeter.read(),
                            self.accuracyMeter.read()))
                    if streamlitWidgets is not None:
                        monitor.step(count, steps_per_epoch)
                if pending is not None:  # flush before epoch-end readers
                    consume(pending)
                    pending = None

                if plateau is not None:
                    lr_scale = plateau.step(self.lossMeter.read()) / float(
                        cfg.MAX_LEARNING_RATE)

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
                        f"HybridNet-{self.cfg.KEYPOINTDETECT.MODEL_SIZE}"
                        f"_Epoch_{epoch+1}")
                    checkpoints.save_train_state(
                        os.path.join(self.model_savepath, "train_state.ckpt"),
                        self.params, opt_state, epoch + 1)
                if epoch + 1 == num_epochs:
                    self.save_checkpoint(
                        f"HybridNet-{self.cfg.KEYPOINTDETECT.MODEL_SIZE}_final")

                if epoch % int(cfg.VAL_INTERVAL) == 0:
                    for b in val_loader:
                        loss, pts = eval_step(self.params, to_batch(b))
                        acc = calculate_accuracy_mm(
                            local_np(pts), local_np(b["keypoints3D"]))
                        self.lossMeter.update(float(loss))
                        if acc != -1:
                            self.accuracyMeter.update(acc)
                    print("Val. Epoch: {}/{}. Loss: {:.3f}. Acc: {:.2f}".format(
                        epoch + 1, num_epochs, self.lossMeter.read(),
                        self.accuracyMeter.read()))
                    results["val_loss"] = self.lossMeter.read()
                    results["val_acc"] = self.accuracyMeter.read()
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
            self.params, os.path.join(self.model_savepath, name + ".ckpt"))
        try:
            checkpoints.save_torch_checkpoint(
                self.params, os.path.join(self.model_savepath, name + ".pth"),
                self.cfg.KEYPOINTDETECT.MODEL_SIZE, kind="hybridnet")
        except ImportError:
            clp.warning("torch unavailable; skipped .pth export")
