"""Optimizers and LR schedules (optax).

Matches the reference's training recipes
(jarvis/efficienttrack/efficienttrack.py:72-78, 239-247):
AdamW or SGD+Nesterov(0.9); OneCycle (torch defaults: pct_start 0.3, cosine
anneal, div_factor 100, final_div_factor 1e4) or ReduceLROnPlateau
(factor 0.2, patience 3, min_lr 5e-5). Partial-freeze training modes
(jarvis/hybridnet/hybridnet.py:367-388) are expressed as label pytrees fed
to optax.multi_transform, which replicates torch's requires_grad=False
semantics (frozen params receive no update, including no weight decay).
"""

from __future__ import annotations

from typing import Any

import optax


def onecycle_schedule(max_lr: float, total_steps: int,
                      pct_start: float = 0.3, div_factor: float = 100.0,
                      final_div_factor: float = 1e4):
    """torch.optim.lr_scheduler.OneCycleLR ('cos'), bit-matched including
    torch's phase-boundary convention (phase 1 ends at
    ``pct_start*total_steps - 1``)."""
    import jax.numpy as jnp

    initial = max_lr / div_factor
    min_lr = initial / final_div_factor
    phase1_end = float(pct_start * total_steps) - 1.0
    phase2_len = float(total_steps - 1) - phase1_end

    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        pct1 = jnp.clip(s / phase1_end, 0.0, 1.0)
        up = max_lr + (initial - max_lr) / 2.0 * (1 + jnp.cos(jnp.pi * pct1))
        pct2 = jnp.clip((s - phase1_end) / phase2_len, 0.0, 1.0)
        down = min_lr + (max_lr - min_lr) / 2.0 * (1 + jnp.cos(jnp.pi * pct2))
        return jnp.where(s <= phase1_end, up, down)

    return schedule


class PlateauScheduler:
    """Host-side ReduceLROnPlateau state
    (torch defaults used by the reference: factor 0.2, patience 3,
    min_lr 5e-5, stepped once per epoch on the train loss)."""

    def __init__(self, initial_lr: float, factor: float = 0.2,
                 patience: int = 3, min_lr: float = 5e-5):
        self.lr = initial_lr
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.best = float("inf")
        self.num_bad = 0

    def step(self, metric: float) -> float:
        if metric < self.best:
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad = 0
        return self.lr


def make_optimizer(
    optimizer_name: str,
    learning_rate,  # float or schedule
    freeze_labels: Any | None = None,
):
    """optimizer_name in {'adamw', 'sgd'}; freeze_labels is an optional
    pytree of 'train'/'freeze' labels matching the param tree."""
    if optimizer_name == "adamw":
        base = optax.adamw(learning_rate)
    else:
        base = optax.sgd(learning_rate, momentum=0.9, nesterov=True)
    if freeze_labels is None:
        return base
    return optax.multi_transform(
        {"train": base, "freeze": optax.set_to_zero()}, freeze_labels
    )


def hybridnet_freeze_labels(params: dict, mode: str) -> dict:
    """Label pytree for the reference's training modes
    ('all' / 'bifpn' / 'last_layers' / '3D_only',
    jarvis/hybridnet/hybridnet.py:367-388)."""
    import jax

    def label(path, _):
        keys = [p.key for p in path]
        if keys[0] != "effTrack":
            return "train"  # v2vNet always trains
        if mode == "all":
            return "train"
        if mode == "bifpn":
            return "freeze" if keys[1] == "backbone_net" else "train"
        if mode == "last_layers":
            frozen = keys[1] == "backbone_net" or keys[1].startswith("bifpn")
            return "freeze" if frozen else "train"
        if mode == "3D_only":
            return "freeze"
        raise ValueError(f"unknown training mode {mode!r}")

    return jax.tree_util.tree_map_with_path(label, params)
