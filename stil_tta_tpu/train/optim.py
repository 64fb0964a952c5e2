"""Optimizer + LR schedules.

Parity target: ``/root/reference/models/Disentangle/STiLModel.py:557-589``
— torch.optim.Adam (L2 folded into the gradient, *not* AdamW) at
``lr_eval`` / ``weight_decay_eval``, with one of three epoch-stepped
schedulers: 'cosine' (CosineAnnealingLR), 'anneal'
(LinearWarmupCosineAnnealingLR), 'linear' (ReduceLROnPlateau).

Design: the learning rate is an injected hyperparameter; the host
computes the epoch's lr (schedules are epoch-granular in the reference —
Lightning steps them per epoch) and writes it into the optimizer state.
The jitted train step never recompiles on lr changes.
"""

from __future__ import annotations

import math
from typing import Optional

import optax


def build_optimizer(lr: float, weight_decay: float = 0.0,
                    b1: float = 0.9, b2: float = 0.999,
                    eps: float = 1e-8,
                    freeze_fn=None,
                    mu_dtype=None) -> optax.GradientTransformation:
    """torch.optim.Adam-parity optimizer. ``freeze_fn(params) -> bool
    pytree`` marks leaves whose updates are zeroed (the reference's
    ``finetune_strategy: frozen`` encoder freeze,
    ``STiLModel_backbone.py:79-84``).

    ``mu_dtype``: storage dtype of Adam's FIRST moment (``None`` = the
    param dtype, f32). ``'bfloat16'`` halves the moment's HBM traffic in
    the update; with b1=0.9 each step writes ~10% of the new gradient
    into mu, far above bf16's ~0.4% resolution, so the quantization is
    benign. The SECOND moment stays f32 deliberately: with b2=0.999 its
    per-step increment is ~0.1% of the running value — below bf16
    resolution, so a bf16 nu would stop accumulating entirely."""
    if isinstance(mu_dtype, str):
        import jax.numpy as jnp
        mu_dtype = jnp.dtype(mu_dtype)

    def make(learning_rate):
        txs = []
        if weight_decay:
            # torch Adam: grad += wd * param *before* the moment update
            txs.append(optax.add_decayed_weights(weight_decay))
        txs.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps,
                                       mu_dtype=mu_dtype))
        txs.append(optax.scale_by_learning_rate(learning_rate))
        if freeze_fn is not None:
            txs.append(optax.masked(optax.set_to_zero(), freeze_fn))
        return optax.chain(*txs)

    return optax.inject_hyperparams(make)(learning_rate=lr)


def encoder_freeze_fn(params):
    """True for every leaf under the backbone's image/tabular encoders."""
    import jax

    def mark(path, _):
        names = [str(getattr(p, "key", "")) for p in path]
        return any(n in ("encoder_imaging", "encoder_tabular")
                   for n in names)

    return jax.tree_util.tree_map_with_path(mark, params)


def set_learning_rate(opt_state, lr: float):
    import jax.numpy as jnp
    # keep a strong-typed f32 scalar so the train step's jit signature
    # is stable (a bare python float would be weak-typed -> cache miss)
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


def cosine_lr(base_lr: float, epoch: int, t_max: int,
              eta_min: float = 0.0) -> float:
    """CosineAnnealingLR(T_max) (``STiLModel.py:581``)."""
    return eta_min + (base_lr - eta_min) * (
        1 + math.cos(math.pi * epoch / max(t_max, 1))) / 2


def warmup_cosine_lr(base_lr: float, epoch: int, warmup_epochs: int,
                     max_epochs: int, warmup_start_lr: float = 0.0,
                     eta_min: float = 0.0) -> float:
    """LinearWarmupCosineAnnealingLR (``STiLModel.py:583``)."""
    if warmup_epochs > 0 and epoch < warmup_epochs:
        if warmup_epochs == 1:
            return base_lr
        return warmup_start_lr + (base_lr - warmup_start_lr) * epoch / (
            warmup_epochs - 1)
    span = max(max_epochs - warmup_epochs, 1)
    t = (epoch - warmup_epochs) % (2 * span)
    return eta_min + (base_lr - eta_min) * (
        1 + math.cos(math.pi * t / span)) / 2


class PlateauScheduler:
    """ReduceLROnPlateau(patience, factor=0.1, min_lr)
    (``STiLModel.py:585``): host-side, monitors the val metric."""

    def __init__(self, base_lr: float, patience: int, min_lr: float,
                 factor: float = 0.1, mode: str = "min"):
        self.lr = base_lr
        self.patience = patience
        self.min_lr = min_lr
        self.factor = factor
        self.mode = mode
        self.best: Optional[float] = None
        self.bad_epochs = 0

    def step(self, metric: float) -> float:
        improved = (self.best is None
                    or (self.mode == "min" and metric < self.best)
                    or (self.mode == "max" and metric > self.best))
        if improved:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.bad_epochs = 0
        return self.lr


def scheduled_lr(cfg, epoch: int, val_metric: Optional[float] = None,
                 plateau: Optional[PlateauScheduler] = None) -> float:
    """Dispatch on cfg.scheduler exactly as ``STiLModel.py:579-589``."""
    base_lr = cfg.lr_eval if cfg.lr_eval is not None else cfg.lr
    sched = cfg.scheduler
    if sched == "cosine":
        t_max = int((cfg.dataset_length or 1) * (cfg.cosine_anneal_mult or 1))
        return cosine_lr(base_lr, epoch, t_max)
    if sched == "anneal":
        max_epochs = cfg.anneal_max_epochs or cfg.max_epochs
        return warmup_cosine_lr(base_lr, epoch, cfg.warmup_epochs or 0,
                                max_epochs)
    if sched == "linear":
        assert plateau is not None
        if val_metric is None:
            return plateau.lr
        return plateau.step(val_metric)
    raise ValueError(f'Valid schedulers are "cosine", "anneal", "linear"; '
                     f"got {sched}")
