"""Optimizers and LR schedules with torch-matching semantics, on optax.

The reference instantiates ``torch.optim.{Adam,SGD,RMSprop}`` and
``torch.optim.lr_scheduler.{PolynomialLR,ReduceLROnPlateau}`` from hydra
configs (reference: uncertainty_modeling/lightning_experiment.py:92-126;
configs/gta_softmax_config.yaml, gta_ssn_config.yaml). The factories here
carry the same names via the config alias table and reproduce torch's
update rules:

- Adam: weight decay added to the gradient *before* the moment updates
  (L2, not AdamW), betas (0.9, 0.999), eps 1e-8.
- SGD: momentum buffer ``b = m*b + g``, update ``-lr*b``.
- RMSprop: ``n = a*n + (1-a)*g^2``, update ``-lr * g / (sqrt(n) + eps)``
  (eps outside the sqrt, unlike optax's scale_by_rms default).
- PolynomialLR: ``lr(step) = base * (1 - step/total_iters)^power`` for
  step <= total_iters, 0 after.
- ReduceLROnPlateau: host-side factor applied through the injected
  ``learning_rate`` hyperparameter (patience 10, factor 0.1 — torch
  defaults used by the reference fallback).

All optimizers are built with ``optax.inject_hyperparams`` so the training
loop can scale ``learning_rate`` between steps (plateau scheduling) without
recompilation.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


def _scale_by_rms_torch(decay: float, eps: float):
    """Torch RMSprop: g / (sqrt(n) + eps) with biased running average."""
    def init_fn(params):
        return {"nu": jax.tree_util.tree_map(jnp.zeros_like, params)}

    def update_fn(updates, state, params=None):
        nu = jax.tree_util.tree_map(
            lambda n, g: decay * n + (1 - decay) * g * g,
            state["nu"], updates)
        updates = jax.tree_util.tree_map(
            lambda g, n: g / (jnp.sqrt(n) + eps), updates, nu)
        return updates, {"nu": nu}

    return optax.GradientTransformation(init_fn, update_fn)


def adam(params: Any = None, lr: float = 1e-4, weight_decay: float = 0.0,
         betas=(0.9, 0.999), eps: float = 1e-8,
         **_ignored) -> optax.GradientTransformation:
    @optax.inject_hyperparams
    def build(learning_rate):
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps),
            optax.scale(-1.0),
            optax.scale_by_learning_rate(learning_rate, flip_sign=False),
        )
    return build(learning_rate=lr)


def sgd(params: Any = None, lr: float = 0.01, momentum: float = 0.0,
        weight_decay: float = 0.0, nesterov: bool = False,
        **_ignored) -> optax.GradientTransformation:
    @optax.inject_hyperparams
    def build(learning_rate):
        parts = []
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
        if momentum:
            parts.append(optax.trace(decay=momentum, nesterov=nesterov))
        parts.append(optax.scale(-1.0))
        parts.append(optax.scale_by_learning_rate(learning_rate,
                                                  flip_sign=False))
        return optax.chain(*parts)
    return build(learning_rate=lr)


def rmsprop(params: Any = None, lr: float = 0.01, alpha: float = 0.99,
            eps: float = 1e-8, weight_decay: float = 0.0,
            **_ignored) -> optax.GradientTransformation:
    @optax.inject_hyperparams
    def build(learning_rate):
        parts = []
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
        parts.append(_scale_by_rms_torch(alpha, eps))
        parts.append(optax.scale(-1.0))
        parts.append(optax.scale_by_learning_rate(learning_rate,
                                                  flip_sign=False))
        return optax.chain(*parts)
    return build(learning_rate=lr)


class LRSchedule(NamedTuple):
    """Host-applied learning-rate policy."""
    kind: str                      # "polynomial" | "plateau"
    base_lr: float
    total_iters: int = 0
    power: float = 1.0
    factor: float = 0.1
    patience: int = 10
    threshold: float = 1e-4        # torch rel-mode improvement threshold
    interval: str = "step"

    def value(self, step: int) -> float:
        if self.kind == "polynomial":
            frac = min(step, self.total_iters) / max(self.total_iters, 1)
            return self.base_lr * (1.0 - frac) ** self.power
        return self.base_lr


def polynomial_lr(optimizer: Any = None, total_iters: int = 1000,
                  power: float = 1.0, **_ignored) -> Callable[[float], LRSchedule]:
    return lambda base_lr: LRSchedule("polynomial", base_lr,
                                      total_iters=int(total_iters),
                                      power=power, interval="step")


def reduce_lr_on_plateau(optimizer: Any = None, patience: int = 10,
                         factor: float = 0.1, threshold: float = 1e-4,
                         **_ignored) -> Callable[[float], LRSchedule]:
    return lambda base_lr: LRSchedule("plateau", base_lr, factor=factor,
                                      patience=patience,
                                      threshold=float(threshold),
                                      interval="epoch")


class PlateauTracker:
    """Host-side ReduceLROnPlateau state machine matching torch's
    defaults (mode=min, threshold_mode=rel): improvement iff
    ``metric < best * (1 - threshold)``; after ``patience`` consecutive
    non-improving epochs the LR is scaled by ``factor``
    (torch.optim.lr_scheduler.ReduceLROnPlateau.is_better; the
    reference's optimizer fallback, lightning_experiment.py)."""

    def __init__(self, schedule: "LRSchedule"):
        self.schedule = schedule
        self.best = float("inf")
        self.bad_epochs = 0
        self.lr_scale = 1.0

    def step(self, metric: float) -> float:
        """Record one epoch's monitored value; returns the current LR."""
        s = self.schedule
        if metric < self.best * (1.0 - s.threshold):
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > s.patience:
                self.lr_scale *= s.factor
                self.bad_epochs = 0
        return s.base_lr * self.lr_scale


def clip_grads_by_global_norm(grads: Any, max_norm: float) -> Any:
    """torch.nn.utils.clip_grad_norm_ semantics, which PL's Trainer applies
    when ``gradient_clip_val`` is set (reference:
    uncertainty_modeling/main.py:66-74): scale all gradients by
    ``max_norm / (total_norm + 1e-6)`` clamped to <= 1, where total_norm is
    the global 2-norm over every leaf."""
    leaves = jax.tree_util.tree_leaves(grads)
    total = jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))
    coef = jnp.minimum(max_norm / (total + 1e-6), 1.0)
    return jax.tree_util.tree_map(lambda g: g * coef, grads)


def set_learning_rate(opt_state, lr) -> Any:
    """Overwrite the injected learning_rate hyperparameter in-place-ish."""
    hyperparams = dict(opt_state.hyperparams)
    hyperparams["learning_rate"] = jnp.asarray(
        lr, dtype=jnp.asarray(opt_state.hyperparams["learning_rate"]).dtype)
    return opt_state._replace(hyperparams=hyperparams)


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])
