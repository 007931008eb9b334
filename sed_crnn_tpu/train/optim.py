"""Optimization: Adam with torch semantics, global-norm clipping, and a
ReduceLROnPlateau schedule — all framework-native pytree transforms.

Parity notes (so training curves are comparable to the reference):

* Adam matches `torch.optim.Adam` exactly: L2 weight decay folded into the
  gradient (not decoupled), bias-corrected first/second moments,
  ``eps`` added OUTSIDE the sqrt (reference optimizers: `sed.py:159`,
  `crnn_lightning.py:196-197`).
* Clipping matches Lightning's ``gradient_clip_val=1.0``
  (`train_lightning.py:50`): global L2 norm over all parameters.
* The plateau schedule matches `torch.optim.lr_scheduler.ReduceLROnPlateau`
  (mode min, factor .5, patience 10, rel threshold 1e-4, cooldown 0 —
  `crnn_lightning.py:198-200`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    step: jnp.ndarray   # scalar int32
    mu: Any             # first-moment pytree
    nu: Any             # second-moment pytree


@dataclasses.dataclass(frozen=True)
class Adam:
    learning_rate: float = 1e-3
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    weight_decay: float = 0.0
    grad_clip_norm: Optional[float] = None

    def init(self, params) -> AdamState:
        zeros = jax.tree.map(lambda p: jnp.zeros_like(p, dtype=jnp.float32), params)
        return AdamState(step=jnp.zeros((), jnp.int32), mu=zeros, nu=jax.tree.map(jnp.copy, zeros))

    def update(
        self,
        grads,
        state: AdamState,
        params,
        lr_scale: jnp.ndarray | float = 1.0,
    ) -> Tuple[Any, AdamState]:
        """Returns (new_params, new_state). ``lr_scale`` multiplies the base
        learning rate (driven by the plateau schedule)."""
        if self.grad_clip_norm is not None:
            grads = clip_by_global_norm(grads, self.grad_clip_norm)
        if self.weight_decay:
            grads = jax.tree.map(
                lambda g, p: g + self.weight_decay * p.astype(g.dtype), grads, params
            )

        step = state.step + 1
        t = step.astype(jnp.float32)
        mu = jax.tree.map(lambda m, g: self.b1 * m + (1 - self.b1) * g, state.mu, grads)
        nu = jax.tree.map(lambda v, g: self.b2 * v + (1 - self.b2) * g * g, state.nu, grads)
        bc1 = 1.0 - self.b1**t
        bc2 = 1.0 - self.b2**t
        lr = self.learning_rate * lr_scale

        def upd(p, m, v):
            mhat = m / bc1
            vhat = v / bc2
            return (p.astype(jnp.float32) - lr * mhat / (jnp.sqrt(vhat) + self.eps)).astype(
                p.dtype
            )

        new_params = jax.tree.map(upd, params, mu, nu)
        return new_params, AdamState(step=step, mu=mu, nu=nu)


def global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(l.astype(jnp.float32) ** 2) for l in leaves))


def clip_by_global_norm(tree, max_norm: float):
    norm = global_norm(tree)
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
    return jax.tree.map(lambda l: l * scale.astype(l.dtype), tree)


class PlateauState(NamedTuple):
    best: float
    num_bad: int
    lr_scale: float


@dataclasses.dataclass(frozen=True)
class ReduceLROnPlateau:
    """Epoch-level schedule (torch semantics, mode='min').

    ``step`` is pure jnp arithmetic so it composes with traced/device values:
    the fold runner feeds it the val-loss scalar straight off the epoch
    program without a host sync, which keeps the epoch-pipelining dispatch
    chain fully asynchronous. Plain Python floats work too (tests, resume)."""

    factor: float = 0.5
    patience: int = 10
    threshold: float = 1e-4  # relative improvement threshold
    min_scale: float = 0.0

    def init(self) -> PlateauState:
        return PlateauState(best=float("inf"), num_bad=0, lr_scale=1.0)

    def step(self, state: PlateauState, metric) -> PlateauState:
        metric = jnp.asarray(metric, jnp.float32)
        best = jnp.asarray(state.best, jnp.float32)
        num_bad = jnp.asarray(state.num_bad, jnp.int32)
        lr = jnp.asarray(state.lr_scale, jnp.float32)
        improved = metric < best * (1.0 - self.threshold)
        drop = jnp.logical_and(~improved, num_bad + 1 > self.patience)
        return PlateauState(
            best=jnp.where(improved, metric, best),
            num_bad=jnp.where(improved | drop, 0, num_bad + 1),
            lr_scale=jnp.where(drop, jnp.maximum(lr * self.factor, self.min_scale), lr),
        )
