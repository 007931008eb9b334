"""Training objectives, jit-compatible and numerically stable.

* ``bce_with_logits`` — capability parity with `nn.BCEWithLogitsLoss`
  (reference `sed.py:160`), written in the stable log-sum-exp form (no
  sigmoid saturation in the backward pass).
* ``focal_bce`` — the reference's FocalBCELoss math exactly
  (`crnn_lightning.py:27-35`): ``pt = sigmoid(logits)`` flipped by target,
  ``-alpha * (1-pt)^gamma * log(pt + 1e-12)``, mean reduction. Unlike the
  BCE above this is intentionally computed through the sigmoid (with the
  reference's 1e-12 epsilon) so losses match the reference bit-for-bit in
  expectation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray, reduction: str = "mean"):
    """Binary cross-entropy on logits: max(x,0) - x*t + log(1 + exp(-|x|))."""
    x = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    loss = jnp.maximum(x, 0.0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return _reduce(loss, reduction)


def focal_bce(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
    eps: float = 1e-12,
    reduction: str = "mean",
):
    pt = jax.nn.sigmoid(logits.astype(jnp.float32))
    t = targets.astype(jnp.float32)
    pt = jnp.where(t == 1.0, pt, 1.0 - pt)
    loss = -alpha * (1.0 - pt) ** gamma * jnp.log(pt + eps)
    return _reduce(loss, reduction)


def _reduce(loss, reduction):
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    if reduction == "none":
        return loss
    raise ValueError(f"unknown reduction {reduction!r}")


def make_loss(name: str, alpha: float = 0.25, gamma: float = 2.0):
    """Returns ``fn(logits, targets, reduction="mean")`` — the reduction
    passthrough lets masked full-sweep evaluation take elementwise losses."""
    if name == "bce":
        return bce_with_logits
    if name == "focal":
        return lambda logits, targets, reduction="mean": focal_bce(
            logits, targets, alpha, gamma, reduction=reduction
        )
    raise ValueError(f"unknown loss {name!r}; expected 'bce' or 'focal'")
