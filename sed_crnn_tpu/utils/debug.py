"""Debug-mode numerical guards — the framework's analogue of the reference's
hard shape assertions and `deterministic=True` belt-and-braces
(`decorte_datamodule.py:83-109`, `train_lightning.py:47`). Determinism here
is by construction (key-driven RNG, jitted programs); these helpers add
opt-in NaN/Inf detection and shape contracts at the host boundary."""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class NonFiniteError(RuntimeError):
    pass


def assert_tree_finite(tree: Any, label: str = "tree") -> None:
    """Raise NonFiniteError naming every offending leaf path (one device
    fetch per leaf norm; intended for debug mode / post-mortems)."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            n_bad = int((~np.isfinite(arr)).sum())
            bad.append(f"{jax.tree_util.keystr(path)}: {n_bad}/{arr.size} non-finite")
    if bad:
        raise NonFiniteError(f"{label} contains non-finite values:\n  " + "\n  ".join(bad))


def tree_norms(tree: Any) -> dict:
    """Per-leaf L2 norms (host floats) for drift monitoring."""
    return {
        jax.tree_util.keystr(path): float(jnp.sqrt(jnp.sum(leaf.astype(jnp.float32) ** 2)))
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def check_shape(x, expected: Tuple[int, ...], label: str = "array") -> None:
    got = tuple(x.shape)
    if len(got) != len(expected) or any(
        e not in (-1, g) for e, g in zip(expected, got)
    ):
        raise ValueError(f"{label}: expected shape {expected}, got {got}")


def guard_scores(scores: dict, epoch: int, fold: int) -> None:
    """Fail fast (with context) when a training epoch produces a non-finite
    loss — the debug-mode hook `run_fold(debug=True)` installs."""
    loss = float(scores.get("loss", 0.0))
    if not np.isfinite(loss):
        raise NonFiniteError(
            f"fold {fold} epoch {epoch}: non-finite loss {loss} "
            "(inspect the last checkpoint and per-leaf grad norms)"
        )
