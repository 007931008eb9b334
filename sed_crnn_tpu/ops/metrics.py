"""Segment-based polyphonic SED metrics (Mesaros et al. 2016) as vectorized
on-device reductions, reproducing the reference implementation's exact
semantics (reference `metrics.py:14-74`) so ER/F1 numbers are directly
comparable:

* framewise F1 with ``TP = ((2T - O) == 1).sum()`` and machine-eps guards on
  precision/recall denominators;
* framewise ER with per-row substitutions/deletions/insertions and an
  UNGUARDED ``Nref`` denominator (0/0 -> NaN on empty references, inf when
  only false positives exist — the reference's behavior, reproduced here);
* 1-second-segment variants that max-pool frames into blocks first, keeping
  the reference's block-count asymmetry: F1 pads to ceil(N/block) blocks
  while ER truncates to floor(N/block) blocks;
* a `vmap`'d threshold sweep over probabilities.

All functions are jittable with static block sizes; 3-D ``(N, T, C)`` inputs
are flattened to ``(N*T, C)`` first, as in the reference.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

# Machine epsilon for float64 — the reference uses np.finfo(float).eps in the
# F1 denominators.
EPS = float(np.finfo(np.float64).eps)


def _as_2d(x: jnp.ndarray) -> jnp.ndarray:
    if x.ndim == 3:
        return x.reshape(x.shape[0] * x.shape[1], x.shape[2])
    if x.ndim == 1:
        return x[:, None]
    return x


def _block_max(x: jnp.ndarray, block: int, mode: str) -> jnp.ndarray:
    """Max-pool frames into blocks. mode='ceil' zero-pads the tail block (F1
    path); mode='floor' drops the partial tail block (ER path)."""
    n, c = x.shape
    if mode == "ceil":
        n_blocks = -(-n // block)
        pad = n_blocks * block - n
        x = jnp.pad(x, ((0, pad), (0, 0)))
    else:
        n_blocks = n // block
        x = x[: n_blocks * block]
    return x.reshape(n_blocks, block, c).max(axis=1)


def f1_framewise(outputs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    o = _as_2d(outputs).astype(jnp.float32)
    t = _as_2d(targets).astype(jnp.float32)
    tp = jnp.sum((2.0 * t - o) == 1.0)
    nref, nsys = jnp.sum(t), jnp.sum(o)
    prec = tp / (nsys + EPS)
    recall = tp / (nref + EPS)
    return 2.0 * prec * recall / (prec + recall + EPS)


def er_framewise(outputs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    o = _as_2d(outputs).astype(jnp.float32)
    t = _as_2d(targets).astype(jnp.float32)
    fp = jnp.sum((t == 0.0) & (o == 1.0), axis=1).astype(jnp.float32)
    fn = jnp.sum((t == 1.0) & (o == 0.0), axis=1).astype(jnp.float32)
    subs = jnp.sum(jnp.minimum(fp, fn))
    dels = jnp.sum(jnp.maximum(0.0, fn - fp))
    ins = jnp.sum(jnp.maximum(0.0, fp - fn))
    nref = jnp.sum(t)
    return (subs + dels + ins) / nref  # unguarded, parity with reference


@partial(jax.jit, static_argnums=(2,))
def f1_segment(outputs: jnp.ndarray, targets: jnp.ndarray, block_size: int) -> jnp.ndarray:
    o, t = _as_2d(outputs), _as_2d(targets)
    return f1_framewise(_block_max(o, block_size, "ceil"), _block_max(t, block_size, "ceil"))


@partial(jax.jit, static_argnums=(2,))
def er_segment(outputs: jnp.ndarray, targets: jnp.ndarray, block_size: int) -> jnp.ndarray:
    o, t = _as_2d(outputs), _as_2d(targets)
    return er_framewise(_block_max(o, block_size, "floor"), _block_max(t, block_size, "floor"))


@partial(jax.jit, static_argnums=(2,))
def compute_scores(pred: jnp.ndarray, y: jnp.ndarray, frames_in_1_sec: int = 50) -> Dict[str, jnp.ndarray]:
    """The reference's `compute_scores` contract (`metrics.py:70-74`)."""
    return {
        "f1_overall_1sec": f1_segment(pred, y, frames_in_1_sec),
        "er_overall_1sec": er_segment(pred, y, frames_in_1_sec),
    }


@partial(jax.jit, static_argnums=(2,))
def all_scores(pred: jnp.ndarray, y: jnp.ndarray, frames_in_1_sec: int) -> Dict[str, jnp.ndarray]:
    """Framewise + 1-sec F1/ER plus the binary confusion matrix the v2
    training loop logs (`crnn_lightning.py:116-126`)."""
    o, t = _as_2d(pred), _as_2d(y)
    ob = o.astype(jnp.bool_)
    tb = t.astype(jnp.bool_)
    return {
        "f1_frame": f1_framewise(o, t),
        "er_frame": er_framewise(o, t),
        "f1_overall_1sec": f1_segment(o, t, frames_in_1_sec),
        "er_overall_1sec": er_segment(o, t, frames_in_1_sec),
        "tn": jnp.sum(~ob & ~tb),
        "fp": jnp.sum(ob & ~tb),
        "fn": jnp.sum(~ob & tb),
        "tp": jnp.sum(ob & tb),
    }


@partial(jax.jit, static_argnums=(2,))
def all_scores_masked(
    pred: jnp.ndarray,
    y: jnp.ndarray,
    frames_in_1_sec: int,
    n_valid_rows: jnp.ndarray,
):
    """`all_scores` over only the first ``n_valid_rows`` rows, with the count
    TRACED so one compiled program serves epochs of different lengths (padded
    shape-bucketed epochs append zero rows).

    Exactness vs scoring the unpadded prefix: zero rows contribute nothing to
    frame F1/ER sums; the segment-F1 ceil path's tail zero-padding is exactly
    what padding provides; and the segment-ER floor path's truncation is
    reproduced by ALSO zeroing the valid stream's partial tail block before
    pooling. Only the TN count needs an explicit row mask.
    """
    o, t = _as_2d(pred).astype(jnp.float32), _as_2d(y).astype(jnp.float32)
    rows = jnp.arange(o.shape[0])[:, None]
    valid = rows < n_valid_rows
    o = jnp.where(valid, o, 0.0)
    t = jnp.where(valid, t, 0.0)
    ob = o.astype(jnp.bool_)
    tb = t.astype(jnp.bool_)
    er_rows = (n_valid_rows // frames_in_1_sec) * frames_in_1_sec
    oe = jnp.where(rows < er_rows, o, 0.0)
    te = jnp.where(rows < er_rows, t, 0.0)
    return {
        "f1_frame": f1_framewise(o, t),
        "er_frame": er_framewise(o, t),
        "f1_overall_1sec": f1_segment(o, t, frames_in_1_sec),
        "er_overall_1sec": er_framewise(
            _block_max(oe, frames_in_1_sec, "floor"),
            _block_max(te, frames_in_1_sec, "floor"),
        ),
        "tn": jnp.sum(~ob & ~tb & valid),
        "fp": jnp.sum(ob & ~tb),
        "fn": jnp.sum(~ob & tb),
        "tp": jnp.sum(ob & tb),
    }


@partial(jax.jit, static_argnums=(2,))
def class_wise_scores(pred: jnp.ndarray, y: jnp.ndarray, frames_in_1_sec: int):
    """Per-class 1-sec-segment F1 and ER (sed_eval-style class breakdown —
    the reference reports only overall scores). Returns two (n_classes,)
    arrays, vmapped over the class axis of the pooled blocks."""
    o, t = _as_2d(pred), _as_2d(y)
    o_ceil = _block_max(o, frames_in_1_sec, "ceil")
    t_ceil = _block_max(t, frames_in_1_sec, "ceil")
    o_floor = _block_max(o, frames_in_1_sec, "floor")
    t_floor = _block_max(t, frames_in_1_sec, "floor")

    f1s = jax.vmap(lambda oc, tc: f1_framewise(oc[:, None], tc[:, None]), in_axes=1)(
        o_ceil, t_ceil
    )
    ers = jax.vmap(lambda oc, tc: er_framewise(oc[:, None], tc[:, None]), in_axes=1)(
        o_floor, t_floor
    )
    return f1s, ers


def class_wise_report(pred: jnp.ndarray, y: jnp.ndarray, frames_in_1_sec: int):
    """Per-class breakdown with absent classes masked instead of leaking the
    overall scorer's unguarded 0/0 (the parity quirk stays in
    `class_wise_scores`; this report-friendly wrapper is new surface).

    Returns a dict of per-class lists: ``f1_1s``/``er_1s`` hold ``None`` for
    classes with no reference blocks in the split, and ``present`` flags
    which classes actually occur.
    """
    f1s, ers = class_wise_scores(pred, y, frames_in_1_sec)
    t = _as_2d(y)
    # Presence per the ER path's floor-pooled blocks (the denominator that
    # goes to zero); a class with positives only in the truncated tail still
    # has Nref == 0 there.
    nref = _block_max(t, frames_in_1_sec, "floor").sum(axis=0)
    present = [bool(v) for v in np.asarray(nref > 0)]
    f1_list = [float(v) if p else None for v, p in zip(np.asarray(f1s), present)]
    er_list = [float(v) if p else None for v, p in zip(np.asarray(ers), present)]
    return {"f1_1s": f1_list, "er_1s": er_list, "present": present}


@partial(jax.jit, static_argnums=(3,))
def threshold_sweep_per_class(
    probs: jnp.ndarray,
    targets: jnp.ndarray,
    thresholds: jnp.ndarray,
    frames_in_1_sec: int,
):
    """Per-class segment scores at every threshold, as one vmapped device
    program over the (threshold, class) grid.

    Class c's segment F1/ER depend only on class c's probability column, so
    the global sweep decomposes exactly per class. Returns three
    ``(n_thresholds, n_classes)`` arrays: F1 (ceil-pooled blocks), ER
    (floor-pooled; NaN/inf for classes absent from the reference — the
    parity-preserved unguarded ``Nref``), and the floor-pooled
    false-positive block count (the tie-break objective for absent classes).
    """
    p = _as_2d(probs)
    t = _as_2d(targets)
    t_ceil = _block_max(t, frames_in_1_sec, "ceil")
    t_floor = _block_max(t, frames_in_1_sec, "floor")

    def one(th):
        o = (p > th).astype(jnp.float32)
        o_ceil = _block_max(o, frames_in_1_sec, "ceil")
        o_floor = _block_max(o, frames_in_1_sec, "floor")
        f1 = jax.vmap(
            lambda oc, tc: f1_framewise(oc[:, None], tc[:, None]), in_axes=1
        )(o_ceil, t_ceil)
        er = jax.vmap(
            lambda oc, tc: er_framewise(oc[:, None], tc[:, None]), in_axes=1
        )(o_floor, t_floor)
        fp = jnp.sum((o_floor == 1.0) & (t_floor == 0.0), axis=0).astype(
            jnp.float32
        )
        return f1, er, fp

    return jax.vmap(one)(thresholds)


def best_per_class_thresholds(
    probs,
    targets,
    thresholds,
    frames_in_1_sec: int,
    objective: str = "er",
):
    """Per-class operating points: choose each class's binarization threshold
    independently (min per-class segment ER, or max F1 with
    ``objective="f1"``), then score the OVERALL segment metrics with the
    per-class threshold vector applied — the standard DCASE refinement over
    one global threshold (`best_threshold`).

    Two caveats, by construction: (1) independent per-class choices are a
    heuristic for the overall ER — its substitution term couples classes
    within a segment, so the vector is not guaranteed jointly optimal (it
    can only beat or match the global sweep's *per-class decomposable*
    part); (2) classes absent from the reference have no per-class ER/F1
    signal (unguarded 0/0), so their threshold is chosen to minimize
    floor-pooled false-positive blocks instead — the only term through
    which an absent class can hurt the overall ER.

    Returns ``thresholds`` (n_classes,), overall ``er``/``f1`` at that
    vector, per-class scores at the chosen points, and the full per-class
    sweep tables.
    """
    if objective not in ("er", "f1"):
        raise ValueError(f"objective must be 'er' or 'f1', got {objective!r}")
    thresholds = jnp.asarray(thresholds, jnp.float32)
    f1s, ers, fps = threshold_sweep_per_class(
        probs, targets, thresholds, frames_in_1_sec
    )
    t = _as_2d(targets)
    present = _block_max(t, frames_in_1_sec, "floor").sum(axis=0) > 0
    if objective == "er":
        key = jnp.where(jnp.isfinite(ers), ers, jnp.inf)
    else:
        key = -f1s
    idx = jnp.argmin(jnp.where(present[None, :], key, fps), axis=0)
    th_vec = jnp.take(thresholds, idx)
    o = (_as_2d(probs) > th_vec[None, :]).astype(jnp.float32)

    def take(a):
        return jnp.take_along_axis(a, idx[None, :], axis=0)[0]

    return {
        "thresholds": th_vec,
        "er": er_segment(o, t, frames_in_1_sec),
        "f1": f1_segment(o, t, frames_in_1_sec),
        "class_f1": take(f1s),
        "class_er": take(ers),
        "class_present": present,
        "all_f1": f1s,
        "all_er": ers,
    }


@partial(jax.jit, static_argnums=(3,))
def threshold_sweep(
    probs: jnp.ndarray,
    targets: jnp.ndarray,
    thresholds: jnp.ndarray,
    frames_in_1_sec: int,
):
    """Evaluate (f1_1sec, er_1sec) for every threshold in one vmapped device
    program. Returns arrays shaped like ``thresholds``."""
    p = _as_2d(probs)
    t = _as_2d(targets)

    def one(th):
        o = (p > th).astype(jnp.float32)
        return (
            f1_framewise(_block_max(o, frames_in_1_sec, "ceil"), _block_max(t, frames_in_1_sec, "ceil")),
            er_framewise(_block_max(o, frames_in_1_sec, "floor"), _block_max(t, frames_in_1_sec, "floor")),
        )

    return jax.vmap(one)(thresholds)


def best_threshold(probs, targets, thresholds, frames_in_1_sec: int):
    """Threshold minimizing segment ER (BASELINE config 4's sweep)."""
    f1s, ers = threshold_sweep(probs, targets, jnp.asarray(thresholds), frames_in_1_sec)
    i = jnp.argmin(ers)
    return {
        "threshold": jnp.asarray(thresholds)[i],
        "er": ers[i],
        "f1": f1s[i],
        "all_f1": f1s,
        "all_er": ers,
    }
