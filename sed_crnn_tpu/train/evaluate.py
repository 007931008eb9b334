"""Full-split jitted evaluation + threshold sweep (BASELINE config 4).

Unlike training-time validation (which mirrors the reference's balanced
*resampling* of the val split), this evaluates the model over the ENTIRE
split, sequentially windowed with `split_in_seqs` semantics (reference
`utils.py:28-41`: truncate to a window multiple, no overlap), then sweeps
binarization thresholds on-device and reports segment ER/F1 per threshold
plus the best-ER operating point. One device program end to end: batched
forward via `lax.map`, vmapped sweep, scalar metrics out.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sed_crnn_tpu.core.config import ExperimentConfig
from sed_crnn_tpu.models.crnn import CRNN
from sed_crnn_tpu.nn.layers import Ctx
from sed_crnn_tpu.ops import metrics as metrics_ops

DEFAULT_THRESHOLDS = np.round(np.arange(0.05, 0.96, 0.05), 3).astype(np.float32)


def window_split(
    x: np.ndarray, y: np.ndarray, seq_len_in: int, seq_len_out: int
):
    """Full-split sequential windows: (frames, F) -> (N, T, F) and pooled
    labels (N, T_out, C), truncating the ragged tail like the reference."""
    n = (x.shape[0] // seq_len_in) * seq_len_in
    xw = x[:n].reshape(-1, seq_len_in, x.shape[1])
    pool = seq_len_in // seq_len_out
    yw = y[:n].reshape(-1, seq_len_out, pool, y.shape[1]).max(axis=2)
    return xw, yw


def stack_trees(trees):
    """Stack N pytrees of identical structure along a new leading axis —
    the member axis for `evaluate_split(..., ensemble=True)`."""
    if len(trees) < 1:
        raise ValueError("need at least one tree")
    return jax.tree.map(lambda *ls: jnp.stack([jnp.asarray(l) for l in ls]), *trees)


@partial(jax.jit, static_argnums=(0, 4, 5))
def _forward_all(model: CRNN, params, state, xw, batch_size: int,
                 ensemble: bool = False):
    """Probabilities for every window, batched via lax.map; the caller trims
    padded tail windows from the result. With ``ensemble``, params/state
    carry a leading member axis: each batch runs a vmapped forward over the
    members and the sigmoid probabilities are averaged (the standard
    probability-ensemble of the N runs the reference averages by hand)."""
    n = xw.shape[0]
    n_batches = n // batch_size
    xb = xw[: n_batches * batch_size].reshape(n_batches, batch_size, *xw.shape[1:])

    def fwd(batch):
        def one(p, s):
            logits, _, _ = model.apply(p, s, batch, Ctx(train=False))
            return jax.nn.sigmoid(logits)

        if ensemble:
            return jnp.mean(jax.vmap(one)(params, state), axis=0)
        return one(params, state)

    probs = jax.lax.map(fwd, xb)
    return probs.reshape(n_batches * batch_size, *probs.shape[2:])


def _forward_all_dp(
    model: CRNN, params, state, xw, batch_size: int, mesh, axis_name: str,
    ensemble: bool = False,
):
    """Mesh-sharded variant: the batched-window axis splits across the mesh,
    each device `lax.map`s its share, XLA gathers the probabilities. Caller
    guarantees n_batches % n_devices == 0 (see `evaluate_split` padding).
    ``ensemble`` as in `_forward_all` (members replicated on every device)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n = xw.shape[0]
    n_batches = n // batch_size
    xb = xw[: n_batches * batch_size].reshape(
        n_batches, batch_size, *xw.shape[1:]
    )

    def fwd_shard(p, s, xs):
        def fwd(batch):
            def one(pp, ss):
                logits, _, _ = model.apply(pp, ss, batch, Ctx(train=False))
                return jax.nn.sigmoid(logits)

            if ensemble:
                return jnp.mean(jax.vmap(one)(p, s), axis=0)
            return one(p, s)

        return jax.lax.map(fwd, xs)

    sharded = jax.jit(
        shard_map(
            fwd_shard,
            mesh=mesh,
            in_specs=(P(), P(), P(axis_name)),
            out_specs=P(axis_name),
            check_vma=False,
        )
    )
    probs = sharded(params, state, xb)
    return probs.reshape(n_batches * batch_size, *probs.shape[2:])


def evaluate_split(
    model: CRNN,
    params,
    state,
    x: np.ndarray,
    y: np.ndarray,
    cfg: ExperimentConfig,
    thresholds: Optional[np.ndarray] = None,
    batch_size: int = 256,
    event_matching: str = "optimal",
    mesh=None,
    axis_name: Optional[str] = None,
    ensemble: bool = False,
    median_filter: int = 0,
    dump_events_dir: Optional[str] = None,
) -> Dict:
    """Evaluate one (features, labels) split end to end. Returns metrics at
    the configured threshold plus the full sweep and best-ER threshold.
    ``event_matching``: "optimal" or "greedy" (sed_eval's exact pairing) for
    the event-based scores — see `ops/event_metrics.py`.
    ``mesh`` shards the window axis across the devices of a 1-D
    `jax.sharding.Mesh` (`axis_name` defaults to the data axis) — the
    multi-chip path for large-split scoring; results are identical to the
    single-device program.
    ``ensemble``: params/state are N stacked member trees (`stack_trees`);
    the report scores the mean of the members' sigmoid probabilities.
    ``median_filter``: odd width > 1 median-smooths the probability tracks
    before ALL thresholding (base scores, sweeps, event decode) — the
    standard DCASE post-processing step (`ops/postprocess.py`).
    ``dump_events_dir``: also write the decoded reference/estimated event
    lists there (`ref_events.txt` / `est_events.txt`, sed_eval interchange
    rows) for external cross-scoring."""
    m = cfg.model
    t = cfg.train
    thresholds = DEFAULT_THRESHOLDS if thresholds is None else np.asarray(thresholds)

    xw, yw = window_split(x, y, m.seq_len_in, m.seq_len_out)
    n = xw.shape[0]
    if n == 0:
        raise ValueError(f"split has {x.shape[0]} frames < one {m.seq_len_in}-frame window")
    # Pad to a whole number of batches — and, when sharded, to a batch count
    # divisible by the mesh size so every device maps an equal share.
    if mesh is not None:
        from sed_crnn_tpu.parallel.mesh import DATA_AXIS

        axis_name = axis_name or DATA_AXIS
        chunk = batch_size * mesh.shape[axis_name]
    else:
        chunk = batch_size
    pad = (-n) % chunk
    if pad:
        xw = np.concatenate([xw, np.zeros((pad, *xw.shape[1:]), xw.dtype)], axis=0)

    if mesh is not None:
        probs = _forward_all_dp(
            model, params, state, jnp.asarray(xw), batch_size, mesh, axis_name,
            ensemble,
        )
    else:
        probs = _forward_all(
            model, params, state, jnp.asarray(xw), batch_size, ensemble
        )
    probs = probs[:n]
    flat_p = probs.reshape(-1, probs.shape[-1])
    flat_y = jnp.asarray(yw.reshape(-1, yw.shape[-1]))
    if median_filter > 1:
        # Windows are sequential and non-overlapping, so the flattened roll
        # is time-contiguous and the running median crosses window
        # boundaries correctly.
        from sed_crnn_tpu.ops.postprocess import median_smooth

        flat_p = median_smooth(flat_p, median_filter)

    base = metrics_ops.all_scores(
        (flat_p > t.threshold).astype(jnp.float32), flat_y, t.frames_in_1_sec
    )
    sweep = metrics_ops.best_threshold(flat_p, flat_y, thresholds, t.frames_in_1_sec)

    # Event-based scores (host-side over decoded events; the windowed roll is
    # time-ordered, with window-boundary truncation gaps ignored).
    from sed_crnn_tpu.ops.event_metrics import (
        class_wise_event_scores,
        event_scores,
        events_from_roll,
    )

    pool = m.seq_len_in // m.seq_len_out
    frame_hop_s = cfg.frontend.hop_length * pool / cfg.frontend.sample_rate
    sys_ev = events_from_roll(np.asarray(flat_p), frame_hop_s, t.threshold)
    ref_ev = events_from_roll(np.asarray(flat_y), frame_hop_s, 0.5)
    ev = event_scores(ref_ev, sys_ev, matching=event_matching)
    cw_ev = class_wise_event_scores(
        ref_ev, sys_ev, n_classes=int(flat_y.shape[-1]), matching=event_matching
    )
    class_wise_event = [
        {
            "f1_event": float(s["f1_event"]),
            # no reference events -> ER is 0/0; mask instead of NaN in JSON
            "er_event": float(s["er_event"]) if s["n_ref"] else None,
            "n_ref": s["n_ref"],
            "n_sys": s["n_sys"],
        }
        for _, s in sorted(cw_ev.items())
    ]

    if dump_events_dir is not None:
        # The decoded lists in the sed_eval/DCASE interchange format, for
        # external cross-scoring (e.g. the sed_eval package itself, or
        # `sedtpu-score-events`).
        from sed_crnn_tpu.data.eventio import default_class_names, write_event_list

        names = default_class_names(int(flat_y.shape[-1]))
        os.makedirs(dump_events_dir, exist_ok=True)
        write_event_list(
            os.path.join(dump_events_dir, "ref_events.txt"), ref_ev, names
        )
        write_event_list(
            os.path.join(dump_events_dir, "est_events.txt"), sys_ev, names
        )

    # Absent classes are masked to None instead of NaN/inf leaking into JSON.
    class_wise = metrics_ops.class_wise_report(
        (flat_p > t.threshold).astype(jnp.float32), flat_y, t.frames_in_1_sec
    )

    # Multi-class splits additionally report the per-class operating point
    # (each class's threshold tuned independently on this split — the
    # standard DCASE refinement; see `ops/metrics.py::best_per_class_thresholds`).
    per_class_sweep = None
    if flat_y.shape[-1] > 1:
        pc = metrics_ops.best_per_class_thresholds(
            flat_p, flat_y, thresholds, t.frames_in_1_sec
        )
        present = np.asarray(pc["class_present"])
        per_class_sweep = {
            "thresholds": [float(v) for v in np.asarray(pc["thresholds"])],
            "er_1s": float(pc["er"]),
            "f1_1s": float(pc["f1"]),
            "class_er_1s": [
                float(v) if p else None
                for v, p in zip(np.asarray(pc["class_er"]), present)
            ],
            "class_f1_1s": [
                float(v) if p else None
                for v, p in zip(np.asarray(pc["class_f1"]), present)
            ],
        }

    return {
        **({"per_class_sweep": per_class_sweep} if per_class_sweep else {}),
        "er_event": ev["er_event"],
        "f1_event": ev["f1_event"],
        "class_wise": class_wise,
        "class_wise_event": class_wise_event,
        "n_windows": n,
        "median_filter": int(median_filter),
        "confusion": {
            k: int(base[k]) for k in ("tn", "fp", "fn", "tp")
        },
        "threshold": float(t.threshold),
        "er_1s": float(base["er_overall_1sec"]),
        "f1_1s": float(base["f1_overall_1sec"]),
        "er_frame": float(base["er_frame"]),
        "f1_frame": float(base["f1_frame"]),
        "best_threshold": float(sweep["threshold"]),
        "best_er_1s": float(sweep["er"]),
        "best_f1_1s": float(sweep["f1"]),
        "sweep": {
            "thresholds": [float(v) for v in thresholds],
            "er_1s": [float(v) for v in sweep["all_er"]],
            "f1_1s": [float(v) for v in sweep["all_f1"]],
        },
    }
