"""Streaming inference CLI: long recordings -> frame probabilities -> event
intervals, via chunked scan with carried GRU state (new capability; the
reference has no inference entry point at all).

  python -m sed_crnn_tpu.apps.infer --checkpoint best_fold1.npz \
      --preset timepooled-v2 --wav recording.wav --stats-from fold1-cache-dir
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from sed_crnn_tpu.core import checkpoint as ckpt_io
from sed_crnn_tpu.core.config import get_preset
from sed_crnn_tpu.data import store
from sed_crnn_tpu.data.rasterize import events_from_labels
from sed_crnn_tpu.data.wavio import decode_audio
from sed_crnn_tpu.models import get_model
from sed_crnn_tpu.models.streaming import stream_probabilities
from sed_crnn_tpu.ops import frontend


def _threshold_arg(threshold, n_classes: int):
    """One global float, or exactly one threshold per class (the tuned
    per-class operating points a `sedtpu-evaluate` report's
    ``per_class_sweep.thresholds`` records)."""
    if np.ndim(threshold) == 0:
        return float(threshold)
    arr = np.asarray(threshold, np.float32)
    if arr.shape != (n_classes,):
        raise ValueError(
            f"{arr.size} thresholds for {n_classes} classes — pass one "
            f"global threshold or exactly one per class"
        )
    return arr


def infer_file(
    wav_path: str,
    checkpoint,
    preset: str = "timepooled-v2",
    norm_stats=None,
    threshold=0.5,
    carry_backward: bool = False,
    lookahead: bool = False,
    log_floor: float = 1e-10,
    median: int = 0,
):
    """``log_floor`` clamps mel energies before the log: real recordings can
    contain exact digital silence, whose parity-mode log(0) = -inf features
    NaN every downstream probability. Serving defaults to a tiny floor;
    pass 0/None for the reference's strict no-epsilon semantics.

    ``checkpoint``: one path, or a list of paths — several checkpoints
    (e.g. the per-seed bests of `sedtpu-train --runs N`) stream as a
    probability ensemble: each member streams with its own carried state and
    the sigmoid probabilities are averaged (identical semantics to an
    exported ensemble artifact's streaming programs)."""
    import dataclasses

    cfg = get_preset(preset)
    if log_floor:
        cfg = cfg.replace(
            frontend=dataclasses.replace(cfg.frontend, log_floor=float(log_floor))
        )
    threshold = _threshold_arg(threshold, cfg.model.n_classes)
    model = get_model(cfg.model)
    paths = [checkpoint] if isinstance(checkpoint, str) else list(checkpoint)
    loaded = [ckpt_io.load_checkpoint(c) for c in paths]
    meta = loaded[0][1] if len(loaded) == 1 else {
        "members": [m for _, m in loaded]
    }

    pcm = decode_audio(wav_path, sr=cfg.frontend.sample_rate, mono=True)
    mel = frontend.extract(pcm, cfg.frontend)
    if norm_stats is not None:
        mean, scale = norm_stats
        mel = (mel - mean) / scale

    probs = np.mean(
        [
            stream_probabilities(
                model, tree["params"], tree["model_state"], mel,
                carry_backward, lookahead=lookahead,
            )
            for tree, _ in loaded
        ],
        axis=0,
    )
    if median > 1:
        from sed_crnn_tpu.ops.postprocess import median_smooth

        probs = median_smooth(probs, median)
    pool = cfg.model.seq_len_in // cfg.model.seq_len_out
    out_hop = cfg.frontend.hop_length * pool  # samples per output frame
    events = events_from_labels(
        probs, cfg.frontend.sample_rate, out_hop, threshold
    )
    return probs, events, meta


def stats_from_fold(
    cache_dir: str, fold_id: int, channel_tag: str = "mon", k_folds: int = 4
):
    """The fold's TRAIN-split normalization statistics, for serving.

    Preferred source: the fold pack's recorded ``arr_4``/``arr_5``
    (`data/store.py::load_fold_stats`) — the EXACT statistics training
    normalized with, valid for every pipeline (Decorte and DCASE alike).

    Legacy fallback (packs written by the reference, which records no
    stats): refit from the raw per-video features under the Decorte fold
    rule — sorted names, round-robin (`data/catalog.py`): fold ``k``'s test
    videos sit at sorted index ``i`` with ``i % k_folds == k - 1``. That
    rule is WRONG for DCASE caches (their folds follow the
    ``evaluation_setup`` lists), so multi-class per-file caches are refused
    rather than silently misfit. Returns (mean, scale) or None if the cache
    dir holds neither a stats-bearing pack nor per-video files."""
    import glob

    recorded = store.load_fold_stats(cache_dir, fold_id, channel_tag)
    if recorded is not None:
        return recorded

    files = sorted(glob.glob(os.path.join(cache_dir, f"*_{channel_tag}.npz")))
    fold_pack = os.path.basename(store.fold_path(cache_dir, fold_id, channel_tag))
    if not files:
        return None
    # DCASE caches share the per-file glob pattern but assign folds via
    # evaluation_setup lists; detect them by their multi-class labels.
    first_lbl = store.load_video_features(files[0])[1]
    if first_lbl.ndim == 2 and first_lbl.shape[1] > 1:
        raise ValueError(
            f"{cache_dir} holds multi-class per-file caches (DCASE-style), "
            f"whose fold membership follows the evaluation_setup lists — the "
            f"Decorte round-robin refit would compute WRONG statistics. "
            f"Re-pack the folds with this framework's feature app (the pack "
            f"{fold_pack} then records the exact train stats as arr_4/arr_5)."
        )
    train_files = [
        f for i, f in enumerate(files) if i % k_folds != (fold_id - 1) % k_folds
    ]
    import jax.numpy as jnp

    xs = [store.load_video_features(f)[0] for f in train_files]
    stats = frontend.fit_norm_stats(jnp.asarray(np.concatenate(xs, axis=0)))
    return np.asarray(stats.mean), np.asarray(stats.scale)


def infer_file_artifact(
    wav_path: str,
    artifact_path: str,
    threshold=None,
    log_floor: float = 1e-10,
    lookahead: bool = False,
    median: int = 0,
):
    """Serve from an AOT artifact (`apps/export.py`): the artifact's meta
    carries the frontend parameters and its programs carry the weights and
    (when exported with ``--stats-from``) the fold's normalization — the
    wav file and the artifact are the only inputs.

    ``threshold=None`` uses the artifact's recorded ``default_threshold``
    (the tuned operating points `sedtpu-export --threshold` bakes in),
    falling back to 0.5 when the artifact records none."""
    import dataclasses

    from sed_crnn_tpu.core.config import FrontendConfig
    from sed_crnn_tpu.models.export import ServingArtifact

    art = ServingArtifact.load(artifact_path)
    if threshold is None:
        threshold = art.meta.get("default_threshold")
        if threshold is None:
            threshold = 0.5
    threshold = _threshold_arg(threshold, int(art.meta["n_classes"]))
    fcfg = FrontendConfig(**art.meta["frontend"])
    if log_floor:
        fcfg = dataclasses.replace(fcfg, log_floor=float(log_floor))

    pcm = decode_audio(wav_path, sr=fcfg.sample_rate, mono=True)
    mel = frontend.extract(pcm, fcfg)
    probs = art.stream(mel, lookahead=lookahead)
    if median > 1:
        from sed_crnn_tpu.ops.postprocess import median_smooth

        probs = median_smooth(probs, median)

    pool = int(art.meta["seq_len_in"]) // int(art.meta["seq_len_out"])
    out_hop = fcfg.hop_length * pool
    events = events_from_labels(probs, fcfg.sample_rate, out_hop, threshold)
    return probs, events, art.meta


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--wav", required=True)
    p.add_argument("--checkpoint", nargs="+",
                   help="npz checkpoint (with --preset); several paths "
                        "stream as a probability ensemble")
    p.add_argument(
        "--artifact",
        help="AOT serving artifact (.sedart) from sedtpu-export; replaces "
        "--checkpoint/--preset/--stats-from",
    )
    p.add_argument("--preset", default="timepooled-v2")
    p.add_argument(
        "--threshold", type=float, nargs="+", default=None,
        help="binarization threshold: one global value, or one per class "
             "(the per_class_sweep.thresholds of a sedtpu-evaluate report). "
             "Default: the artifact's baked-in default_threshold when "
             "serving with --artifact, else 0.5",
    )
    p.add_argument(
        "--median", type=int, default=0,
        help="odd width > 1 median-smooths the probability tracks before "
             "event decoding (standard DCASE post-processing; 0 = off)",
    )
    p.add_argument("--stats-from", help="cache dir with per-video npz for norm stats")
    p.add_argument("--fold", type=int, default=1)
    p.add_argument("--carry-backward", action="store_true")
    p.add_argument(
        "--lookahead", action="store_true",
        help="emit each chunk one chunk late with bounded bidirectional "
             "right context (latency = seq_len_in frames of audio)",
    )
    p.add_argument(
        "--log-floor", type=float, default=1e-10,
        help="mel-energy floor before the log (0 = reference's strict "
             "no-epsilon semantics; exact digital silence then yields -inf "
             "features and NaN probabilities)",
    )
    p.add_argument(
        "--format", choices=("json", "dcase"), default="json",
        help="'dcase' writes the tab-separated event-list rows "
             "(onset<TAB>offset<TAB>label) the DCASE/sed_eval ecosystem "
             "consumes (scoreable with sedtpu-score-events)",
    )
    p.add_argument(
        "--class-names",
        help="comma-separated event labels for --format dcase (default: "
             "'hit' for 1-class models, the DCASE 2017 street classes for "
             "6-class models, indices otherwise)",
    )
    p.add_argument("--out", help="write events here (default stdout)")
    args = p.parse_args(argv)

    from sed_crnn_tpu.core.runtime import enable_compilation_cache

    enable_compilation_cache()

    if bool(args.checkpoint) == bool(args.artifact):
        p.error("pass exactly one of --checkpoint or --artifact")
    threshold = None
    if args.threshold is not None:
        threshold = (
            args.threshold[0] if len(args.threshold) == 1
            else np.asarray(args.threshold, np.float32)
        )

    if args.artifact:
        probs, events, meta = infer_file_artifact(
            args.wav, args.artifact, threshold, args.log_floor,
            args.lookahead, args.median,
        )
    else:
        stats = (
            stats_from_fold(args.stats_from, args.fold)
            if args.stats_from
            else None
        )
        probs, events, meta = infer_file(
            args.wav, args.checkpoint, args.preset, stats,
            0.5 if threshold is None else threshold,
            args.carry_backward, args.lookahead, args.log_floor,
            args.median,
        )
    if args.format == "dcase":
        from sed_crnn_tpu.data.eventio import (
            default_class_names,
            format_event_list,
        )

        names = (
            tuple(args.class_names.split(","))
            if args.class_names
            else default_class_names(int(probs.shape[1]))
        )
        if len(names) != int(probs.shape[1]):
            p.error(f"{len(names)} class names for {probs.shape[1]} classes")
        text = format_event_list(events, names)
    else:
        payload = {
            "wav": args.wav,
            "checkpoint_epoch": meta.get("epoch"),
            "ensemble_members": len(meta["members"]) if "members" in meta else (
                meta.get("ensemble_members") or None
            ),
            "n_output_frames": int(probs.shape[0]),
            "events": [
                {"start_s": round(s, 3), "end_s": round(e, 3), "class": c}
                for s, e, c in events
            ],
        }
        text = json.dumps(payload, indent=2)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
        print(f"wrote {args.out} ({len(events)} events)")
    else:
        print(text)


if __name__ == "__main__":
    main()
