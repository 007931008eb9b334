"""Export a trained checkpoint as a self-contained AOT serving artifact.

  python -m sed_crnn_tpu.apps.export --checkpoint best_fold1.npz \
      --preset timepooled-v1 --stats-from /path/to/cache --fold 1 \
      --out model.sedart

The artifact bundles multi-platform (cpu+tpu) StableHLO programs with the
weights and the fold's train-split normalization statistics baked in; a
serving host loads it with `models/export.py::ServingArtifact.load` and
needs no framework code or checkpoint (new capability — the reference has
no serving/export path at all, its entry points only train).
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True, nargs="+",
                   help="npz checkpoint path; several paths (e.g. the "
                        "per-seed bests of sedtpu-train --runs N) export "
                        "their probability ensemble as one artifact")
    p.add_argument("--preset", default="timepooled-v1")
    p.add_argument("--out", required=True, help="output artifact path (.sedart)")
    p.add_argument(
        "--stats-from",
        default=None,
        help="feature-cache dir; folds train-split norm stats into the "
        "artifact (recommended — serving then takes RAW log-mel features)",
    )
    p.add_argument("--fold", type=int, default=1)
    p.add_argument("--channel-tag", default="mon")
    p.add_argument(
        "--platforms",
        default="cpu,tpu",
        help="comma-separated lowering platforms (default cpu,tpu)",
    )
    p.add_argument(
        "--compute-dtype",
        default=None,
        help="override the activation dtype for serving (e.g. bfloat16 — "
        "the measured-faster trunk treatment on TPU; recurrence stays f32)",
    )
    p.add_argument(
        "--format",
        choices=("sedart", "tf"),
        default="sedart",
        help="sedart: StableHLO zip artifact (windowed + streaming); "
        "tf: TensorFlow SavedModel directory (windowed forward only, for "
        "TF Serving)",
    )
    p.add_argument(
        "--threshold", type=float, nargs="+", default=None,
        help="bake a default binarization threshold into the artifact: one "
             "global value, or one per class (a sedtpu-evaluate report's "
             "per_class_sweep.thresholds) — sedtpu-infer --artifact then "
             "uses it automatically (sedart format only; TF Serving "
             "consumers apply their own decode)",
    )
    args = p.parse_args(argv)

    from sed_crnn_tpu.core.runtime import enable_compilation_cache

    enable_compilation_cache()
    default_threshold = None
    if args.threshold is not None:
        default_threshold = (
            args.threshold[0] if len(args.threshold) == 1 else args.threshold
        )

    from sed_crnn_tpu.core import checkpoint as ckpt_io
    from sed_crnn_tpu.core.config import get_preset
    from sed_crnn_tpu.models.export import export_serving, export_tf_savedmodel

    cfg = get_preset(args.preset)
    loaded = [ckpt_io.load_checkpoint(c) for c in args.checkpoint]
    n_members = len(loaded) if len(loaded) > 1 else 0
    if n_members:
        from sed_crnn_tpu.train.evaluate import stack_trees

        params = stack_trees([t["params"] for t, _ in loaded])
        state = stack_trees([t["model_state"] for t, _ in loaded])
        meta = {"members": [m for _, m in loaded]}
    else:
        tree, meta = loaded[0]
        params, state = tree["params"], tree["model_state"]

    norm_stats = None
    if args.stats_from:
        from sed_crnn_tpu.apps.infer import stats_from_fold

        norm_stats = stats_from_fold(
            args.stats_from, args.fold, channel_tag=args.channel_tag
        )
        if norm_stats is None:
            p.error(
                f"--stats-from {args.stats_from}: no fold pack or per-video "
                f"features for fold {args.fold} (tag {args.channel_tag!r}) — "
                f"refusing to export without the requested statistics"
            )

    if args.format == "tf":
        if default_threshold is not None:
            p.error("--threshold applies to the sedart format only — TF "
                    "Serving consumers apply their own event decode")
        export_tf_savedmodel(
            cfg, params, state, args.out, norm_stats=norm_stats,
            compute_dtype=args.compute_dtype, ensemble_members=n_members,
        )
        print(
            json.dumps(
                {
                    "artifact": args.out,
                    "format": "tf_saved_model",
                    "norm_folded": norm_stats is not None,
                    "ensemble_members": n_members,
                    "checkpoint_meta": meta,
                }
            )
        )
        return

    artifact = export_serving(
        cfg,
        params,
        state,
        norm_stats=norm_stats,
        platforms=tuple(s.strip() for s in args.platforms.split(",") if s.strip()),
        preset=args.preset,
        compute_dtype=args.compute_dtype,
        ensemble_members=n_members,
        default_threshold=default_threshold,
    )
    artifact.save(args.out)
    print(
        json.dumps(
            {
                "artifact": args.out,
                "format": "sedart",
                "bytes": os.path.getsize(args.out),
                "platforms": artifact.meta["platforms"],
                "norm_folded": artifact.meta["norm_folded"],
                "default_threshold": artifact.meta["default_threshold"],
                "ensemble_members": n_members,
                "checkpoint_meta": meta,
            }
        )
    )


if __name__ == "__main__":
    main()
