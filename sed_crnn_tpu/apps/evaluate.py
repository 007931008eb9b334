"""Evaluation CLI: full-test-split metrics + threshold sweep from a
checkpoint (new capability — the reference evaluates only on resampled
windows during training and has no standalone eval entry point).

  python -m sed_crnn_tpu.apps.evaluate --checkpoint best_fold1.npz \
      --preset timepooled-v2 --cache-dir cache/ --fold 1

Several checkpoints (e.g. the per-seed bests of a `sedtpu-train --runs N`
experiment) score each member individually (mean±std — the reference
README's "mean of 5 runs" aggregation at eval time) AND as a probability
ensemble (vmapped stacked-member forward, averaged sigmoids):

  python -m sed_crnn_tpu.apps.evaluate \
      --checkpoint fold1/seed*/best_fold1.npz --preset ... --cache-dir ...
"""

from __future__ import annotations

import argparse
import json

from sed_crnn_tpu.core import checkpoint as ckpt_io
from sed_crnn_tpu.core.config import get_preset
from sed_crnn_tpu.data import store
from sed_crnn_tpu.models import get_model
from sed_crnn_tpu.train.evaluate import evaluate_split


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True, nargs="+",
                   help="one checkpoint, or several for per-member mean±std "
                        "plus a probability-ensemble score")
    p.add_argument("--preset", default="timepooled-v2")
    p.add_argument("--cache-dir", required=True)
    p.add_argument("--fold", type=int, default=1)
    p.add_argument("--channel-tag", default="mon")
    p.add_argument("--split", default="val", choices=["val", "train"])
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument(
        "--median", type=int, default=0,
        help="odd width > 1 median-smooths the probability tracks before "
             "all thresholding (standard DCASE post-processing; 0 = off)",
    )
    p.add_argument("--event-matching", default="optimal",
                   choices=["optimal", "greedy"],
                   help="event-metric pairing: 'optimal' (maximum bipartite, "
                        "order-independent) or 'greedy' (sed_eval's exact "
                        "first-eligible-in-order pairing)")
    p.add_argument(
        "--data-parallel", action="store_true",
        help="shard the window axis over ALL local devices "
             "(`jax.sharding.Mesh`); identical results, multi-chip speed",
    )
    p.add_argument(
        "--dump-events",
        help="directory for the decoded ref_events.txt / est_events.txt "
             "(sed_eval interchange rows; with several checkpoints, the "
             "ensemble's events)",
    )
    p.add_argument("--out", help="write the JSON report here (default stdout)")
    args = p.parse_args(argv)

    from sed_crnn_tpu.core.runtime import enable_compilation_cache

    enable_compilation_cache()

    mesh = None
    if args.data_parallel:
        from sed_crnn_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()

    cfg = get_preset(args.preset)
    model = get_model(cfg.model)
    loaded = [ckpt_io.load_checkpoint(c) for c in args.checkpoint]
    fold = store.load_fold(args.cache_dir, args.fold, args.channel_tag)
    x, y = fold[f"{args.split}_x"], fold[f"{args.split}_y"]

    def run(params, state, ensemble=False, dump=False):
        return evaluate_split(
            model, params, state, x, y, cfg,
            batch_size=args.batch_size,
            event_matching=args.event_matching,
            mesh=mesh,
            ensemble=ensemble,
            median_filter=args.median,
            dump_events_dir=args.dump_events if dump else None,
        )

    if len(loaded) == 1:
        tree, meta = loaded[0]
        report = run(tree["params"], tree["model_state"], dump=True)
        report["checkpoint"] = args.checkpoint[0]
        report["checkpoint_epoch"] = meta.get("epoch")
    else:
        import numpy as np

        from sed_crnn_tpu.train.evaluate import stack_trees

        members = []
        for path, (tree, meta) in zip(args.checkpoint, loaded):
            r = run(tree["params"], tree["model_state"])
            members.append({
                "checkpoint": path,
                "checkpoint_epoch": meta.get("epoch"),
                "er_1s": r["er_1s"], "f1_1s": r["f1_1s"],
                "best_er_1s": r["best_er_1s"],
                "best_threshold": r["best_threshold"],
            })
        ens = run(
            stack_trees([t["params"] for t, _ in loaded]),
            stack_trees([t["model_state"] for t, _ in loaded]),
            ensemble=True,
            dump=True,
        )
        ers = [m["er_1s"] for m in members]
        f1s = [m["f1_1s"] for m in members]
        report = {
            "n_members": len(members),
            "members": members,
            "mean_er_1s": float(np.mean(ers)),
            "std_er_1s": float(np.std(ers)),
            "mean_f1_1s": float(np.mean(f1s)),
            "std_f1_1s": float(np.std(f1s)),
            "ensemble": ens,
        }
    report["fold"] = args.fold
    report["split"] = args.split

    text = json.dumps(report, indent=2)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
        print(f"wrote {args.out}")
    else:
        print(text)


if __name__ == "__main__":
    main()
