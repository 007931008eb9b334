"""Evaluation CLI: full-test-split metrics + threshold sweep from a
checkpoint (new capability — the reference evaluates only on resampled
windows during training and has no standalone eval entry point).

  python -m sed_crnn_tpu.apps.evaluate --checkpoint best_fold1.npz \
      --preset timepooled-v2 --cache-dir cache/ --fold 1
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
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--preset", default="timepooled-v2")
    p.add_argument("--cache-dir", required=True)
    p.add_argument("--fold", type=int, default=1)
    p.add_argument("--channel-tag", default="mon")
    p.add_argument("--split", default="val", choices=["val", "train"])
    p.add_argument("--batch-size", type=int, default=256)
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
    p.add_argument("--out", help="write the JSON report here (default stdout)")
    args = p.parse_args(argv)

    mesh = None
    if args.data_parallel:
        from sed_crnn_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()

    cfg = get_preset(args.preset)
    model = get_model(cfg.model)
    tree, meta = ckpt_io.load_checkpoint(args.checkpoint)
    fold = store.load_fold(args.cache_dir, args.fold, args.channel_tag)

    report = evaluate_split(
        model,
        tree["params"],
        tree["model_state"],
        fold[f"{args.split}_x"],
        fold[f"{args.split}_y"],
        cfg,
        batch_size=args.batch_size,
        event_matching=args.event_matching,
        mesh=mesh,
    )
    report["checkpoint"] = args.checkpoint
    report["checkpoint_epoch"] = meta.get("epoch")
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
