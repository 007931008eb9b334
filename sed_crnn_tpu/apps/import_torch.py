"""Checkpoint migration CLI: reference-lineage weights -> framework
checkpoint.

Converts either a torch/Lightning checkpoint of the reference v1/v2 CRNNs
(`sed.py:82-112`, `crnn_lightning.py:41-73`) or a keras SEDnet checkpoint
(the original lineage, keras 2.2.4 `.h5` or modern `.keras` — reference
`README.md:44`, `requirements.txt:1`) into this framework's npz checkpoint
format, ready for `apps/infer.py`, `apps/evaluate.py`, or resumed
fine-tuning with `apps/train.py --resume`:

  python -m sed_crnn_tpu.apps.import_torch \
      --torch-ckpt best_model.ckpt --preset timepooled-v2 --out best_fold1.npz
  python -m sed_crnn_tpu.apps.import_torch \
      --keras-ckpt sednet_best.h5 --preset sednet-dcase --out best_fold1.npz
"""

from __future__ import annotations

import argparse

import jax

from sed_crnn_tpu.core import checkpoint as ckpt_io
from sed_crnn_tpu.core.config import get_preset
from sed_crnn_tpu.models import count_params, get_model
from sed_crnn_tpu.models.transplant import (
    load_keras_checkpoint,
    load_torch_checkpoint,
)
from sed_crnn_tpu.train.optim import Adam


def import_checkpoint(
    torch_ckpt: str, preset: str, out_path: str, source: str = "torch"
) -> str:
    cfg = get_preset(preset)
    loader = load_keras_checkpoint if source == "keras" else load_torch_checkpoint
    params, model_state = loader(torch_ckpt, cfg.model)
    # Fresh optimizer moments: the imported model can be served immediately
    # or fine-tuned from step 0 (torch Adam moments are not transferable
    # across optimizer implementations bit-for-bit, so none are imported).
    adam = Adam(
        learning_rate=cfg.train.learning_rate,
        weight_decay=cfg.train.weight_decay,
        grad_clip_norm=cfg.train.grad_clip_norm,
    )
    opt = adam.init(params)
    tree = {
        "params": params,
        "model_state": model_state,
        "opt_state": {"step": opt.step, "mu": opt.mu, "nu": opt.nu},
        "lr_scale": jax.numpy.ones((), "float32"),
    }
    meta = {
        "imported_from": torch_ckpt,
        "preset": preset,
        "epoch": 0,
        "n_params": count_params(params),
    }
    return ckpt_io.save_checkpoint(out_path, tree, meta)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--torch-ckpt", help=".pt/.ckpt file (timepooled presets)")
    src.add_argument("--keras-ckpt",
                     help=".h5/.keras SEDnet file (sednet presets; keras-2 "
                          "legacy HDF5 and modern keras files both work)")
    ap.add_argument("--preset", default="timepooled-v2",
                    help="timepooled-v1 | timepooled-v2 for torch sources; "
                         "sednet-dcase-keras (exact keras-2.2.4 hard_sigmoid "
                         "cell) or sednet-dcase[-binaural] for keras sources")
    ap.add_argument("--out", required=True, help="output .npz checkpoint path")
    args = ap.parse_args(argv)
    source = "keras" if args.keras_ckpt else "torch"
    ckpt = args.keras_ckpt or args.torch_ckpt
    path = import_checkpoint(ckpt, args.preset, args.out, source)
    cfg = get_preset(args.preset)
    model = get_model(cfg.model)
    print(f"imported {ckpt} -> {path} "
          f"(preset {args.preset}, {model.flat_dim}-dim trunk output)")


if __name__ == "__main__":
    main()
