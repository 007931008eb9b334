"""Torch-checkpoint migration CLI: reference-trained weights -> framework
checkpoint.

Converts a torch/Lightning checkpoint of the reference v1/v2 CRNNs
(`sed.py:82-112`, `crnn_lightning.py:41-73`) into this framework's npz
checkpoint format, ready for `apps/infer.py`, `apps/evaluate.py`, or
resumed fine-tuning with `apps/train.py --resume`:

  python -m sed_crnn_tpu.apps.import_torch \
      --torch-ckpt best_model.ckpt --preset timepooled-v2 --out best_fold1.npz
"""

from __future__ import annotations

import argparse

import jax

from sed_crnn_tpu.core import checkpoint as ckpt_io
from sed_crnn_tpu.core.config import get_preset
from sed_crnn_tpu.models import count_params, get_model
from sed_crnn_tpu.models.transplant import load_torch_checkpoint
from sed_crnn_tpu.train.optim import Adam


def import_checkpoint(torch_ckpt: str, preset: str, out_path: str) -> str:
    cfg = get_preset(preset)
    params, model_state = load_torch_checkpoint(torch_ckpt, cfg.model)
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
    ap.add_argument("--torch-ckpt", required=True, help=".pt/.ckpt file")
    ap.add_argument("--preset", default="timepooled-v2",
                    help="timepooled-v1 | timepooled-v2 (sednet presets use "
                         "the keras GRU cell; torch weights cannot map onto them)")
    ap.add_argument("--out", required=True, help="output .npz checkpoint path")
    args = ap.parse_args(argv)
    path = import_checkpoint(args.torch_ckpt, args.preset, args.out)
    cfg = get_preset(args.preset)
    model = get_model(cfg.model)
    print(f"imported {args.torch_ckpt} -> {path} "
          f"(preset {args.preset}, {model.flat_dim}-dim trunk output)")


if __name__ == "__main__":
    main()
