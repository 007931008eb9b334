"""A/B the SEDnet epoch-program compile cost: lax.cond step skipping vs
where-masked state commit vs no skip machinery at all.

Round-2 shipped shared-compile epochs whose padded steps were skipped by
wrapping the ENTIRE train step in `lax.cond` (`train/loop.py`); the 256-frame
SEDnet program then took ~8 min to compile on the TPU (docs/ROADMAP.md).
This script measures, on the real chip, cold-compile + warm-epoch time for
the three pad modes at the flagship shape (sednet-dcase: 256-frame windows,
conv 128, biGRU 32x2, batch 128), writing one JSON line per variant.

Run (fresh process, real TPU — do NOT set JAX_PLATFORMS=cpu):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/compile_cost.py
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from sed_crnn_tpu.core.config import get_preset
    from sed_crnn_tpu.data import rasterize
    from sed_crnn_tpu.models import get_model
    from sed_crnn_tpu.train.loop import _epoch_program, make_samplers

    log(f"device: {jax.devices()[0]}")
    cfg = get_preset("sednet-dcase")
    frames = 40_000
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((frames, 40)).astype(np.float32)
    events = [(t, t + 0.4, int(t) % 6) for t in np.arange(3.0, frames / 43 - 5, 4.0)]
    lab = rasterize.rasterize_events(
        [(s, e) for s, e, _ in events], frames, 44100, 1024,
        n_classes=6, class_ids=[c for _, _, c in events],
    )
    fold = {
        "train_x": mel, "train_y": lab,
        "val_x": mel[:12_000], "val_y": lab[:12_000],
    }
    train_sampler, _ = make_samplers(cfg, fold)
    model = get_model(cfg.model)

    from sed_crnn_tpu.train.loop import Trainer

    trainer = Trainer(model, cfg.train, train_sampler, train_sampler)
    state = trainer.init_state(jax.random.PRNGKey(0))
    n_steps_max = 2

    results = {}
    for variant in ("static", "mask", "cond"):
        static_full = variant == "static"
        pad_mode = "mask" if variant == "static" else variant
        fn = _epoch_program(
            model, cfg.train, train_sampler.spec, n_steps_max, "train",
            None, static_full, pad_mode,
        )
        t0 = time.time()
        st2, scores = fn(state, jax.random.PRNGKey(1), train_sampler.data,
                         jnp.int32(n_steps_max))
        cold = time.time() - t0
        loss_cold = float(scores["loss"])  # force materialization
        t0 = time.time()
        st3, scores = fn(st2, jax.random.PRNGKey(2), train_sampler.data,
                         jnp.int32(n_steps_max))
        _ = float(scores["loss"])
        warm = time.time() - t0
        results[variant] = {
            "cold_compile_plus_run_sec": round(cold, 1),
            "warm_epoch_sec": round(warm, 3),
            "loss": round(loss_cold, 5),
        }
        log(f"{variant}: cold {cold:.1f}s warm {warm*1e3:.0f}ms loss {loss_cold:.5f}")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
