"""A/B the SEDnet conv trunk dtype on TPU: f32 (preset default) vs bf16.

profile_sednet.py showed the flagship step is conv-bound (model fwd+bwd
~20.4 ms with the Pallas GRU, of which the GRU stack is ~2.9 ms). The v1
bench already runs a bfloat16 conv trunk — the TPU analogue of the
reference Lightning stack's `torch.set_float32_matmul_precision('medium')`
— with measured f32-matching loss trajectories. This script makes the same
case for the SEDnet preset:

  1. steady-state train-epoch ms/step, f32 vs bf16 trunk (pallas GRU both);
  2. training dynamics: 6 epochs x 50 steps from identical init/seeds,
     per-epoch train loss and a deterministic full-split eval sweep
     (segment ER/F1) under each dtype.

Run (fresh process, real TPU, run_in_background):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/sednet_bf16_ab.py
"""

import dataclasses
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from sed_crnn_tpu.core.runtime import use_fast_prng

    use_fast_prng()
    log(f"device: {jax.devices()[0]}")

    from sed_crnn_tpu.core.config import get_preset
    from sed_crnn_tpu.data.rasterize import rasterize_events
    from sed_crnn_tpu.models import get_model
    from sed_crnn_tpu.train.loop import Trainer, make_samplers

    exp = get_preset("sednet-dcase")
    FRAMES_PER_SEC = 44100 / 1024.0
    frames_s = 60_000
    rng = np.random.default_rng(1)
    ev = [
        (t, t + 0.4, int(t) % 6)
        for t in np.arange(3.0, frames_s / FRAMES_PER_SEC - 5, 4.0)
    ]
    lab_s = rasterize_events(
        [(s, e) for s, e, _ in ev], frames_s, 44100, 1024,
        n_classes=6, class_ids=[c for _, _, c in ev],
    )
    # plant a weak class signature so training has something to learn and
    # the two dtypes' ER trajectories are comparable on a real task
    mel_s = rng.standard_normal((frames_s, 40)).astype(np.float32)
    for c in range(6):
        mel_s[:, c * 6 : c * 6 + 3] += 1.5 * lab_s[:, c : c + 1]
    fold_s = {
        "train_x": mel_s[:45000], "train_y": lab_s[:45000],
        "val_x": mel_s[45000:], "val_y": lab_s[45000:],
    }
    ts_s, vs_s = make_samplers(exp, fold_s)

    steps, epochs = 50, 6
    out = {}
    for dtype in ("float32", "bfloat16"):
        mcfg = dataclasses.replace(exp.model, compute_dtype=dtype)
        trainer = Trainer(get_model(mcfg), exp.train, ts_s, vs_s)
        state = trainer.init_state(jax.random.PRNGKey(0))
        losses, ers, f1s = [], [], []
        t_warm = None
        for e in range(epochs):
            t0 = time.perf_counter()
            state, sc = trainer.train_epoch(state, jax.random.PRNGKey(100 + e), steps)
            sweep = trainer.eval_sweep(state)
            loss = float(sc["loss"])
            er = float(sweep["er_overall_1sec"])
            f1 = float(sweep["f1_overall_1sec"])
            dt = time.perf_counter() - t0
            if e == 1:
                t_warm = dt
            losses.append(loss)
            ers.append(er)
            f1s.append(f1)
            log(f"[{dtype}] epoch {e}: loss {loss:.4f} er1s {er:.3f} "
                f"f1_1s {f1:.3f} ({dt:.1f}s)")
        # steady-state timing: chained epochs, one host fetch
        chain = 3
        t0 = time.perf_counter()
        for r in range(chain):
            state, sc = trainer.train_epoch(state, jax.random.PRNGKey(200 + r), steps)
        _ = float(sc["loss"] + jnp.sum(state.params["head"][0]["b"]))
        per_step = (time.perf_counter() - t0) / (chain * steps)
        log(f"[{dtype}] steady-state: {per_step*1e3:.2f} ms/step")
        out[dtype] = {
            "ms_per_step": round(per_step * 1e3, 3),
            "loss": [round(v, 5) for v in losses],
            "er_1s": [round(v, 4) for v in ers],
            "f1_1s": [round(v, 4) for v in f1s],
        }

    a, b = out["float32"], out["bfloat16"]
    out["delta"] = {
        "speedup": round(a["ms_per_step"] / b["ms_per_step"], 3),
        "final_er_diff": round(abs(a["er_1s"][-1] - b["er_1s"][-1]), 4),
        "final_f1_diff": round(abs(a["f1_1s"][-1] - b["f1_1s"][-1]), 4),
        "max_loss_rel_diff": round(
            max(
                abs(x - y) / max(abs(x), 1e-9)
                for x, y in zip(a["loss"], b["loss"])
            ),
            4,
        ),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
