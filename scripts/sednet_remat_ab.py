"""A/B: `jax.checkpoint` rematerialization of the SEDnet conv trunk.

The flagship backward pass holds three (B, 40, 256, 128) bf16 activation
tensors (~100 MB each at B=128) across the GRU/head backward; remat trades
~1/3 extra trunk FLOPs for dropping them. This measures the flagship train
epoch with `ModelConfig.remat_trunk` off vs on, at the standard batch (128)
and at a pressure batch (512), so docs/ROADMAP.md records a decision with
data instead of a guess.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/sednet_remat_ab.py
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

FRAMES_PER_SEC = 44100 / 1024.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_epoch(remat: bool, batch_size: int, steps: int = 20,
               chain: int = 3) -> float:
    from sed_crnn_tpu.core.config import get_preset
    from sed_crnn_tpu.data.rasterize import rasterize_events
    from sed_crnn_tpu.models import get_model
    from sed_crnn_tpu.train.loop import Trainer, make_samplers

    exp = get_preset("sednet-dcase")
    exp = exp.replace(
        model=dataclasses.replace(
            exp.model, compute_dtype="bfloat16", remat_trunk=remat
        ),
        train=dataclasses.replace(exp.train, batch_size=batch_size),
    )
    frames = 200_000 if batch_size > 128 else 60_000
    rng = np.random.default_rng(1)
    ev = [(t, t + 0.4, int(t) % 6)
          for t in np.arange(3.0, frames / FRAMES_PER_SEC - 5, 4.0)]
    lab = rasterize_events(
        [(s, e) for s, e, _ in ev], frames, 44100, 1024,
        n_classes=6, class_ids=[c for _, _, c in ev],
    )
    mel = rng.standard_normal((frames, 40)).astype(np.float32)
    fold = {"train_x": mel, "train_y": lab,
            "val_x": mel[:20000], "val_y": lab[:20000]}
    ts, vs = make_samplers(exp, fold)
    trainer = Trainer(get_model(exp.model), exp.train, ts, vs)
    state = trainer.init_state(jax.random.PRNGKey(2))

    def run(state, seed0):
        sc = None
        for r in range(chain):
            state, sc = trainer.train_epoch(
                state, jax.random.PRNGKey(seed0 + r), steps
            )
        _ = float(sc["loss"] + jnp.sum(state.params["head"][0]["b"]))
        return state

    state = run(state, 1)  # compile + warm
    times = []
    for r in range(3):
        t0 = time.perf_counter()
        state = run(state, 10 + chain * r)
        times.append(time.perf_counter() - t0)
    return min(times) / chain / steps


def main():
    from sed_crnn_tpu.core.runtime import enable_compilation_cache, use_fast_prng

    use_fast_prng()
    enable_compilation_cache()
    log(f"device: {jax.devices()[0]}")

    out = {}
    for batch in (128, 512):
        base = time_epoch(False, batch)
        remat = time_epoch(True, batch)
        audio = batch * 256 / FRAMES_PER_SEC
        out[f"b{batch}"] = {
            "base_ms_per_step": round(base * 1e3, 3),
            "remat_ms_per_step": round(remat * 1e3, 3),
            "speedup_remat_over_base": round(base / remat, 3),
            "base_audio_sec_per_sec": round(audio / base, 1),
            "remat_audio_sec_per_sec": round(audio / remat, 1),
        }
        log(f"B={batch}: base {base*1e3:.2f} ms/step, "
            f"remat {remat*1e3:.2f} ms/step "
            f"({base/remat:.3f}x)")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
