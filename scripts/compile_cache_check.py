"""Persistent-compilation-cache check on the real TPU.

Spawns the SAME flagship first-epoch workload in two fresh child processes
sharing one `SEDTPU_COMPILE_CACHE` directory (cleaned first), and reports
each child's time-to-first-epoch plus the cache directory's entry count.
If the axon PJRT client supports executable serialization, child 2's
compile cost collapses to cache-deserialize time; if it doesn't, the two
times match and THAT is the documented finding (docs/ROADMAP.md).

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/compile_cache_check.py
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

CHILD = r"""
import json, os, sys, time
t_start = time.perf_counter()
import numpy as np
import jax
from sed_crnn_tpu.core.runtime import enable_compilation_cache, use_fast_prng

use_fast_prng()
cache = enable_compilation_cache()
dev = str(jax.devices()[0])
t_init = time.perf_counter()

import dataclasses
from sed_crnn_tpu.core.config import get_preset
from sed_crnn_tpu.data.rasterize import rasterize_events
from sed_crnn_tpu.models import get_model
from sed_crnn_tpu.train.loop import Trainer, make_samplers

FPS = 44100 / 1024.0
exp = get_preset("sednet-dcase")
exp = exp.replace(model=dataclasses.replace(exp.model, compute_dtype="bfloat16"))
frames = 60_000
rng = np.random.default_rng(1)
ev = [(t, t + 0.4, int(t) % 6) for t in np.arange(3.0, frames / FPS - 5, 4.0)]
lab = rasterize_events([(s, e) for s, e, _ in ev], frames, 44100, 1024,
                       n_classes=6, class_ids=[c for _, _, c in ev])
mel = rng.standard_normal((frames, 40)).astype(np.float32)
fold = {"train_x": mel, "train_y": lab, "val_x": mel[:20000], "val_y": lab[:20000]}
ts, vs = make_samplers(exp, fold)
trainer = Trainer(get_model(exp.model), exp.train, ts, vs)
state = trainer.init_state(jax.random.PRNGKey(2))
t_setup = time.perf_counter()
state, sc = trainer.train_epoch(state, jax.random.PRNGKey(3), 20)
loss = float(sc["loss"])
t_epoch1 = time.perf_counter()
print(json.dumps({
    "device": dev,
    "cache_dir": cache,
    "jax_init_sec": round(t_init - t_start, 1),
    "data_setup_sec": round(t_setup - t_init, 1),
    "first_epoch_sec": round(t_epoch1 - t_setup, 1),
    "loss": round(loss, 4),
}))
"""


def main():
    cache = os.environ.get("SEDTPU_COMPILE_CACHE", "/tmp/sedtpu_cache_check")
    shutil.rmtree(cache, ignore_errors=True)
    env = dict(os.environ, SEDTPU_COMPILE_CACHE=cache)
    runs = []
    for i in range(2):
        t0 = time.perf_counter()
        out = subprocess.run(
            [sys.executable, "-c", CHILD], env=env,
            capture_output=True, text=True,
        )
        wall = time.perf_counter() - t0
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
        if not line:
            print(json.dumps({"run": i + 1, "error": out.stderr[-2000:]}))
            return 1
        rec = json.loads(line[-1])
        rec["run"] = i + 1
        rec["child_wall_sec"] = round(wall, 1)
        n_entries = sum(len(fs) for _, _, fs in os.walk(cache))
        rec["cache_entries_after"] = n_entries
        runs.append(rec)
        print(json.dumps(rec), flush=True)
    speedup = runs[0]["first_epoch_sec"] / max(1e-9, runs[1]["first_epoch_sec"])
    print(json.dumps({
        "verdict": "cache effective" if speedup > 1.5 else
                   "cache ineffective under this platform",
        "first_epoch_cold_sec": runs[0]["first_epoch_sec"],
        "first_epoch_warm_sec": runs[1]["first_epoch_sec"],
        "speedup": round(speedup, 2),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
