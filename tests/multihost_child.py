"""Child process for the 2-process multi-host DP simulation test (not
collected by pytest — spawned by `test_multihost.py`).

Runs the REAL multi-host code path: `jax.distributed` initialization via
`parallel/mesh.py::initialize_multihost`, per-host data sharding via
`parallel/data_parallel.py::shard_fold_data`, and a DP train+eval epoch over
a global mesh whose collectives cross the process boundary (gloo on CPU;
ICI/DCN on TPU pods). Prints one RESULT line the parent asserts on:
replicated losses must come out identical on every host.
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]

# conftest-style CPU forcing: the host env pins JAX_PLATFORMS to the TPU
# platform and a site hook imports jax early, so set env BEFORE importing
# jax and override the already-captured config after.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from sed_crnn_tpu.core.config import (  # noqa: E402
    ExperimentConfig,
    FrontendConfig,
    ModelConfig,
    TrainConfig,
)
from sed_crnn_tpu.data import rasterize  # noqa: E402
from sed_crnn_tpu.models import get_model  # noqa: E402
from sed_crnn_tpu.parallel.data_parallel import (  # noqa: E402
    DataParallelTrainer,
    shard_fold_data,
)
from sed_crnn_tpu.parallel.mesh import initialize_multihost, make_mesh  # noqa: E402
from sed_crnn_tpu.train.loop import make_samplers  # noqa: E402

initialize_multihost(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.local_devices()) == 4 and len(jax.devices()) == 8

# Same seed on both hosts = one global dataset; each host then keeps only its
# contiguous shard, exactly as a per-host loader would.
rng = np.random.default_rng(0)
frames = 4000
mel = rng.standard_normal((frames, 40)).astype(np.float32)
events, t = [], 2.0
while t * 43 < frames - 100:
    events.append((t, t + 0.3))
    t += 3.0
lab = rasterize.rasterize_events(events, frames, 44100, 1024)
mel[lab[:, 0] == 1, 8:16] += 4.0
fold = {
    "train_x": mel,
    "train_y": lab,
    "val_x": mel[:2000].copy(),
    "val_y": lab[:2000].copy(),
}

mesh = make_mesh()  # all 8 global devices, both hosts
local = shard_fold_data(fold, mesh, seq_len_in=64)
assert local["train_x"].shape[0] == frames // 2
lo, hi = (0, frames // 2) if pid == 0 else (frames // 2, frames)
assert np.array_equal(local["train_x"], mel[lo:hi]), "host got the wrong shard"

# Adversarial layout: every positive frame lives in host 0's half. The shard
# guard must refuse host 1's starved shard with an actionable error (and
# accept host 0's, which keeps both positives and clean negatives).
adv_lab = lab.copy()
adv_lab[frames // 2:] = 0.0
adv = {
    "train_x": mel,
    "train_y": adv_lab,
    "val_x": mel[: frames // 2].copy(),
    "val_y": adv_lab[: frames // 2].copy(),
}
try:
    shard_fold_data(adv, mesh, seq_len_in=64)
    guard = "ok" if pid == 0 else "MISSED"
except ValueError as e:
    guard = (
        "raised"
        if pid == 1 and "NO positive" in str(e) and f"host {pid}" in str(e)
        else f"WRONG:{e}"
    )

model_cfg = ModelConfig(
    name="tiny",
    conv_channels=(4, 4, 4),
    pool=(2, 2, 2),
    pool_axis="time",
    dropout=0.0,
    gru_hidden=(4,),
    head_dims=(1,),
)
tcfg = TrainConfig(batch_size=16, max_epochs=1, plot_every=0)
cfg = ExperimentConfig("mh", FrontendConfig(), model_cfg, tcfg)
ts, vs = make_samplers(cfg, local)
model = get_model(model_cfg)
trainer = DataParallelTrainer(model, tcfg, ts, vs, mesh)
state = trainer.init_state(jax.random.PRNGKey(0))
state, scores = trainer.train_epoch(state, jax.random.PRNGKey(1), 2)
val = trainer.eval_epoch(state, jax.random.PRNGKey(2), 1)

# Seed-axis sharding across the SAME 2-process deployment: 8 stacked runs,
# one per global device (4 local to each host). Inputs are host-replicated
# numpy trees (identical on both hosts), which jit shards to the global
# mesh; the per-seed losses come back sharded, so assert on a replicated
# reduction (mean over lanes).
import jax.numpy as jnp  # noqa: E402

from sed_crnn_tpu.train.multiseed import MultiSeedTrainer, shard_lanes  # noqa: E402

seed_mesh = make_mesh(axis_name="seed")
ms = MultiSeedTrainer(model, tcfg, ts, vs, 8, seed_mesh)
ms_keys = np.stack([np.asarray(jax.random.PRNGKey(11 + i)) for i in range(8)])
ms_state = jax.device_get(ms.init_states(jnp.asarray(ms_keys)))
ms_state, ms_scores = ms.train_epoch(
    shard_lanes(ms_state, seed_mesh), shard_lanes(ms_keys, seed_mesh), 2
)
ms_loss = float(jnp.mean(ms_scores["loss"]))

print(
    f"RESULT pid={pid} train_loss={float(scores['loss']):.6f} "
    f"val_loss={float(val['loss']):.6f} er={float(val['er_overall_1sec']):.4f} "
    f"guard={guard} ms_loss={ms_loss:.6f}",
    flush=True,
)
