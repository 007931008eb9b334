"""Data-parallel integration: the train CLI over an 8-virtual-device mesh and
batched streaming inference with a sharded batch axis."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from sed_crnn_tpu.core.config import get_preset
from sed_crnn_tpu.models import get_model
from sed_crnn_tpu.models.streaming import stream_logits, stream_logits_batch
from sed_crnn_tpu.parallel.mesh import make_mesh

import pytest

# Compile-heavy tier: deselect with `-m "not slow"` for the fast smoke pass
# (see pyproject [tool.pytest.ini_options] markers and docs/DESIGN.md).
pytestmark = pytest.mark.slow


def test_train_cli_data_parallel(tmp_path):
    from sed_crnn_tpu.apps import train as train_app

    train_app.main(
        [
            "--preset", "timepooled-v2", "--synthetic", "--folds", "1",
            "--art-dir", str(tmp_path), "--max-epochs", "1",
            "--batch-size", "32", "--plot-every", "0",
            "--data-parallel", "8", "--slow-prng",  # keep process-global PRNG impl untouched
        ]
    )
    runs = sorted(tmp_path.iterdir())
    assert (runs[-1] / "experiment.jsonl").exists()
    assert (runs[-1] / "fold1" / "best_fold1.npz").exists()


def test_dp_with_sequence_sampler(rng):
    """The legacy full-sweep sampler under the data-parallel trainer (tiny
    SEDnet-style config on the CPU mesh)."""
    from sed_crnn_tpu.parallel.data_parallel import DataParallelTrainer
    from sed_crnn_tpu.train.loop import make_samplers

    mesh = make_mesh(4)
    cfg = get_preset("sednet-dcase")
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model, conv_channels=(4, 4, 4), gru_hidden=(4, 4), seq_len_in=64
        ),
        train=dataclasses.replace(cfg.train, batch_size=8),
    )
    mel = rng.standard_normal((1500, 40)).astype(np.float32)
    lab = (rng.random((1500, 6)) < 0.05).astype(np.float32)
    fold = {"train_x": mel, "train_y": lab, "val_x": mel[:800], "val_y": lab[:800]}
    ts_, vs_ = make_samplers(cfg, fold)
    trainer = DataParallelTrainer(get_model(cfg.model), cfg.train, ts_, vs_, mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state, scores = trainer.train_epoch(state, jax.random.PRNGKey(1), 2)
    val = trainer.eval_epoch(state, jax.random.PRNGKey(2), 1)
    assert np.isfinite(float(scores["loss"])) and np.isfinite(float(val["loss"]))


def test_batched_streaming_sharded(rng):
    """BASELINE config 5: batched long-file streaming with the batch axis
    sharded across the mesh must match per-file streaming."""
    mesh = make_mesh(4)
    model = get_model(
        dataclasses.replace(get_preset("timepooled-v2").model, compute_dtype="float32")
    )
    params, state = model.init(jax.random.PRNGKey(0))

    mels = rng.standard_normal((4, 64 * 3, 40)).astype(np.float32)
    sharded = jax.device_put(jnp.asarray(mels), NamedSharding(mesh, P("data")))
    batched = stream_logits_batch(model, params, state, sharded)
    assert batched.shape == (4, 3 * 8, 1)

    for b in range(4):
        single = stream_logits(model, params, state, jnp.asarray(mels[b]))
        np.testing.assert_allclose(
            np.asarray(batched[b]), np.asarray(single), atol=1e-5
        )
