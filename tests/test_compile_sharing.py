"""Cross-fold compile sharing and deterministic full-split validation.

The epoch programs must (a) compile once per experiment — fold data enters as
traced arguments padded to shared buckets, never as closure constants; (b)
actually read EACH fold's data (the closure-constant trap would silently
train fold B on fold A's arrays); (c) produce identical numerics whether an
epoch is padded with masked steps or sized exactly; and (d) give
bit-deterministic full-sweep validation that matches the standalone
full-split evaluator."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sed_crnn_tpu.core.config import (
    ExperimentConfig,
    FrontendConfig,
    ModelConfig,
    TrainConfig,
)
from sed_crnn_tpu.data import rasterize
from sed_crnn_tpu.models import get_model
from sed_crnn_tpu.train import loop as train_loop
from sed_crnn_tpu.train.loop import Trainer, _epoch_program, make_samplers, plan_folds

# Compile-heavy tier: deselect with `-m "not slow"` for the fast smoke pass
# (see pyproject [tool.pytest.ini_options] markers and docs/DESIGN.md).
pytestmark = pytest.mark.slow


def _tiny_cfg(sampler="balanced", **tkw):
    model = ModelConfig(
        name="tiny",
        conv_channels=(4, 4, 4),
        pool=(2, 2, 2),
        pool_axis="time",
        dropout=0.0,
        gru_hidden=(4,),
        head_dims=(1,),
        seq_len_in=64,
    )
    train = TrainConfig(
        batch_size=16, max_epochs=1, sampler=sampler, plot_every=0, **tkw
    )
    return ExperimentConfig("tiny", FrontendConfig(), model, train)


def _fold(rng, frames):
    mel = rng.standard_normal((frames, 40)).astype(np.float32)
    events, t = [], 2.0
    while t * 43 < frames - 100:
        events.append((t, t + 0.3))
        t += 3.0
    lab = rasterize.rasterize_events(events, frames, 44100, 1024)
    mel[lab[:, 0] == 1, 8:16] += 4.0
    va = frames // 2
    return {
        "train_x": mel,
        "train_y": lab,
        "val_x": mel[:va].copy(),
        "val_y": lab[:va].copy(),
    }


def test_run_experiment_compiles_once_across_folds(tmp_path, rng):
    """Two differently-sized folds -> 2 cached program builders (train+eval),
    each with exactly ONE jit compile entry (shapes shared via buckets)."""
    _epoch_program.cache_clear()
    cfg = _tiny_cfg()
    folds = {1: _fold(rng, 2600), 2: _fold(rng, 3400)}
    out = train_loop.run_experiment(cfg, folds, str(tmp_path), verbose=False)
    assert len(out["folds"]) == 2

    info = _epoch_program.cache_info()
    assert info.currsize == 2, f"expected train+eval programs only, got {info}"
    # Re-deriving the cache keys returns the same jitted callables; each must
    # hold a single compiled entry after serving both folds.
    plan = plan_folds(cfg, folds)
    model = get_model(cfg.model)
    ts, vs = make_samplers(cfg, folds[1], plan)
    fn_train = _epoch_program(
        model, cfg.train, ts.spec, plan.n_train_steps_max, "train", None, False
    )
    fn_eval = _epoch_program(
        model, cfg.train, vs.spec, plan.n_val_steps_max, "eval", None, False
    )
    assert _epoch_program.cache_info().currsize == 2  # still: cache hits
    assert fn_train._cache_size() == 1
    assert fn_eval._cache_size() == 1


def test_shared_program_reads_each_folds_data(rng):
    """The closure-constant trap: ONE compiled sweep program must score fold
    1 (labels all positive) and fold 2 (labels all negative) from their own
    arrays. Zeroed params give logits 0 -> sigmoid 0.5 -> all-negative
    predictions, so fold 1 yields only FNs and fold 2 only TNs."""
    cfg = _tiny_cfg(sampler="sequence")
    f1 = {k: v for k, v in _fold(rng, 2200).items()}
    f2 = {k: v for k, v in _fold(rng, 3100).items()}
    f1["val_y"] = np.ones_like(f1["val_y"])
    f2["val_y"] = np.zeros_like(f2["val_y"])
    folds = {1: f1, 2: f2}
    plan = plan_folds(cfg, folds)
    model = get_model(cfg.model)
    _, val1 = make_samplers(cfg, f1, plan)
    _, val2 = make_samplers(cfg, f2, plan)
    tr1 = Trainer(model, cfg.train, val1, val1)
    tr2 = Trainer(model, cfg.train, val2, val2)

    state = tr1.init_state(jax.random.PRNGKey(0))
    state = state._replace(params=jax.tree.map(jnp.zeros_like, state.params))

    s1 = tr1.eval_sweep(state, n_steps_max=plan.n_sweep_steps_max)
    s2 = tr2.eval_sweep(state, n_steps_max=plan.n_sweep_steps_max)

    t_out = model.seq_len_out
    assert int(s1["fn"]) == val1.sweep_windows * t_out and int(s1["tn"]) == 0
    assert int(s2["tn"]) == val2.sweep_windows * t_out and int(s2["fn"]) == 0

    # and both folds were served by the same program object + one compile
    fn1 = _epoch_program(
        model, cfg.train, val1.spec, plan.n_sweep_steps_max, "sweep", None, False
    )
    fn2 = _epoch_program(
        model, cfg.train, val2.spec, plan.n_sweep_steps_max, "sweep", None, False
    )
    assert fn1 is fn2
    assert fn1._cache_size() == 1


def test_padded_epoch_matches_exact(rng):
    """Masked trailing steps must not change numerics: n_steps=3 padded to
    n_steps_max=6 equals the exactly-sized epoch (params and scores)."""
    cfg = _tiny_cfg()
    fold = _fold(rng, 2600)
    ts, vs = make_samplers(cfg, fold)
    model = get_model(cfg.model)
    tr = Trainer(model, cfg.train, ts, vs)
    st0 = tr.init_state(jax.random.PRNGKey(0))

    s_exact, sc_exact = tr.train_epoch(st0, jax.random.PRNGKey(1), 3)
    s_pad, sc_pad = tr.train_epoch(st0, jax.random.PRNGKey(1), 3, n_steps_max=6)
    for a, b in zip(jax.tree.leaves(s_exact.params), jax.tree.leaves(s_pad.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    for k in sc_exact:
        np.testing.assert_allclose(
            float(sc_exact[k]), float(sc_pad[k]), atol=1e-6, err_msg=k
        )

    e_exact = tr.eval_epoch(st0, jax.random.PRNGKey(2), 2)
    e_pad = tr.eval_epoch(st0, jax.random.PRNGKey(2), 2, n_steps_max=5)
    for k in e_exact:
        np.testing.assert_allclose(
            float(e_exact[k]), float(e_pad[k]), atol=1e-6, err_msg=k
        )


def test_eval_sweep_deterministic_and_matches_full_split(rng):
    """Same params => bit-identical sweep scores, and the 1-sec ER/F1 equal
    the standalone full-split evaluator's on the same split."""
    cfg = _tiny_cfg(sampler="sequence")
    fold = _fold(rng, 3000)
    ts, vs = make_samplers(cfg, fold)
    model = get_model(cfg.model)
    tr = Trainer(model, cfg.train, ts, vs)
    state = tr.init_state(jax.random.PRNGKey(7))

    a = tr.eval_sweep(state)
    b = tr.eval_sweep(state)
    assert float(a["er_overall_1sec"]) == float(b["er_overall_1sec"])
    assert float(a["f1_overall_1sec"]) == float(b["f1_overall_1sec"])
    assert float(a["loss"]) == float(b["loss"])

    from sed_crnn_tpu.train.evaluate import evaluate_split

    rep = evaluate_split(
        model, state.params, state.model_state,
        fold["val_x"], fold["val_y"], cfg, batch_size=16,
    )
    assert rep["er_1s"] == pytest.approx(float(a["er_overall_1sec"]), abs=1e-6)
    assert rep["f1_1s"] == pytest.approx(float(a["f1_overall_1sec"]), abs=1e-6)


def test_run_fold_sequence_val_is_deterministic(tmp_path, rng):
    """With the sequence sampler, run_fold's early-stop criterion tracks the
    deterministic full-split ER: identical reruns give identical histories."""
    cfg = _tiny_cfg(sampler="sequence")
    cfg = cfg.replace(
        train=cfg.train.__class__(
            **{**cfg.train.__dict__, "batch_size": 8, "max_epochs": 2}
        )
    )
    fold = _fold(rng, 2000)
    r1 = train_loop.run_fold(cfg, fold, 1, str(tmp_path / "a"), verbose=False)
    r2 = train_loop.run_fold(cfg, fold, 1, str(tmp_path / "b"), verbose=False)
    assert r1.history["er_1s_val"] == r2.history["er_1s_val"]
    assert r1.history["loss_val"] == r2.history["loss_val"]


def test_masked_scores_match_unmasked_prefix(rng):
    """all_scores_masked over padded rows == all_scores over the valid
    prefix, including the segment-ER floor-truncation quirk."""
    from sed_crnn_tpu.ops import metrics

    o = (rng.random((173, 2)) < 0.3).astype(np.float32)
    t = (rng.random((173, 2)) < 0.3).astype(np.float32)
    n_valid = 131  # deliberately not a block multiple (block 7)
    o_pad = np.concatenate([o[:n_valid], np.zeros((42, 2), np.float32)])
    t_pad = np.concatenate([t[:n_valid], np.zeros((42, 2), np.float32)])

    ref = metrics.all_scores(jnp.asarray(o[:n_valid]), jnp.asarray(t[:n_valid]), 7)
    got = metrics.all_scores_masked(
        jnp.asarray(o_pad), jnp.asarray(t_pad), 7, jnp.int32(n_valid)
    )
    for k in ref:
        np.testing.assert_allclose(float(got[k]), float(ref[k]), atol=1e-6, err_msg=k)
