"""Multi-seed (mean-of-N-runs) training: per-seed parity with individual
`run_fold` runs, early-stop freezing, seed-axis sharding over a device mesh,
and the N-run experiment protocol (`README.md:62-64` "mean of 5 runs")."""

import os

import numpy as np
import pytest

from sed_crnn_tpu.core import checkpoint as ckpt_io
from sed_crnn_tpu.core.config import get_preset
from sed_crnn_tpu.train import loop as train_loop
from sed_crnn_tpu.train import multiseed
from tests.test_train import _synthetic_fold

# Compile-heavy tier: deselect with `-m "not slow"` for the fast smoke pass
# (see pyproject [tool.pytest.ini_options] markers and docs/DESIGN.md).
pytestmark = pytest.mark.slow


def _cfg(**train_overrides):
    cfg = get_preset("timepooled-v2")
    base = {
        "batch_size": 32,
        "max_epochs": 3,
        "early_stop_patience": 10,
        "plot_every": 0,
    }
    base.update(train_overrides)
    return cfg.replace(train=cfg.train.__class__(**{**cfg.train.__dict__, **base}))


def test_multiseed_forces_scan_gru_backend():
    """Stacking must not inherit the Pallas GRU recurrence: its VMEM-resident
    full-sequence residuals OOM once vmap adds a seed grid dimension
    (observed on hardware at B=128 T=256 H=32 x 2 seeds). An explicitly
    pallas-backed model is rebuilt onto the scan path."""
    import dataclasses

    from sed_crnn_tpu.models import get_model
    from sed_crnn_tpu.train.loop import make_samplers

    cfg = _cfg()
    mcfg = dataclasses.replace(cfg.model, gru_backend="pallas")
    fold = _synthetic_fold(np.random.default_rng(0), 2000)
    ts, vs = make_samplers(cfg, fold)
    trainer = multiseed.MultiSeedTrainer(
        get_model(mcfg), cfg.train, ts, vs, n_seeds=2
    )
    assert trainer.model.cfg.gru_backend == "xla"


def test_multiseed_matches_individual_runs(tmp_path, rng):
    """Each lane of the stacked program must reproduce run_fold(seed=s): the
    same RNG chain (exact — asserted on the checkpointed key carry), a
    near-bit epoch-1 loss, and the same training trajectory up to chaotic
    amplification of vmap-refusion rounding (measured on this task: losses
    drift ~1e-3 relative by epoch 3; discrete ER can flip a few segments —
    the module docstring's caveat)."""
    cfg = _cfg()
    fold = _synthetic_fold(rng, 2500)
    seeds = [3, 11]
    multi = multiseed.run_fold_multiseed(
        cfg, fold, 1, str(tmp_path / "m"), seeds, verbose=False
    )
    assert len(multi) == 2
    for s, res_m in zip(seeds, multi):
        res_i = train_loop.run_fold(
            cfg, fold, 1, str(tmp_path / f"i{s}"), seed=s, verbose=False
        )
        assert res_m.epochs_run == res_i.epochs_run == 3
        # epoch 1 is mostly pre-chaos (step 1 is bit-identical; drift compounds
        # through the epoch's Adam updates): tight agreement proves identical
        # sampling, augmentation, dropout, loss, and optimizer semantics
        assert res_m.history["loss_tr"][0] == pytest.approx(
            res_i.history["loss_tr"][0], rel=1e-3
        )
        np.testing.assert_allclose(
            res_m.history["loss_tr"], res_i.history["loss_tr"], rtol=5e-3
        )
        np.testing.assert_allclose(
            res_m.history["er_1s_val"], res_i.history["er_1s_val"], atol=0.15
        )
        assert res_m.best_er == pytest.approx(res_i.best_er, abs=0.15)
        # exact-chain RNG parity: both paths end the run on the same live key
        tree_m, _ = ckpt_io.load_checkpoint(
            str(tmp_path / "m" / f"seed{s}" / "last_fold1.npz")
        )
        tree_i, _ = ckpt_io.load_checkpoint(
            str(tmp_path / f"i{s}" / "last_fold1.npz")
        )
        np.testing.assert_array_equal(tree_m["rng_key"], tree_i["rng_key"])
    # the two seeds must actually be different runs
    assert multi[0].history["loss_tr"] != multi[1].history["loss_tr"]


def test_multiseed_checkpoints_resume_via_run_fold(tmp_path, rng):
    """Per-seed checkpoints use run_fold's layout and carry the live RNG key,
    so an individual seed resumes through the ordinary single-run path."""
    fold = _synthetic_fold(rng, 2500)
    seeds = [5, 21]
    multiseed.run_fold_multiseed(
        _cfg(), fold, 2, str(tmp_path), seeds, verbose=False
    )
    for s in seeds:
        seed_dir = tmp_path / f"seed{s}"
        assert (seed_dir / "best_fold2.npz").exists()
        last = seed_dir / "last_fold2.npz"
        tree, meta = ckpt_io.load_checkpoint(str(last))
        assert meta["epoch"] == 3 and meta["seed"] == s
        assert "rng_key" in tree
        assert (seed_dir / "train_fold2.jsonl").exists()
        # v2 checkpoint policy saves every epoch, per seed
        assert len([f for f in os.listdir(seed_dir) if f.startswith("epoch")]) == 3
    cfg5 = _cfg(max_epochs=5)
    res = train_loop.run_fold(
        cfg5, fold, 2, str(tmp_path / "seed5"),
        resume_from=str(tmp_path / "seed5" / "last_fold2.npz"), verbose=False,
    )
    assert res.epochs_run == 5
    assert len(res.history["loss_tr"]) == 5


def test_multiseed_early_stop_freezes_per_seed(tmp_path, rng):
    """A frozen-model run (lr=0) never improves after epoch 1, so every seed
    stops right after patience — tracking must freeze at the same epoch the
    individual run would have stopped."""
    cfg = _cfg(
        max_epochs=50,
        early_stop_patience=1,
        early_stop_strict_greater=False,
        learning_rate=0.0,
    )
    fold = _synthetic_fold(rng, 2500)
    seeds = [0, 9]
    multi = multiseed.run_fold_multiseed(
        cfg, fold, 3, str(tmp_path / "m"), seeds, verbose=False
    )
    for s, res_m in zip(seeds, multi):
        res_i = train_loop.run_fold(
            cfg, fold, 3, str(tmp_path / f"i{s}"), seed=s, verbose=False
        )
        assert res_m.epochs_run == res_i.epochs_run <= 4
        assert len(res_m.history["loss_tr"]) == len(res_i.history["loss_tr"])


def test_multiseed_sharded_over_mesh(tmp_path, rng):
    """Seed-axis sharding: 4 seeds over a 4-device mesh must run and agree
    with the unsharded stacked program."""
    from sed_crnn_tpu.parallel.mesh import make_mesh

    cfg = _cfg(max_epochs=2)
    fold = _synthetic_fold(rng, 2500)
    seeds = [1, 8, 15, 22]
    mesh = make_mesh(4, axis_name="seed")
    sharded = multiseed.run_fold_multiseed(
        cfg, fold, 1, str(tmp_path / "s"), seeds, mesh=mesh, verbose=False
    )
    plain = multiseed.run_fold_multiseed(
        cfg, fold, 1, str(tmp_path / "p"), seeds, verbose=False
    )
    for a, b in zip(sharded, plain):
        np.testing.assert_allclose(
            a.history["loss_tr"], b.history["loss_tr"], rtol=5e-3
        )
        assert a.best_er == pytest.approx(b.best_er, abs=0.15)


def test_multiseed_full_sweep_validation(tmp_path, rng):
    """Sequence-sampler presets validate by a deterministic full-split sweep
    (`_use_full_sweep`); the vmapped sweep program must reproduce the
    individual run's deterministic scores per seed."""
    import dataclasses

    cfg = get_preset("sednet-dcase")
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model, conv_channels=(8, 8, 8), gru_hidden=(8, 8)
        ),
        train=dataclasses.replace(
            cfg.train, batch_size=8, max_epochs=2, plot_every=0
        ),
    )
    mel = rng.standard_normal((3000, 40)).astype(np.float32)
    lab = np.zeros((3000, 6), np.float32)
    for cls in range(6):
        t = 50 + cls * 17
        while t < 3000 - 60:
            lab[t : t + 20, cls] = 1.0
            mel[t : t + 20, cls * 6 : cls * 6 + 6] += 3.0
            t += 300 + cls * 31
    fold = {"train_x": mel, "train_y": lab,
            "val_x": mel[:1500], "val_y": lab[:1500]}

    seeds = [2, 13]
    multi = multiseed.run_fold_multiseed(
        cfg, fold, 1, str(tmp_path / "m"), seeds, verbose=False
    )
    for s, res_m in zip(seeds, multi):
        res_i = train_loop.run_fold(
            cfg, fold, 1, str(tmp_path / f"i{s}"), seed=s, verbose=False
        )
        assert res_m.epochs_run == res_i.epochs_run == 2
        np.testing.assert_allclose(
            res_m.history["loss_val"], res_i.history["loss_val"], rtol=5e-3
        )
        np.testing.assert_allclose(
            res_m.history["er_1s_val"], res_i.history["er_1s_val"], atol=0.15
        )


def test_multiseed_rejects_bad_seed_counts(tmp_path, rng):
    from sed_crnn_tpu.parallel.mesh import make_mesh

    fold = _synthetic_fold(rng, 2500)
    with pytest.raises(ValueError, match="duplicate"):
        multiseed.run_fold_multiseed(
            _cfg(), fold, 1, str(tmp_path), [4, 4], verbose=False
        )
    mesh = make_mesh(4, axis_name="seed")
    with pytest.raises(ValueError, match="divisible"):
        multiseed.run_fold_multiseed(
            _cfg(), fold, 1, str(tmp_path), [1, 2, 3], mesh=mesh, verbose=False
        )


def test_multiseed_lr_sweep(tmp_path, rng):
    """The stacked axis doubles as a learning-rate sweep: same data seed,
    per-lane lr_scale, distinct artifact dirs, zero extra compiles."""
    cfg = _cfg(max_epochs=2)
    fold = _synthetic_fold(rng, 2500)
    res = multiseed.run_fold_multiseed(
        cfg, fold, 1, str(tmp_path), [7, 7], lr_scales=[1.0, 0.25],
        verbose=False,
    )
    assert res[0].history["loss_tr"] != res[1].history["loss_tr"]
    for lr in ("1", "0.25"):
        d = tmp_path / f"seed7_lr{lr}"
        assert (d / "best_fold1.npz").exists()
    from sed_crnn_tpu.core import checkpoint as ckpt_io

    _, meta = ckpt_io.load_checkpoint(
        str(tmp_path / "seed7_lr0.25" / "last_fold1.npz")
    )
    assert meta["base_lr_scale"] == 0.25

    with pytest.raises(ValueError, match="duplicate"):
        multiseed.run_fold_multiseed(
            cfg, fold, 1, str(tmp_path / "x"), [7, 7],
            lr_scales=[0.5, 0.5], verbose=False,
        )
    with pytest.raises(ValueError, match="one per lane"):
        multiseed.run_fold_multiseed(
            cfg, fold, 1, str(tmp_path / "y"), [7, 8],
            lr_scales=[0.5], verbose=False,
        )


def test_experiment_multiseed_protocol(tmp_path, rng):
    """The N-run experiment: mean/std over per-seed cross-fold averages,
    seeds spaced to keep every (seed, fold) RNG key distinct."""
    cfg = _cfg(max_epochs=2)
    folds = {1: _synthetic_fold(rng, 2500), 2: _synthetic_fold(rng, 2500)}
    out = multiseed.run_experiment_multiseed(
        cfg, folds, str(tmp_path), n_runs=2, verbose=False
    )
    assert len(out["seeds"]) == 2
    assert out["seeds"][1] - out["seeds"][0] == multiseed.SEED_STRIDE
    assert len(out["er_by_seed"]) == 2
    expected = float(np.mean(out["er_by_seed"]))
    assert out["mean_er"] == pytest.approx(expected)
    assert out["std_er"] >= 0.0
    assert os.path.exists(tmp_path / "experiment_multiseed.jsonl")
    # per-seed artifacts exist for every fold
    for f in (1, 2):
        for s in out["seeds"]:
            assert (tmp_path / f"fold{f}" / f"seed{s}").is_dir()


def test_experiment_multiseed_sequential_mode(tmp_path, rng):
    """mode='sequential' (the single-chip choice for conv-128 models) runs
    each seed through run_fold with the SAME artifact layout and RNG chains
    as the stacked program, so results agree up to the documented
    vmap-refusion rounding drift."""
    cfg = _cfg(max_epochs=2)
    folds = {1: _synthetic_fold(rng, 2500)}
    seq = multiseed.run_experiment_multiseed(
        cfg, folds, str(tmp_path / "seq"), n_runs=2, verbose=False,
        mode="sequential",
    )
    stk = multiseed.run_experiment_multiseed(
        cfg, folds, str(tmp_path / "stk"), n_runs=2, verbose=False,
        mode="stacked",
    )
    assert seq["seeds"] == stk["seeds"]
    for s in seq["seeds"]:
        d = tmp_path / "seq" / "fold1" / f"seed{s}"
        assert (d / "best_fold1.npz").exists()
        assert (d / "train_fold1.jsonl").exists()
    assert seq["mean_er"] == pytest.approx(stk["mean_er"], abs=0.15)

    with pytest.raises(ValueError, match="stacked"):
        multiseed.run_experiment_multiseed(
            cfg, folds, str(tmp_path / "bad"), n_runs=2, verbose=False,
            mode="nope",
        )


def test_choose_runs_mode_encodes_the_measurement():
    """The auto default must encode the measured BatchNorm fusion-split
    point (`BN_FUSION_SPLIT_BATCH`): sequential only for conv-128 trunks
    whose stacked effective conv batch crosses it on a single chip."""
    import dataclasses

    v1 = get_preset("timepooled-v1")   # conv 128, batch 128
    v2 = get_preset("timepooled-v2")   # conv 16
    sed = get_preset("sednet-dcase")   # conv 128, batch 128

    # flagship-width models, 5 runs: 128*5 = 640 >= 256 -> sequential
    assert multiseed.choose_runs_mode(v1, 5) == "sequential"
    assert multiseed.choose_runs_mode(sed, 5) == "sequential"
    # small trunk never hits the split point
    assert multiseed.choose_runs_mode(v2, 5) == "stacked"
    # below the split point, stacking wins even for conv-128
    small_batch = v1.replace(
        train=dataclasses.replace(v1.train, batch_size=32)
    )
    assert multiseed.choose_runs_mode(small_batch, 4) == "stacked"
    # a seed-sharded mesh always takes the stacked (shardable) program
    assert multiseed.choose_runs_mode(v1, 5, mesh=object()) == "stacked"


def test_experiment_multiseed_auto_mode(tmp_path, rng, capsys):
    """mode='auto' (the new default) resolves via choose_runs_mode and says
    which mode it picked; an explicit losing choice warns but proceeds."""
    cfg = _cfg(max_epochs=1)
    folds = {1: _synthetic_fold(rng, 2500)}
    out = multiseed.run_experiment_multiseed(
        cfg, folds, str(tmp_path / "auto"), n_runs=2,
    )
    assert len(out["seeds"]) == 2
    assert "runs-mode auto -> stacked" in capsys.readouterr().out

    # v2 (small trunk) predicted stacked; asking for sequential warns
    multiseed.run_experiment_multiseed(
        cfg, folds, str(tmp_path / "warn"), n_runs=2, mode="sequential",
    )
    assert "predicted SLOWER" in capsys.readouterr().out
