"""Training subsystem: Adam parity vs torch, plateau schedule vs torch,
checkpoint round-trip, and an end-to-end fold run on synthetic data."""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from sed_crnn_tpu.core import checkpoint as ckpt_io
from sed_crnn_tpu.core.config import get_preset
from sed_crnn_tpu.data import rasterize
from sed_crnn_tpu.train import loop as train_loop
from sed_crnn_tpu.train.optim import Adam, ReduceLROnPlateau, clip_by_global_norm, global_norm

# Compile-heavy tier: deselect with `-m "not slow"` for the fast smoke pass
# (see pyproject [tool.pytest.ini_options] markers and docs/DESIGN.md).
pytestmark = pytest.mark.slow


# ---------------- optimizer parity ----------------


def test_adam_matches_torch(rng):
    w0 = rng.standard_normal((7, 5)).astype(np.float32)
    b0 = rng.standard_normal((5,)).astype(np.float32)

    tw = torch.tensor(w0, requires_grad=True)
    tb = torch.tensor(b0, requires_grad=True)
    topt = torch.optim.Adam([tw, tb], lr=1e-3, weight_decay=1e-4)

    adam = Adam(learning_rate=1e-3, weight_decay=1e-4)
    params = {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}
    opt_state = adam.init(params)

    for step in range(5):
        gw = rng.standard_normal((7, 5)).astype(np.float32)
        gb = rng.standard_normal((5,)).astype(np.float32)
        topt.zero_grad()
        tw.grad = torch.tensor(gw)
        tb.grad = torch.tensor(gb)
        topt.step()
        params, opt_state = adam.update(
            {"w": jnp.asarray(gw), "b": jnp.asarray(gb)}, opt_state, params
        )

    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["b"]), tb.detach().numpy(), atol=1e-6)


def test_grad_clip_matches_torch(rng):
    g = {"a": jnp.asarray(rng.standard_normal((10, 10)).astype(np.float32) * 5)}
    clipped = clip_by_global_norm(g, 1.0)
    assert float(global_norm(clipped)) == pytest.approx(1.0, rel=1e-5)
    small = {"a": jnp.asarray(np.full((2, 2), 0.01, np.float32))}
    np.testing.assert_array_equal(
        np.asarray(clip_by_global_norm(small, 1.0)["a"]), np.asarray(small["a"])
    )


def test_plateau_matches_torch():
    topt = torch.optim.Adam([torch.zeros(1, requires_grad=True)], lr=1e-3)
    tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        topt, mode="min", factor=0.5, patience=3
    )
    sched = ReduceLROnPlateau(factor=0.5, patience=3)
    state = sched.init()
    losses = [1.0, 0.9, 0.95, 0.94, 0.93, 0.92, 0.91, 0.91, 0.91, 0.91, 0.91, 0.5, 0.6, 0.6]
    for loss in losses:
        tsched.step(loss)
        state = sched.step(state, loss)
        assert state.lr_scale == pytest.approx(topt.param_groups[0]["lr"] / 1e-3)


# ---------------- checkpoint ----------------


def test_checkpoint_roundtrip(tmp_path, rng):
    tree = {
        "params": {"conv": [{"w": rng.standard_normal((3, 3)).astype(np.float32)}],
                    "gru": [{"fwd": {"wi": np.ones((4, 6), np.float32)}}]},
        "opt": {"step": np.int32(7), "mu": [np.zeros(3), np.ones(2)]},
        "scalars": (np.float32(0.5), np.int32(2)),
    }
    meta = {"epoch": 3, "best_er": 0.41, "history": {"loss_tr": [1.0, 0.5]}}
    p = ckpt_io.save_checkpoint(str(tmp_path / "ck.npz"), tree, meta)
    tree2, meta2 = ckpt_io.load_checkpoint(p)
    assert meta2["epoch"] == 3 and meta2["history"]["loss_tr"] == [1.0, 0.5]
    np.testing.assert_array_equal(tree2["params"]["conv"][0]["w"], tree["params"]["conv"][0]["w"])
    assert isinstance(tree2["opt"]["mu"], list) and len(tree2["opt"]["mu"]) == 2
    assert isinstance(tree2["scalars"], tuple)
    assert int(tree2["opt"]["step"]) == 7

    assert ckpt_io.latest_checkpoint(str(tmp_path)) == p
    assert ckpt_io.latest_checkpoint(str(tmp_path / "nope")) is None


def test_checkpoint_rejects_none(tmp_path):
    with pytest.raises(ValueError, match="None"):
        ckpt_io.save_checkpoint(str(tmp_path / "x.npz"), {"a": None})


# ---------------- end-to-end fold training ----------------


def _synthetic_fold(rng, frames=4000, n_mels=40):
    """Synthetic hit-detection data with a learnable signature: positive
    frames carry a strong bump in specific mel bins."""

    def split(n):
        mel = rng.standard_normal((n, n_mels)).astype(np.float32)
        events = []
        t = 2.0
        while t * 43 < n - 100:
            events.append((t, t + rng.uniform(0.2, 0.5)))
            t += rng.uniform(3.0, 5.0)
        lab = rasterize.rasterize_events(events, n, 44100, 1024)
        mel[lab[:, 0] == 1, 8:16] += 4.0
        return mel, lab

    tr_x, tr_y = split(frames)
    va_x, va_y = split(frames // 2)
    return {"train_x": tr_x, "train_y": tr_y, "val_x": va_x, "val_y": va_y}


@pytest.fixture(scope="module")
def tiny_cfg():
    cfg = get_preset("timepooled-v2")
    return cfg.replace(
        model=cfg.model,
        train=cfg.train.__class__(
            **{
                **cfg.train.__dict__,
                "batch_size": 32,
                "max_epochs": 3,
                "early_stop_patience": 10,
                "plot_every": 2,
            }
        ),
    )


def test_run_fold_end_to_end(tmp_path, rng, tiny_cfg):
    fold = _synthetic_fold(rng)
    res = train_loop.run_fold(tiny_cfg, fold, 1, str(tmp_path), verbose=False)

    assert res.epochs_run == 3
    # loss must decrease and the model must beat chance on this separable task
    assert res.history["loss_tr"][-1] < res.history["loss_tr"][0]
    assert res.best_er < 1.0
    assert res.best_f1 > 0.3
    # artifacts
    assert os.path.exists(res.best_checkpoint)
    assert os.path.exists(tmp_path / "last_fold1.npz")
    assert os.path.exists(tmp_path / "loss_fold1.png")
    assert os.path.exists(tmp_path / "metrics_fold1.png")
    assert os.path.exists(tmp_path / "train_fold1.jsonl")
    # v2 policy saves every epoch
    epoch_files = [f for f in os.listdir(tmp_path) if f.startswith("epoch")]
    assert len(epoch_files) == 3


def test_resume_continues(tmp_path, rng, tiny_cfg):
    fold = _synthetic_fold(rng)
    first = train_loop.run_fold(tiny_cfg, fold, 2, str(tmp_path), verbose=False)
    last = str(tmp_path / "last_fold2.npz")
    cfg2 = tiny_cfg.replace(
        train=tiny_cfg.train.__class__(**{**tiny_cfg.train.__dict__, "max_epochs": 5})
    )
    res = train_loop.run_fold(cfg2, fold, 2, str(tmp_path), resume_from=last, verbose=False)
    assert res.epochs_run == 5
    assert len(res.history["loss_tr"]) == 5
    assert res.history["loss_tr"][:3] == first.history["loss_tr"]


def test_early_stop_triggers(tmp_path, rng):
    cfg = get_preset("timepooled-v2")
    cfg = cfg.replace(
        train=cfg.train.__class__(
            **{
                **cfg.train.__dict__,
                "batch_size": 32,
                "max_epochs": 50,
                "early_stop_patience": 1,
                "early_stop_strict_greater": False,
                "plot_every": 0,
                "learning_rate": 0.0,  # frozen model -> no improvement ever
            }
        )
    )
    fold = _synthetic_fold(rng, frames=2500)
    res = train_loop.run_fold(cfg, fold, 3, str(tmp_path), verbose=False)
    assert res.epochs_run <= 4  # stops right after patience exhausted


def test_run_fold_debug_mode(tmp_path, rng, tiny_cfg):
    """debug=True runs the NaN/shape guards each epoch without tripping on a
    healthy run, and trips loudly on a poisoned one."""
    cfg = tiny_cfg.replace(
        train=tiny_cfg.train.__class__(
            **{**tiny_cfg.train.__dict__, "max_epochs": 1, "plot_every": 0}
        )
    )
    fold = _synthetic_fold(rng, 2500)
    res = train_loop.run_fold(cfg, fold, 7, str(tmp_path), verbose=False, debug=True)
    assert res.epochs_run == 1

    from sed_crnn_tpu.utils.debug import NonFiniteError

    poisoned = dict(fold)
    poisoned["train_x"] = fold["train_x"].copy()
    poisoned["train_x"][10:500] = np.inf  # drives loss/params non-finite
    with pytest.raises(NonFiniteError):
        train_loop.run_fold(
            cfg, poisoned, 8, str(tmp_path), verbose=False, debug=True
        )


def test_run_experiment_aggregates(tmp_path, rng, tiny_cfg):
    cfg = tiny_cfg.replace(
        train=tiny_cfg.train.__class__(
            **{**tiny_cfg.train.__dict__, "max_epochs": 2, "plot_every": 0}
        )
    )
    folds = {1: _synthetic_fold(rng, 2500), 2: _synthetic_fold(rng, 2500)}
    out = train_loop.run_experiment(cfg, folds, str(tmp_path), verbose=False)
    assert 0 <= out["mean_er"]
    assert len(out["folds"]) == 2
    assert os.path.exists(tmp_path / "experiment.jsonl")


def test_resume_is_bit_faithful(tmp_path, rng, tiny_cfg):
    """A run interrupted at epoch 3 and resumed must finish with params
    BIT-identical to the uninterrupted run: the checkpoint carries the live
    PRNG key, so the resumed sampling/dropout stream continues the exact
    chain (`train/loop.py` resume_from)."""
    fold = _synthetic_fold(rng, 2500)
    mk = tiny_cfg.train.__class__
    cfg5 = tiny_cfg.replace(
        train=mk(**{**tiny_cfg.train.__dict__, "max_epochs": 5, "plot_every": 0})
    )
    cfg3 = tiny_cfg.replace(
        train=mk(**{**tiny_cfg.train.__dict__, "max_epochs": 3, "plot_every": 0})
    )
    a_dir, b_dir = str(tmp_path / "a"), str(tmp_path / "b")
    train_loop.run_fold(cfg5, fold, 4, a_dir, verbose=False)
    train_loop.run_fold(cfg3, fold, 4, b_dir, verbose=False)
    train_loop.run_fold(
        cfg5, fold, 4, b_dir,
        resume_from=os.path.join(b_dir, "last_fold4.npz"), verbose=False,
    )
    tree_a, meta_a = ckpt_io.load_checkpoint(os.path.join(a_dir, "last_fold4.npz"))
    tree_b, meta_b = ckpt_io.load_checkpoint(os.path.join(b_dir, "last_fold4.npz"))
    assert meta_a["epoch"] == meta_b["epoch"] == 5
    leaves_a = jax.tree_util.tree_leaves(tree_a)
    leaves_b = jax.tree_util.tree_leaves(tree_b)
    assert len(leaves_a) == len(leaves_b)
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    # histories must agree too (same losses epoch by epoch)
    assert meta_a["history"] == meta_b["history"]
