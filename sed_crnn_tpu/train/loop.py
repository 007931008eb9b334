"""The experiment runner: jitted train/eval epochs, early stopping on 1-sec
segment ER, checkpointing, and k-fold orchestration.

Capability parity with both reference trainers (`sed.py:128-210` plain loop;
`train_lightning.py:27-63` + `crnn_lightning.py:79-200` Lightning stack), but
TPU-shaped: an entire epoch is ONE device program — `lax.scan` over steps,
each step fusing on-device batch sampling, forward, loss, backward, Adam
update, and prediction collection. The host touches the device once per
epoch (metrics scalars out, plots/logs/checkpoints), instead of per batch.
"""

from __future__ import annotations

import dataclasses
import os
import time
from functools import partial
from typing import Any, Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sed_crnn_tpu.core import checkpoint as ckpt_io
from sed_crnn_tpu.core.config import ExperimentConfig, TrainConfig
from sed_crnn_tpu.data.sampler import BalancedWindowSampler
from sed_crnn_tpu.models import get_model
from sed_crnn_tpu.models.crnn import CRNN
from sed_crnn_tpu.nn.layers import Ctx
from sed_crnn_tpu.ops import metrics as metrics_ops
from sed_crnn_tpu.ops.losses import make_loss
from sed_crnn_tpu.train import artifacts
from sed_crnn_tpu.train.optim import Adam, PlateauState, ReduceLROnPlateau


class TrainState(NamedTuple):
    params: Any
    model_state: Any
    opt_state: Any
    lr_scale: jnp.ndarray


@dataclasses.dataclass
class FoldResult:
    fold_id: int
    best_er: float
    best_f1: float
    best_epoch: int
    epochs_run: int
    history: Dict[str, List[float]]
    best_checkpoint: Optional[str]


def make_samplers(cfg: ExperimentConfig, fold_data: Dict[str, np.ndarray]):
    m = cfg.model
    t = cfg.train
    if t.sampler == "balanced":
        sampler_cls = BalancedWindowSampler
    elif t.sampler == "sequence":
        from sed_crnn_tpu.data.sampler import SequenceWindowSampler

        sampler_cls = SequenceWindowSampler
    else:
        raise ValueError(f"unknown sampler {t.sampler!r}")

    train_sampler = sampler_cls(
        fold_data["train_x"],
        fold_data["train_y"],
        seq_len_in=m.seq_len_in,
        seq_len_out=m.seq_len_out,
        augment=t.spec_augment,
    )
    val_sampler = sampler_cls(
        fold_data["val_x"],
        fold_data["val_y"],
        seq_len_in=m.seq_len_in,
        seq_len_out=m.seq_len_out,
        augment=False,
    )
    return train_sampler, val_sampler


class Trainer:
    """Compiled train/eval epoch programs for one fold."""

    def __init__(
        self,
        model: CRNN,
        tcfg: TrainConfig,
        train_sampler: BalancedWindowSampler,
        val_sampler: BalancedWindowSampler,
    ):
        self.model = model
        self.tcfg = tcfg
        self.train_sampler = train_sampler
        self.val_sampler = val_sampler
        self.loss_fn = make_loss(tcfg.loss, tcfg.focal_alpha, tcfg.focal_gamma)
        self.adam = Adam(
            learning_rate=tcfg.learning_rate,
            weight_decay=tcfg.weight_decay,
            grad_clip_norm=tcfg.grad_clip_norm,
        )
        self.plateau = (
            ReduceLROnPlateau(tcfg.plateau_factor, tcfg.plateau_patience)
            if tcfg.plateau_factor is not None
            else None
        )

    # ---- state ---------------------------------------------------------
    def init_state(self, key: jax.Array) -> TrainState:
        params, model_state = self.model.init(key)
        return TrainState(
            params=params,
            model_state=model_state,
            opt_state=self.adam.init(params),
            lr_scale=jnp.ones((), jnp.float32),
        )

    # ---- one epoch = one device program ---------------------------------
    def _train_step(self, state: TrainState, key: jax.Array):
        k_batch, k_drop = jax.random.split(key)
        x, y = self.train_sampler.sample_batch(k_batch, self.tcfg.batch_size)

        def loss_of(params):
            logits, new_mstate, _ = self.model.apply(
                params, state.model_state, x, Ctx(train=True, rng=k_drop)
            )
            return self.loss_fn(logits, y), (logits, new_mstate)

        (loss, (logits, new_mstate)), grads = jax.value_and_grad(
            loss_of, has_aux=True
        )(state.params)
        new_params, new_opt = self.adam.update(
            grads, state.opt_state, state.params, state.lr_scale
        )
        new_state = TrainState(new_params, new_mstate, new_opt, state.lr_scale)
        preds = jax.nn.sigmoid(logits)
        return new_state, (loss, preds, y)

    def _eval_step(self, state: TrainState, key: jax.Array):
        x, y = self.val_sampler.sample_batch(key, self.tcfg.batch_size)
        logits, _, _ = self.model.apply(
            state.params, state.model_state, x, Ctx(train=False)
        )
        loss = self.loss_fn(logits, y)
        return state, (loss, jax.nn.sigmoid(logits), y)

    @partial(jax.jit, static_argnums=(0, 3))
    def train_epoch(self, state: TrainState, key: jax.Array, n_steps: int):
        keys = jax.random.split(key, n_steps)
        state, (losses, preds, ys) = jax.lax.scan(self._train_step, state, keys)
        scores = self._epoch_scores(losses, preds, ys)
        return state, scores

    @partial(jax.jit, static_argnums=(0, 3))
    def eval_epoch(self, state: TrainState, key: jax.Array, n_steps: int):
        keys = jax.random.split(key, n_steps)
        _, (losses, preds, ys) = jax.lax.scan(self._eval_step, state, keys)
        return self._epoch_scores(losses, preds, ys)

    def _epoch_scores(self, losses, preds, ys):
        n, b, t, c = preds.shape
        flat_p = (preds > self.tcfg.threshold).reshape(n * b * t, c)
        flat_y = ys.reshape(n * b * t, c)
        scores = metrics_ops.all_scores(flat_p, flat_y, self.tcfg.frames_in_1_sec)
        scores["loss"] = jnp.mean(losses)
        return scores

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


_TRACK_KEYS = (
    ("loss_tr", "loss_val", "loss"),
    ("f1_1s_tr", "f1_1s_val", "f1_overall_1sec"),
    ("er_1s_tr", "er_1s_val", "er_overall_1sec"),
    ("f1_fr_tr", "f1_fr_val", "f1_frame"),
    ("er_fr_tr", "er_fr_val", "er_frame"),
)


def data_parallel_factory(mesh):
    """trainer_factory for `run_fold`/`run_experiment` that trains each fold
    data-parallel over ``mesh`` (see `parallel/data_parallel.py`)."""

    def factory(model, tcfg, train_sampler, val_sampler):
        from sed_crnn_tpu.parallel.data_parallel import DataParallelTrainer

        return DataParallelTrainer(model, tcfg, train_sampler, val_sampler, mesh)

    return factory


def run_fold(
    cfg: ExperimentConfig,
    fold_data: Dict[str, np.ndarray],
    fold_id: int,
    art_dir: str,
    seed: Optional[int] = None,
    resume_from: Optional[str] = None,
    verbose: bool = True,
    debug: bool = False,
    trainer_factory=None,
) -> FoldResult:
    """Train one fold to early stop; returns the best 1-sec segment ER.

    Mirrors the reference loop semantics: per-epoch train + balanced-resample
    val, metrics on binarized sigmoid predictions, best-ER checkpointing
    (`checkpoint_policy='best'`) or every-epoch files (`'all'`), early stop
    after `early_stop_patience` non-improving epochs (strict `>` for v1
    parity), optional ReduceLROnPlateau on val loss.
    """
    os.makedirs(art_dir, exist_ok=True)
    tcfg = cfg.train
    model = get_model(cfg.model)
    train_sampler, val_sampler = make_samplers(cfg, fold_data)
    make_trainer = trainer_factory or Trainer
    trainer = make_trainer(model, tcfg, train_sampler, val_sampler)

    seed = tcfg.seed if seed is None else seed
    key = jax.random.PRNGKey(seed + fold_id)
    key, init_key = jax.random.split(key)
    state = trainer.init_state(init_key)
    plateau_state = trainer.plateau.init() if trainer.plateau else None

    start_epoch = 1
    best_er, best_f1, best_epoch, no_imp = float("inf"), 0.0, 0, 0
    history: Dict[str, List[float]] = {k: [] for pair in _TRACK_KEYS for k in pair[:2]}

    if resume_from:
        tree, meta = ckpt_io.load_checkpoint(resume_from)
        state = TrainState(
            params=tree["params"],
            model_state=tree["model_state"],
            opt_state=type(state.opt_state)(
                step=jnp.asarray(tree["opt_state"]["step"]),
                mu=tree["opt_state"]["mu"],
                nu=tree["opt_state"]["nu"],
            ),
            lr_scale=jnp.asarray(tree["lr_scale"]),
        )
        start_epoch = int(meta.get("epoch", 0)) + 1
        best_er = float(meta.get("best_er", float("inf")))
        best_f1 = float(meta.get("best_f1", 0.0))
        best_epoch = int(meta.get("best_epoch", 0))
        no_imp = int(meta.get("no_imp", 0))
        key = jax.random.PRNGKey(int(meta.get("key_seed", seed + fold_id + start_epoch)))
        history = meta.get("history", history)
        if plateau_state is not None and "plateau" in meta:
            plateau_state = PlateauState(**meta["plateau"])

    n_train_steps = train_sampler.steps_per_epoch(tcfg.batch_size)
    n_val_steps = max(1, val_sampler.steps_per_epoch(tcfg.batch_size, drop_last=False))
    if n_train_steps < 1:
        raise ValueError(
            f"fold {fold_id}: {train_sampler.epoch_examples} examples "
            f"< batch size {tcfg.batch_size}"
        )

    best_ckpt_path = os.path.join(art_dir, f"best_fold{fold_id}.npz")
    jsonl_path = os.path.join(art_dir, f"train_fold{fold_id}.jsonl")
    t_start = time.time()
    epochs_run = start_epoch - 1

    for epoch in range(start_epoch, tcfg.max_epochs + 1):
        t_ep = time.time()
        key, k_tr, k_val = jax.random.split(key, 3)
        state, tr_scores = trainer.train_epoch(state, k_tr, n_train_steps)
        val_scores = trainer.eval_epoch(state, k_val, n_val_steps)
        tr = {k: float(v) for k, v in tr_scores.items()}
        val = {k: float(v) for k, v in val_scores.items()}
        epochs_run = epoch
        if debug:
            from sed_crnn_tpu.utils.debug import assert_tree_finite, guard_scores

            guard_scores(tr, epoch, fold_id)
            guard_scores(val, epoch, fold_id)
            assert_tree_finite(state.params, f"fold {fold_id} epoch {epoch} params")

        for tr_key, val_key, src in _TRACK_KEYS:
            history[tr_key].append(tr[src])
            history[val_key].append(val[src])

        if trainer.plateau:
            plateau_state = trainer.plateau.step(plateau_state, val["loss"])
            state = state._replace(
                lr_scale=jnp.asarray(plateau_state.lr_scale, jnp.float32)
            )

        val_er = val["er_overall_1sec"]
        improved = val_er < best_er
        if improved:
            best_er, best_f1, best_epoch, no_imp = val_er, val["f1_overall_1sec"], epoch, 0
        else:
            no_imp += 1

        dt = time.time() - t_ep
        if verbose:
            print(
                f"[Fold {fold_id}] [Epoch {epoch}/{tcfg.max_epochs}] "
                f"dt={dt:.1f}s total={(time.time()-t_start)/60:.1f}min | "
                f"train_loss={tr['loss']:.4f} val_loss={val['loss']:.4f} | "
                f"train_f1={tr['f1_overall_1sec']:.3f} val_f1={val['f1_overall_1sec']:.3f} | "
                f"val_ER={val_er:.3f}"
            )
        # BASELINE throughput unit: windows trained per wall-second, as
        # audio-hours/sec (sample_rate/hop frames per second of audio)
        frames_per_sec = cfg.frontend.sample_rate / cfg.frontend.hop_length
        audio_sec = n_train_steps * tcfg.batch_size * cfg.model.seq_len_in / frames_per_sec
        artifacts.append_jsonl(
            jsonl_path,
            {
                "fold": fold_id,
                "epoch": epoch,
                "epoch_sec": round(dt, 3),
                "audio_hours_per_sec": round(audio_sec / 3600.0 / dt, 4),
                "train": tr,
                "val": val,
                "lr_scale": float(state.lr_scale),
            },
        )

        meta = {
            "epoch": epoch,
            "fold": fold_id,
            "best_er": best_er,
            "best_f1": best_f1,
            "best_epoch": best_epoch,
            "no_imp": no_imp,
            "key_seed": seed + fold_id + epoch * 10007,
            "history": history,
        }
        if plateau_state is not None:
            meta["plateau"] = plateau_state._asdict()
        tree = {
            "params": state.params,
            "model_state": state.model_state,
            "opt_state": {
                "step": state.opt_state.step,
                "mu": state.opt_state.mu,
                "nu": state.opt_state.nu,
            },
            "lr_scale": state.lr_scale,
        }
        if improved:
            ckpt_io.save_checkpoint(best_ckpt_path, tree, meta)
        if tcfg.checkpoint_policy == "all":
            ckpt_io.save_checkpoint(
                os.path.join(art_dir, f"epoch{epoch:03d}-valer{val_er:.3f}_fold{fold_id}.npz"),
                tree,
                meta,
            )
        ckpt_io.save_checkpoint(os.path.join(art_dir, f"last_fold{fold_id}.npz"), tree, meta)

        if tcfg.plot_every and epoch % tcfg.plot_every == 0:
            artifacts.save_loss_curve(
                os.path.join(art_dir, f"loss_fold{fold_id}.png"),
                history["loss_tr"],
                history["loss_val"],
            )
            artifacts.save_metrics_panel(
                os.path.join(art_dir, f"metrics_fold{fold_id}.png"),
                history,
                train_cm=[[tr["tn"], tr["fp"]], [tr["fn"], tr["tp"]]],
                val_cm=[[val["tn"], val["fp"]], [val["fn"], val["tp"]]],
                epoch=epoch,
            )

        stop = (
            no_imp > tcfg.early_stop_patience
            if tcfg.early_stop_strict_greater
            else no_imp >= tcfg.early_stop_patience
        )
        if stop:
            break

    if verbose:
        print(f"fold {fold_id} best ER={best_er:.3f} @ epoch={best_epoch}")
    return FoldResult(
        fold_id=fold_id,
        best_er=best_er,
        best_f1=best_f1,
        best_epoch=best_epoch,
        epochs_run=epochs_run,
        history=history,
        best_checkpoint=best_ckpt_path if os.path.exists(best_ckpt_path) else None,
    )


def run_experiment(
    cfg: ExperimentConfig,
    folds: Dict[int, Dict[str, np.ndarray]],
    art_dir: str,
    verbose: bool = True,
    trainer_factory=None,
) -> Dict[str, Any]:
    """K-fold driver (reference `sed.py:144-207`, `train_lightning.py:26-63`):
    trains every fold, reports per-fold best ER and the cross-fold mean."""
    results = [
        run_fold(
            cfg, fold_data, fold_id, os.path.join(art_dir, f"fold{fold_id}"),
            verbose=verbose, trainer_factory=trainer_factory,
        )
        for fold_id, fold_data in sorted(folds.items())
    ]
    mean_er = float(np.mean([r.best_er for r in results]))
    mean_f1 = float(np.mean([r.best_f1 for r in results]))
    if verbose:
        print(f"average ER across folds: {mean_er:.3f} (F1 {mean_f1:.3f})")
    artifacts.append_jsonl(
        os.path.join(art_dir, "experiment.jsonl"),
        {
            "experiment": cfg.name,
            "mean_er": mean_er,
            "mean_f1": mean_f1,
            "folds": {
                str(r.fold_id): {"best_er": r.best_er, "best_epoch": r.best_epoch}
                for r in results
            },
        },
    )
    return {"mean_er": mean_er, "mean_f1": mean_f1, "folds": results}
