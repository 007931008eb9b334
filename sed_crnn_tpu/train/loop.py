"""The experiment runner: jitted train/eval epochs, early stopping on 1-sec
segment ER, checkpointing, and k-fold orchestration.

Capability parity with both reference trainers (`sed.py:128-210` plain loop;
`train_lightning.py:27-63` + `crnn_lightning.py:79-200` Lightning stack), but
TPU-shaped: an entire epoch is ONE device program — `lax.scan` over steps,
each step fusing on-device batch sampling, forward, loss, backward, Adam
update, and prediction collection. The host touches the device once per
epoch (metrics scalars out, plots/logs/checkpoints), instead of per batch.

Epoch programs COMPILE ONCE PER EXPERIMENT, not per fold: they are built by a
module-level cache keyed only on hashable statics (model config, train
config, sampler spec, padded step count), and fold data enters as traced
arguments — never as closure constants (which would silently bake fold A's
arrays into fold B's program). Folds of different sizes share one program by
zero-padding fold arrays to common shape buckets and masking padded trailing
steps with `lax.cond` (skipped steps leave the state untouched and contribute
zero rows that the masked scorer ignores). The reference recreates its cheap
Python loops per fold (`train_lightning.py:27-63`); here the expensive
artifact is the XLA program, so sharing it is the analogous economy.
"""

from __future__ import annotations

import dataclasses
import os
import time
from functools import lru_cache
from typing import Any, Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sed_crnn_tpu.core import checkpoint as ckpt_io
from sed_crnn_tpu.core.config import ExperimentConfig, TrainConfig
from sed_crnn_tpu.data.sampler import (
    BalancedWindowSampler,
    SequenceWindowSampler,
    WindowSpec,
    balanced_counts,
    sample_batch_from,
    sweep_batch_from,
)
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


@dataclasses.dataclass(frozen=True)
class CompilePlan:
    """Shared shape buckets across folds, so one compiled epoch program
    serves the whole k-fold experiment (computed by `plan_folds`)."""

    frame_bucket: int
    pos_bucket: Optional[int]
    neg_bucket: Optional[int]
    n_train_steps_max: int
    n_val_steps_max: int
    n_sweep_steps_max: int


def plan_folds(cfg: ExperimentConfig, folds: Dict[int, Dict[str, np.ndarray]]) -> CompilePlan:
    """Numpy-only scan of every fold's split sizes -> the maxima that become
    the shared padding buckets and padded epoch lengths."""
    m, t = cfg.model, cfg.train
    frame_b = pos_b = neg_b = 0
    tr_max = val_max = sweep_max = 1
    for fold in folds.values():
        for role in ("train", "val"):
            lab = np.asarray(fold[f"{role}_y"])
            frames = int(lab.shape[0])
            frame_b = max(frame_b, frames)
            if t.sampler == "balanced":
                n_pos, n_neg = balanced_counts(lab, m.seq_len_in)
                pos_b = max(pos_b, n_pos)
                neg_b = max(neg_b, n_neg)
                examples = 2 * n_pos
                if role == "train":
                    tr_max = max(tr_max, examples // t.batch_size)
                else:
                    val_max = max(val_max, -(-examples // t.batch_size))
            else:
                n_windows = frames // m.seq_len_in
                if role == "train":
                    tr_max = max(tr_max, max(1, -(-n_windows // t.batch_size)))
                else:
                    val_max = max(val_max, max(1, -(-n_windows // t.batch_size)))
            if role == "val":
                n_windows = frames // m.seq_len_in
                sweep_max = max(sweep_max, max(1, -(-n_windows // t.batch_size)))
    return CompilePlan(
        frame_bucket=frame_b,
        pos_bucket=pos_b if t.sampler == "balanced" else None,
        neg_bucket=neg_b if t.sampler == "balanced" else None,
        n_train_steps_max=tr_max,
        n_val_steps_max=val_max,
        n_sweep_steps_max=sweep_max,
    )


def make_samplers(
    cfg: ExperimentConfig,
    fold_data: Dict[str, np.ndarray],
    plan: Optional[CompilePlan] = None,
):
    m = cfg.model
    t = cfg.train
    buckets: Dict[str, Any] = {}
    if plan is not None:
        buckets["frame_bucket"] = plan.frame_bucket
    if t.sampler == "balanced":
        sampler_cls = BalancedWindowSampler
        if plan is not None:
            buckets["pos_bucket"] = plan.pos_bucket
            buckets["neg_bucket"] = plan.neg_bucket
    elif t.sampler == "sequence":
        sampler_cls = SequenceWindowSampler
    else:
        raise ValueError(f"unknown sampler {t.sampler!r}")

    train_sampler = sampler_cls(
        fold_data["train_x"],
        fold_data["train_y"],
        seq_len_in=m.seq_len_in,
        seq_len_out=m.seq_len_out,
        augment=t.spec_augment,
        **buckets,
    )
    val_sampler = sampler_cls(
        fold_data["val_x"],
        fold_data["val_y"],
        seq_len_in=m.seq_len_in,
        seq_len_out=m.seq_len_out,
        augment=False,
        **buckets,
    )
    return train_sampler, val_sampler


# ---------------------------------------------------------------------------
# Epoch programs — module-level, cached on hashable statics only
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _epoch_program(
    model: CRNN,
    tcfg: TrainConfig,
    spec: WindowSpec,
    n_steps_max: int,
    mode: str,
    dp,  # None | (Mesh, axis_name)
    static_full: bool = False,
    pad_mode: str = "cond",
):
    """Build + jit one epoch program (see `_build_epoch` for semantics)."""
    return jax.jit(
        _build_epoch(model, tcfg, spec, n_steps_max, mode, dp, static_full, pad_mode)
    )


def _build_epoch(
    model: CRNN,
    tcfg: TrainConfig,
    spec: WindowSpec,
    n_steps_max: int,
    mode: str,
    dp,  # None | (Mesh, axis_name)
    static_full: bool = False,
    pad_mode: str = "cond",
):
    """Build one epoch program (unjitted — `_epoch_program` jits it directly;
    `train/multiseed.py` vmaps it over a stacked-seed axis first).

    mode "train": (state, key, data, n_valid_steps) -> (state, scores)
    mode "eval":  (state, key, data, n_valid_steps) -> scores   (random draws)
    mode "sweep": (state, data, n_valid_steps) -> scores        (deterministic
                  full-split windowed sweep in time order, reference
                  `sed.py:169-176` semantics)

    Every fold-varying quantity is a traced argument; the lru_cache key holds
    only value-hashable configs, so fold B can never see fold A's data.

    ``pad_mode`` picks how padded trailing steps (>= n_valid_steps, present
    when folds share one program via `CompilePlan` buckets) are skipped:

    * "cond" (default): `lax.cond` skips the whole step — bit-identical to
      the exactly-sized epoch (the padded program's true branch compiles to
      the same computation).
    * "mask": every scan step EXECUTES; padded steps' state updates and
      outputs are discarded with a scalar `jnp.where` select, leaving no
      conditional in the program. Semantically equivalent, but re-fusion
      perturbs numerics at rounding level (~1e-6 f32 after 3 steps vs the
      exact program). A/B-measured against "cond" for compile cost by
      `scripts/compile_cost.py`.
    """
    loss_fn = make_loss(tcfg.loss, tcfg.focal_alpha, tcfg.focal_gamma)
    adam = Adam(
        learning_rate=tcfg.learning_rate,
        weight_decay=tcfg.weight_decay,
        grad_clip_norm=tcfg.grad_clip_norm,
    )
    ax = dp[1] if dp else None
    n_rep = dp[0].shape[ax] if dp else 1
    batch = tcfg.batch_size
    local_batch = batch // n_rep
    t_out = spec.seq_len_out
    n_classes = model.cfg.n_classes

    def _replica_key(key):
        return jax.random.fold_in(key, jax.lax.axis_index(ax)) if dp else key

    def train_step(state: TrainState, key: jax.Array, data):
        k_batch, k_drop = jax.random.split(_replica_key(key))
        x, y = sample_batch_from(spec, data, k_batch, local_batch)

        def loss_of(params):
            logits, new_mstate, _ = model.apply(
                params, state.model_state, x, Ctx(train=True, rng=k_drop, axis_name=ax)
            )
            loss = loss_fn(logits, y)
            if dp:
                # pmean INSIDE the differentiated function: the loss becomes
                # the global-batch mean and its transpose emits exactly one
                # gradient psum over ICI; grads come out replicated and equal
                # to the single-device global-batch gradient.
                loss = jax.lax.pmean(loss, ax)
            return loss, (logits, new_mstate)

        (loss, (logits, new_mstate)), grads = jax.value_and_grad(
            loss_of, has_aux=True
        )(state.params)
        new_params, new_opt = adam.update(
            grads, state.opt_state, state.params, state.lr_scale
        )
        new_state = TrainState(new_params, new_mstate, new_opt, state.lr_scale)
        return new_state, (loss, jax.nn.sigmoid(logits), y)

    def eval_step(state: TrainState, key: jax.Array, data):
        x, y = sample_batch_from(spec, data, _replica_key(key), local_batch)
        logits, _, _ = model.apply(
            state.params, state.model_state, x, Ctx(train=False)
        )
        loss = loss_fn(logits, y)
        if dp:
            loss = jax.lax.pmean(loss, ax)
        return state, (loss, jax.nn.sigmoid(logits), y)

    zeros_out = (
        jnp.zeros((), jnp.float32),
        jnp.zeros((local_batch, t_out, n_classes), jnp.float32),
        jnp.zeros((local_batch, t_out, n_classes), jnp.float32),
    )

    def scan_epoch(state, key, data, n_valid_steps):
        """Scan n_steps_max steps; steps >= n_valid_steps are skipped per
        ``pad_mode``. When the caller statically runs every step
        (``static_full``), no skip machinery is emitted at all."""
        step_fn = train_step if mode == "train" else eval_step
        idx = jnp.arange(n_steps_max)
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(idx)

        def body(st, inp):
            k, i = inp
            if static_full:
                return step_fn(st, k, data)
            if pad_mode == "mask":
                new_st, out = step_fn(st, k, data)
                valid = i < n_valid_steps
                sel = lambda a, b: jnp.where(valid, a, b)  # noqa: E731
                return (
                    jax.tree.map(sel, new_st, st),
                    jax.tree.map(sel, out, zeros_out),
                )
            return jax.lax.cond(
                i < n_valid_steps,
                lambda s: step_fn(s, k, data),
                lambda s: (s, zeros_out),
                st,
            )

        state, (losses, preds, ys) = jax.lax.scan(body, state, (keys, idx))
        return state, losses, preds, ys

    def _scores(losses, preds, ys, n_valid_steps):
        n, b, t, c = preds.shape
        flat_p = (preds > tcfg.threshold).reshape(n * b * t, c)
        flat_y = ys.reshape(n * b * t, c)
        n_valid_rows = n_valid_steps * b * t
        scores = metrics_ops.all_scores_masked(
            flat_p, flat_y, tcfg.frames_in_1_sec, n_valid_rows
        )
        scores["loss"] = jnp.sum(losses) / jnp.maximum(n_valid_steps, 1)
        return scores

    if mode in ("train", "eval"):

        def epoch(state, key, data, n_valid_steps):
            if dp:
                from jax import shard_map
                from jax.sharding import PartitionSpec as P

                sharded = shard_map(
                    scan_epoch,
                    mesh=dp[0],
                    in_specs=(P(), P(), P(), P()),
                    out_specs=(P(), P(), P(None, ax), P(None, ax)),
                    check_vma=False,
                )
                state, losses, preds, ys = sharded(state, key, data, n_valid_steps)
            else:
                state, losses, preds, ys = scan_epoch(state, key, data, n_valid_steps)
            scores = _scores(losses, preds, ys, n_valid_steps)
            if mode == "train":
                return state, scores
            return scores

        return epoch

    # ---- mode == "sweep": deterministic full-split windowed evaluation ----

    def sweep_step(state, i, data):
        base = i * batch + (jax.lax.axis_index(ax) * local_batch if dp else 0)
        idx = base + jnp.arange(local_batch)
        x, y, valid = sweep_batch_from(spec, data, idx)
        logits, _, _ = model.apply(
            state.params, state.model_state, x, Ctx(train=False)
        )
        w = valid.astype(jnp.float32)[:, None, None]
        elem = loss_fn(logits, y, reduction="none")
        loss_sum = jnp.sum(elem * w)
        n_elem = jnp.sum(w) * (t_out * n_classes)
        if dp:
            loss_sum = jax.lax.psum(loss_sum, ax)
            n_elem = jax.lax.psum(n_elem, ax)
        # Zero invalid windows so the stacked stream needs only a row-count mask.
        return loss_sum, n_elem, jax.nn.sigmoid(logits) * w, y * w

    sweep_zeros = (
        jnp.zeros((), jnp.float32),
        jnp.zeros((), jnp.float32),
        jnp.zeros((local_batch, t_out, n_classes), jnp.float32),
        jnp.zeros((local_batch, t_out, n_classes), jnp.float32),
    )

    def sweep_scan(state, data, n_valid_steps):
        # Sweep steps are self-masking: `sweep_batch_from` clamps
        # out-of-range window indices and zero-weights them, so steps beyond
        # the valid count contribute exact zeros with no guard at all —
        # except in "cond" mode, kept for the compile-cost A/B.
        def body(carry, i):
            if static_full or pad_mode == "mask":
                return carry, sweep_step(state, i, data)
            out = jax.lax.cond(
                i < n_valid_steps,
                lambda _: sweep_step(state, i, data),
                lambda _: sweep_zeros,
                None,
            )
            return carry, out

        _, outs = jax.lax.scan(body, None, jnp.arange(n_steps_max))
        return outs

    def sweep_epoch(state, data, n_valid_steps):
        if dp:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            sharded = shard_map(
                sweep_scan,
                mesh=dp[0],
                in_specs=(P(), P(), P()),
                out_specs=(P(), P(), P(None, ax), P(None, ax)),
                check_vma=False,
            )
            loss_sums, n_elems, preds, ys = sharded(state, data, n_valid_steps)
        else:
            loss_sums, n_elems, preds, ys = sweep_scan(state, data, n_valid_steps)
        n, b, t, c = preds.shape
        flat_p = (preds > tcfg.threshold).reshape(n * b * t, c)
        flat_y = ys.reshape(n * b * t, c)
        # Valid windows are a time-ordered prefix of the stacked stream.
        n_windows = data["n_frames"] // spec.seq_len_in
        scores = metrics_ops.all_scores_masked(
            flat_p, flat_y, tcfg.frames_in_1_sec, n_windows * t
        )
        scores["loss"] = jnp.sum(loss_sums) / jnp.maximum(jnp.sum(n_elems), 1.0)
        return scores

    return sweep_epoch


class Trainer:
    """Train/eval epoch programs for one fold — compiled programs are shared
    across Trainer instances (and therefore folds) via `_epoch_program`."""

    def __init__(
        self,
        model: CRNN,
        tcfg: TrainConfig,
        train_sampler,
        val_sampler,
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

    def _dp(self):
        """(mesh, axis_name) for data-parallel subclasses; None single-device."""
        return None

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
    def train_epoch(
        self, state: TrainState, key: jax.Array, n_steps: int,
        n_steps_max: Optional[int] = None,
    ):
        n_max = int(n_steps if n_steps_max is None else n_steps_max)
        fn = _epoch_program(
            self.model, self.tcfg, self.train_sampler.spec, n_max, "train",
            self._dp(), n_steps_max is None,
        )
        return fn(state, key, self.train_sampler.data, jnp.int32(n_steps))

    def eval_epoch(
        self, state: TrainState, key: jax.Array, n_steps: int,
        n_steps_max: Optional[int] = None,
    ):
        n_max = int(n_steps if n_steps_max is None else n_steps_max)
        fn = _epoch_program(
            self.model, self.tcfg, self.val_sampler.spec, n_max, "eval",
            self._dp(), n_steps_max is None,
        )
        return fn(state, key, self.val_sampler.data, jnp.int32(n_steps))

    def eval_sweep(
        self, state: TrainState, n_steps: Optional[int] = None,
        n_steps_max: Optional[int] = None,
    ):
        """Deterministic full-split validation: every aligned window of the
        val split in time order (reference `sed.py:169-176` evaluates the
        full split each epoch). Same params => bit-identical scores."""
        if n_steps is None:
            n_steps = self.val_sampler.sweep_steps(self.tcfg.batch_size)
        n_max = int(n_steps if n_steps_max is None else n_steps_max)
        fn = _epoch_program(
            self.model, self.tcfg, self.val_sampler.spec, n_max, "sweep",
            self._dp(), n_steps_max is None,
        )
        return fn(state, self.val_sampler.data, jnp.int32(n_steps))


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


def _use_full_sweep(tcfg: TrainConfig) -> bool:
    if tcfg.val_full_sweep is not None:
        return tcfg.val_full_sweep
    # The legacy DCASE pipeline evaluates the full val split deterministically
    # every epoch (`sed.py:169-176`); the hit-detection pipelines validate by
    # balanced resampling (`sed.py:151-152` uses HitWindowDataset for val).
    return tcfg.sampler == "sequence"


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
    plan: Optional[CompilePlan] = None,
) -> FoldResult:
    """Train one fold to early stop; returns the best 1-sec segment ER.

    Mirrors the reference loop semantics: per-epoch train + val (balanced
    resample, or a deterministic full-split sweep when
    ``val_full_sweep``/the sequence sampler applies), metrics on binarized
    sigmoid predictions, best-ER checkpointing (`checkpoint_policy='best'`)
    or every-epoch files (`'all'`), early stop after `early_stop_patience`
    non-improving epochs (strict `>` for v1 parity), optional
    ReduceLROnPlateau on val loss. Passing ``plan`` (from `plan_folds`) pads
    fold arrays/steps to shared buckets so every fold reuses one compiled
    epoch program.
    """
    os.makedirs(art_dir, exist_ok=True)
    tcfg = cfg.train
    model = get_model(cfg.model)
    train_sampler, val_sampler = make_samplers(cfg, fold_data, plan)
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
        if "rng_key" in tree:
            # Bit-faithful resume: the checkpoint carries the live PRNG key
            # (the carry after this epoch's split), so the resumed run
            # continues the EXACT key chain the uninterrupted run would have
            # followed — sampling and dropout streams included.
            key = jnp.asarray(tree["rng_key"])
        else:
            # Legacy checkpoints (pre round-3) lack the key; fall back to a
            # deterministic-but-divergent reseed.
            key = jax.random.PRNGKey(
                int(meta.get("key_seed", seed + fold_id + start_epoch))
            )
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
    full_sweep = _use_full_sweep(tcfg)
    n_sweep_steps = val_sampler.sweep_steps(tcfg.batch_size)
    n_tr_max = plan.n_train_steps_max if plan else None
    n_val_max = plan.n_val_steps_max if plan else None
    n_sweep_max = plan.n_sweep_steps_max if plan else None

    best_ckpt_path = os.path.join(art_dir, f"best_fold{fold_id}.npz")
    jsonl_path = os.path.join(art_dir, f"train_fold{fold_id}.jsonl")
    t_start = time.time()
    epochs_run = start_epoch - 1

    def finalize(pend) -> bool:
        """Host-side half of one epoch: fetch scores, track/early-stop,
        log, checkpoint, plot. Runs while the NEXT epoch executes on device
        (pipelined mode). Returns True when early stop triggers."""
        nonlocal best_er, best_f1, best_epoch, no_imp, epochs_run
        epoch, t_ep, ep_state, tr_scores, val_scores, ep_plateau, ep_key = pend
        tr = {k: float(v) for k, v in tr_scores.items()}
        val = {k: float(v) for k, v in val_scores.items()}
        epochs_run = epoch
        if debug:
            from sed_crnn_tpu.utils.debug import assert_tree_finite, guard_scores

            guard_scores(tr, epoch, fold_id)
            guard_scores(val, epoch, fold_id)
            assert_tree_finite(ep_state.params, f"fold {fold_id} epoch {epoch} params")

        for tr_key, val_key, src in _TRACK_KEYS:
            history[tr_key].append(tr[src])
            history[val_key].append(val[src])

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
                "lr_scale": float(ep_state.lr_scale),
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
        if ep_plateau is not None:
            meta["plateau"] = {
                "best": float(ep_plateau.best),
                "num_bad": int(ep_plateau.num_bad),
                "lr_scale": float(ep_plateau.lr_scale),
            }
        tree = {
            "params": ep_state.params,
            "model_state": ep_state.model_state,
            "opt_state": {
                "step": ep_state.opt_state.step,
                "mu": ep_state.opt_state.mu,
                "nu": ep_state.opt_state.nu,
            },
            "lr_scale": ep_state.lr_scale,
            # The live key carry AFTER this epoch's split — resuming from
            # this checkpoint continues the exact RNG chain (see resume_from).
            "rng_key": np.asarray(ep_key),
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

        return (
            no_imp > tcfg.early_stop_patience
            if tcfg.early_stop_strict_greater
            else no_imp >= tcfg.early_stop_patience
        )

    # Pipelined dispatch: epoch k+1 is dispatched (train + val + device-side
    # plateau) BEFORE epoch k's scores are fetched on the host, so the chip
    # never idles through host logging/checkpointing — jax's async dispatch
    # overlaps them. Semantics match the sequential loop exactly (same key
    # stream, same plateau/early-stop decisions, same checkpoints); the only
    # cost is one speculative epoch of device work when early stop fires,
    # whose results are discarded unlogged. Debug mode stays sequential so
    # guard failures point at the epoch that produced them.
    pipeline = not debug
    pending = None
    for epoch in range(start_epoch, tcfg.max_epochs + 1):
        t_ep = time.time()
        key, k_tr, k_val = jax.random.split(key, 3)
        state, tr_scores = trainer.train_epoch(state, k_tr, n_train_steps, n_tr_max)
        if full_sweep:
            val_scores = trainer.eval_sweep(state, n_sweep_steps, n_sweep_max)
        else:
            val_scores = trainer.eval_epoch(state, k_val, n_val_steps, n_val_max)
        if trainer.plateau:
            # Pure-jnp plateau step: stays on device, no host sync.
            plateau_state = trainer.plateau.step(plateau_state, val_scores["loss"])
            state = state._replace(
                lr_scale=jnp.asarray(plateau_state.lr_scale, jnp.float32)
            )
        current = (epoch, t_ep, state, tr_scores, val_scores, plateau_state, key)
        if pipeline:
            if pending is not None and finalize(pending):
                pending = None  # early stop: drop the speculative epoch
                break
            pending = current
        else:
            if finalize(current):
                break
    if pending is not None:
        finalize(pending)

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
    share_compile: bool = True,
) -> Dict[str, Any]:
    """K-fold driver (reference `sed.py:144-207`, `train_lightning.py:26-63`):
    trains every fold, reports per-fold best ER and the cross-fold mean.
    With ``share_compile`` (default), fold arrays are padded to common
    buckets so the epoch programs compile once for the whole experiment."""
    plan = plan_folds(cfg, folds) if share_compile and len(folds) > 1 else None
    results = [
        run_fold(
            cfg, fold_data, fold_id, os.path.join(art_dir, f"fold{fold_id}"),
            verbose=verbose, trainer_factory=trainer_factory, plan=plan,
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
