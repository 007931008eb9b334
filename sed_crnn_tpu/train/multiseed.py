"""Multi-seed training: N independent runs of one fold as ONE device program.

The reference's headline numbers are "averaged over 4 cross-validation folds,
mean of 5 runs" (`README.md:62-64`) — five repetitions of the whole 4-fold
experiment, run sequentially. On TPU the natural shape for that protocol is a
stacked-seed axis: `jax.vmap` lifts the single-fold epoch program
(`train/loop.py::_build_epoch`) over a leading axis of N parameter trees, N
optimizer states, and N RNG streams, so every conv/GRU/Adam op becomes a
batched op over seeds and the MXU trains all repetitions concurrently. One
XLA program, one compile, N runs.

The seed axis is embarrassingly parallel, which also makes it the cheapest
possible multi-chip axis: pass a `Mesh` and the stacked state is sharded over
it (`jax.jit` in/out shardings on the leading axis) — no collectives at all
in the steady state, perfect scaling over ICI. This composes with, and for
this protocol dominates, batch data-parallelism: shard seeds first, shard the
batch only when chips outnumber seeds.

Per-seed semantics match `run_fold` exactly:

* seed s's RNG chain is `PRNGKey(s + fold_id)` with the same per-epoch
  3-way splits, so seed s here and `run_fold(seed=s)` sample identical
  windows and dropout masks;
* early stopping is tracked per seed — a seed whose patience is exhausted
  has its tracking FROZEN (history, best-ER, checkpoints stop at its stop
  epoch, exactly what the individual run would have recorded) while the
  stacked program keeps training the surviving seeds;
* checkpoints land under `art_dir/seed{s}/` in `run_fold`'s layout
  (`best_fold{k}.npz`, `last_fold{k}.npz`, per-epoch files under the "all"
  policy, `train_fold{k}.jsonl`), each carrying its own live RNG key — so a
  seed can be resumed bit-faithfully BY `run_fold(resume_from=...)`.

Numerics caveat: XLA may fuse the batched-over-seeds ops differently than the
per-seed programs, so losses can drift from `run_fold`'s at rounding level
(~1e-6 relative per step); decisions (early stop, best epoch) are preserved
on any non-degenerate task. Exact-chain RNG equality is unaffected.
"""

from __future__ import annotations

import dataclasses
import os
import time
from functools import lru_cache
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sed_crnn_tpu.core import checkpoint as ckpt_io
from sed_crnn_tpu.core.config import ExperimentConfig, TrainConfig
from sed_crnn_tpu.data.sampler import WindowSpec
from sed_crnn_tpu.models import get_model
from sed_crnn_tpu.models.crnn import CRNN
from sed_crnn_tpu.train import artifacts
from sed_crnn_tpu.train.loop import (
    _TRACK_KEYS,
    CompilePlan,
    FoldResult,
    Trainer,
    TrainState,
    _build_epoch,
    _use_full_sweep,
    make_samplers,
    plan_folds,
)
from sed_crnn_tpu.train.optim import PlateauState


# Default spacing between auto-generated run seeds. `run_fold` keys each run
# as PRNGKey(seed + fold_id); consecutive run seeds would collide across
# (run, fold) pairs — run r of fold f and run r+1 of fold f-1 would train on
# identical RNG streams. A prime stride far above any fold count keeps every
# (run, fold) key distinct.
SEED_STRIDE = 7919


def run_seeds(base_seed: int, n_runs: int) -> List[int]:
    """The default seed list for an N-run experiment."""
    return [base_seed + r * SEED_STRIDE for r in range(n_runs)]


@lru_cache(maxsize=None)
def _multiseed_program(
    model: CRNN,
    tcfg: TrainConfig,
    spec: WindowSpec,
    n_steps_max: int,
    mode: str,
    mesh,  # None | jax.sharding.Mesh (seed axis = first mesh axis)
    static_full: bool = False,
):
    """vmap one epoch program over a leading seed axis, optionally sharding
    that axis over ``mesh``. Cached on the same hashable statics as
    `_epoch_program`, so all folds (and epochs) of an experiment share one
    compiled program per (mode, padded-step-count)."""
    base = _build_epoch(model, tcfg, spec, n_steps_max, mode, None, static_full, "cond")
    if mode in ("train", "eval"):
        fn = jax.vmap(base, in_axes=(0, 0, None, None))
    else:  # sweep: (state, data, n_valid_steps)
        fn = jax.vmap(base, in_axes=(0, None, None))
    if mesh is None:
        return jax.jit(fn)

    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    shard = NamedSharding(mesh, P(axis))   # leading (seed) axis split
    repl = NamedSharding(mesh, P())        # fold data/step counts replicated
    if mode == "train":
        return jax.jit(
            fn,
            in_shardings=(shard, shard, repl, repl),
            out_shardings=(shard, shard),
        )
    if mode == "eval":
        return jax.jit(
            fn, in_shardings=(shard, shard, repl, repl), out_shardings=shard
        )
    return jax.jit(fn, in_shardings=(shard, repl, repl), out_shardings=shard)


class MultiSeedTrainer(Trainer):
    """`Trainer` whose state carries a leading seed axis. ``mesh`` (optional)
    shards that axis over devices; seeds must divide the mesh size evenly."""

    def __init__(self, model, tcfg, train_sampler, val_sampler, n_seeds: int,
                 mesh=None):
        # The Pallas GRU recurrence keeps full-sequence residuals VMEM-
        # resident (ops/pallas/gru_scan.py); at the flagship shape its
        # backward already sits near the VMEM ceiling, and vmapping over a
        # seed axis turns the pallas_call into a grid whose double-buffered
        # per-seed windows (4 x 32 MB at B=128 T=256 H=32) exceed scoped
        # VMEM — XLA aborts at compile. Stacked training therefore always
        # runs the lax.scan recurrence (identical math; the kernel's win is
        # ~1.6 ms/step on the flagship, small against the stacked program).
        backend = getattr(model.cfg, "gru_backend", "auto")
        resolves_pallas = backend == "pallas" or (
            backend == "auto"
            and model.seq_len_out >= 64
            and jax.default_backend() == "tpu"
        )
        if resolves_pallas:
            model = get_model(dataclasses.replace(model.cfg, gru_backend="xla"))
        super().__init__(model, tcfg, train_sampler, val_sampler)
        if mesh is not None:
            n_dev = int(np.prod(list(mesh.shape.values())))
            if n_seeds % n_dev:
                raise ValueError(
                    f"{n_seeds} seeds cannot shard evenly over a {n_dev}-device"
                    f" mesh — pass a seed count divisible by the mesh size"
                )
        self.n_seeds = n_seeds
        self.mesh = mesh

    def init_states(self, init_keys: jax.Array) -> TrainState:
        """Stacked `TrainState`: leaf i of every tree belongs to seed i."""

        def one(k):
            params, model_state = self.model.init(k)
            return TrainState(
                params=params,
                model_state=model_state,
                opt_state=self.adam.init(params),
                lr_scale=jnp.ones((), jnp.float32),
            )

        return jax.vmap(one)(init_keys)

    def train_epoch(self, state, keys, n_steps, n_steps_max=None):
        n_max = int(n_steps if n_steps_max is None else n_steps_max)
        fn = _multiseed_program(
            self.model, self.tcfg, self.train_sampler.spec, n_max, "train",
            self.mesh, n_steps_max is None,
        )
        return fn(state, keys, self.train_sampler.data, jnp.int32(n_steps))

    def eval_epoch(self, state, keys, n_steps, n_steps_max=None):
        n_max = int(n_steps if n_steps_max is None else n_steps_max)
        fn = _multiseed_program(
            self.model, self.tcfg, self.val_sampler.spec, n_max, "eval",
            self.mesh, n_steps_max is None,
        )
        return fn(state, keys, self.val_sampler.data, jnp.int32(n_steps))

    def eval_sweep(self, state, n_steps=None, n_steps_max=None):
        if n_steps is None:
            n_steps = self.val_sampler.sweep_steps(self.tcfg.batch_size)
        n_max = int(n_steps if n_steps_max is None else n_steps_max)
        fn = _multiseed_program(
            self.model, self.tcfg, self.val_sampler.spec, n_max, "sweep",
            self.mesh, n_steps_max is None,
        )
        return fn(state, self.val_sampler.data, jnp.int32(n_steps))


def _slice_seed(host_tree, i: int):
    return jax.tree.map(lambda a: a[i], host_tree)


def shard_lanes(tree, mesh):
    """Lane-stacked host tree -> global `jax.Array`s sharded over the mesh's
    first axis. The multi-host entry point: every process passes the SAME
    host-replicated (numpy) value and contributes its addressable shards —
    required because jit rejects numpy inputs with non-trivial multi-host
    shardings. Single-host callers don't need this (jit shards uncommitted
    arrays itself)."""
    from jax.sharding import NamedSharding, PartitionSpec

    shard = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))

    def one(a):
        a = np.asarray(a)
        return jax.make_array_from_callback(a.shape, shard, lambda idx: a[idx])

    return jax.tree.map(one, tree)


def run_fold_multiseed(
    cfg: ExperimentConfig,
    fold_data: Dict[str, np.ndarray],
    fold_id: int,
    art_dir: str,
    seeds: Sequence[int],
    mesh=None,
    verbose: bool = True,
    plan: Optional[CompilePlan] = None,
    lr_scales: Optional[Sequence[float]] = None,
) -> List[FoldResult]:
    """Train ``len(seeds)`` independent runs of one fold concurrently; returns
    one `FoldResult` per seed, ordered like ``seeds`` (the reference's
    "mean of 5 runs" repetitions, `README.md:62-64`, in one program).

    ``lr_scales`` (optional, one per lane) multiplies each lane's base
    learning rate — the stacked axis then doubles as a LEARNING-RATE SWEEP:
    N candidate rates train concurrently in the same program (lr_scale is a
    traced array, so the sweep costs zero extra compiles). Combine with
    repeated seeds deliberately (pass distinct seeds for run-repetition
    semantics, or the same data seed with different rates by varying seeds
    trivially). Under a plateau schedule each lane's schedule starts from
    its own base scale and decays independently."""
    seeds = list(seeds)
    n = len(seeds)
    if n < 1:
        raise ValueError("need at least one seed")
    if lr_scales is not None and len(lr_scales) != n:
        raise ValueError(
            f"{len(lr_scales)} lr_scales for {n} seeds — need one per lane"
        )
    if len(set(seeds)) != n and lr_scales is None:
        raise ValueError(f"duplicate seeds in {seeds} — runs would be identical")
    if len(set(zip(seeds, lr_scales or [0.0] * n))) != n:
        raise ValueError(
            "duplicate (seed, lr_scale) lanes — runs would be identical"
        )
    tcfg = cfg.train
    model = get_model(cfg.model)
    train_sampler, val_sampler = make_samplers(cfg, fold_data, plan)
    trainer = MultiSeedTrainer(model, tcfg, train_sampler, val_sampler, n, mesh)

    # Per-seed RNG chains identical to run_fold(seed=s): PRNGKey(s + fold),
    # one 2-way split for init, then a 3-way split per epoch.
    base_keys = jnp.stack([jax.random.PRNGKey(s + fold_id) for s in seeds])
    split2 = jax.jit(jax.vmap(lambda k: jax.random.split(k)))
    split3 = jax.jit(jax.vmap(lambda k: jax.random.split(k, 3)))
    ks = split2(base_keys)
    keys, init_keys = ks[:, 0], ks[:, 1]
    state = trainer.init_states(init_keys)
    base_scale = (
        jnp.ones((n,), jnp.float32)
        if lr_scales is None
        else jnp.asarray(lr_scales, jnp.float32)
    )
    if lr_scales is not None:
        state = state._replace(lr_scale=base_scale)
    plateau_state = (
        PlateauState(
            best=jnp.full((n,), jnp.inf, jnp.float32),
            num_bad=jnp.zeros((n,), jnp.int32),
            lr_scale=base_scale,
        )
        if trainer.plateau
        else None
    )

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

    if lr_scales is None:
        seed_dirs = [os.path.join(art_dir, f"seed{s}") for s in seeds]
    else:
        # LR-sweep lanes may repeat a seed; the scale disambiguates the dir.
        seed_dirs = [
            os.path.join(art_dir, f"seed{s}_lr{lr:g}")
            for s, lr in zip(seeds, lr_scales)
        ]
    for d in seed_dirs:
        os.makedirs(d, exist_ok=True)

    best_er = np.full(n, np.inf)
    best_f1 = np.zeros(n)
    best_epoch = np.zeros(n, np.int64)
    no_imp = np.zeros(n, np.int64)
    stop_epoch = np.zeros(n, np.int64)  # 0 = still running
    histories: List[Dict[str, List[float]]] = [
        {k: [] for pair in _TRACK_KEYS for k in pair[:2]} for _ in range(n)
    ]
    frames_per_sec = cfg.frontend.sample_rate / cfg.frontend.hop_length
    audio_sec = n_train_steps * tcfg.batch_size * cfg.model.seq_len_in / frames_per_sec
    t_start = time.time()

    epoch = 0  # stays 0 if max_epochs < 1 (epochs_run then reports 0)
    for epoch in range(1, tcfg.max_epochs + 1):
        t_ep = time.time()
        ks = split3(keys)
        keys, k_tr, k_val = ks[:, 0], ks[:, 1], ks[:, 2]
        state, tr_scores = trainer.train_epoch(state, k_tr, n_train_steps, n_tr_max)
        if full_sweep:
            val_scores = trainer.eval_sweep(state, n_sweep_steps, n_sweep_max)
        else:
            val_scores = trainer.eval_epoch(state, k_val, n_val_steps, n_val_max)
        if trainer.plateau:
            # Pure elementwise jnp — stacked PlateauState steps all seeds at once.
            plateau_state = trainer.plateau.step(plateau_state, val_scores["loss"])
            state = state._replace(
                lr_scale=jnp.asarray(plateau_state.lr_scale, jnp.float32)
            )

        # One host materialization per epoch for everything: scores for all
        # seeds, the stacked state (checkpoints slice it in numpy), the key
        # carries (each seed's checkpoint stores its live chain).
        tr_h, val_h, state_h, keys_h = jax.device_get(
            (tr_scores, val_scores, state, keys)
        )
        plateau_h = jax.device_get(plateau_state) if plateau_state is not None else None
        dt = time.time() - t_ep

        for i, s in enumerate(seeds):
            if stop_epoch[i]:
                continue  # frozen: this seed's individual run already ended
            tr = {k: float(v[i]) for k, v in tr_h.items()}
            val = {k: float(v[i]) for k, v in val_h.items()}
            for tr_key, val_key, src in _TRACK_KEYS:
                histories[i][tr_key].append(tr[src])
                histories[i][val_key].append(val[src])
            val_er = val["er_overall_1sec"]
            improved = val_er < best_er[i]
            if improved:
                best_er[i], best_f1[i] = val_er, val["f1_overall_1sec"]
                best_epoch[i], no_imp[i] = epoch, 0
            else:
                no_imp[i] += 1

            meta = {
                "epoch": epoch,
                "fold": fold_id,
                "seed": s,
                **(
                    {"base_lr_scale": float(lr_scales[i])}
                    if lr_scales is not None
                    else {}
                ),
                "best_er": float(best_er[i]),
                "best_f1": float(best_f1[i]),
                "best_epoch": int(best_epoch[i]),
                "no_imp": int(no_imp[i]),
                "history": histories[i],
            }
            if plateau_h is not None:
                meta["plateau"] = {
                    "best": float(plateau_h.best[i]),
                    "num_bad": int(plateau_h.num_bad[i]),
                    "lr_scale": float(plateau_h.lr_scale[i]),
                }
            seed_state = _slice_seed(state_h, i)
            tree = {
                "params": seed_state.params,
                "model_state": seed_state.model_state,
                "opt_state": {
                    "step": seed_state.opt_state.step,
                    "mu": seed_state.opt_state.mu,
                    "nu": seed_state.opt_state.nu,
                },
                "lr_scale": seed_state.lr_scale,
                # run_fold(resume_from=...) continues this exact chain.
                "rng_key": np.asarray(keys_h[i]),
            }
            if improved:
                ckpt_io.save_checkpoint(
                    os.path.join(seed_dirs[i], f"best_fold{fold_id}.npz"), tree, meta
                )
            if tcfg.checkpoint_policy == "all":
                ckpt_io.save_checkpoint(
                    os.path.join(
                        seed_dirs[i],
                        f"epoch{epoch:03d}-valer{val_er:.3f}_fold{fold_id}.npz",
                    ),
                    tree,
                    meta,
                )
            ckpt_io.save_checkpoint(
                os.path.join(seed_dirs[i], f"last_fold{fold_id}.npz"), tree, meta
            )
            artifacts.append_jsonl(
                os.path.join(seed_dirs[i], f"train_fold{fold_id}.jsonl"),
                {
                    "fold": fold_id,
                    "seed": s,
                    "epoch": epoch,
                    "epoch_sec": round(dt, 3),
                    "audio_hours_per_sec": round(n * audio_sec / 3600.0 / dt, 4),
                    "train": tr,
                    "val": val,
                    "lr_scale": float(np.asarray(seed_state.lr_scale)),
                },
            )
            if tcfg.plot_every and epoch % tcfg.plot_every == 0:
                artifacts.save_loss_curve(
                    os.path.join(seed_dirs[i], f"loss_fold{fold_id}.png"),
                    histories[i]["loss_tr"],
                    histories[i]["loss_val"],
                )
            stopped = (
                no_imp[i] > tcfg.early_stop_patience
                if tcfg.early_stop_strict_greater
                else no_imp[i] >= tcfg.early_stop_patience
            )
            if stopped:
                stop_epoch[i] = epoch

        live = int(np.sum(stop_epoch == 0))
        if verbose:
            ers = "/".join(f"{v:.3f}" for v in val_h["er_overall_1sec"])
            print(
                f"[Fold {fold_id}] [Epoch {epoch}/{tcfg.max_epochs}] "
                f"dt={dt:.1f}s total={(time.time()-t_start)/60:.1f}min | "
                f"{n} seeds ({live} live) | val_ER={ers}"
            )
        if live == 0:
            break

    results = []
    for i, s in enumerate(seeds):
        best_path = os.path.join(seed_dirs[i], f"best_fold{fold_id}.npz")
        results.append(
            FoldResult(
                fold_id=fold_id,
                best_er=float(best_er[i]),
                best_f1=float(best_f1[i]),
                best_epoch=int(best_epoch[i]),
                epochs_run=int(stop_epoch[i]) if stop_epoch[i] else epoch,
                history=histories[i],
                best_checkpoint=best_path if os.path.exists(best_path) else None,
            )
        )
        if verbose:
            print(
                f"fold {fold_id} seed {s}: best ER={best_er[i]:.3f} "
                f"@ epoch={int(best_epoch[i])}"
            )
    return results


# Measured on the real chip (scripts/profile_batch_spill.py,
# scripts/hw_batch_r3.py multiseed_check): past an effective conv batch of
# ~256, XLA splits the BatchNorm passes out of the conv fusions into
# standalone HBM loop fusions (~2.5 GB/step of new traffic on v1), and a
# 4-seed stacked run drops to 0.60-0.63x the aggregate rate of sequential
# runs. Below the split point stacking wins (one program, MXU otherwise
# underutilized by small models).
BN_FUSION_SPLIT_BATCH = 256
_BIG_CONV_CHANNELS = 128  # the split was measured on conv-128 trunks


def choose_runs_mode(cfg: ExperimentConfig, n_runs: int, mesh=None) -> str:
    """Pick the faster multiseed execution mode from the measured BatchNorm
    fusion-split point instead of making the user read a help string.

    * a seed-sharded mesh divides the per-device stacked batch, and
      sequential mode cannot use the mesh at all -> stacked;
    * small conv trunks (< 128 channels) never hit the split -> stacked;
    * conv-128 trunks whose stacked effective conv batch
      (batch_size x n_runs) crosses ~256 on a single chip -> sequential.
    """
    if mesh is not None:
        return "stacked"
    if max(cfg.model.conv_channels) < _BIG_CONV_CHANNELS:
        return "stacked"
    if cfg.train.batch_size * n_runs >= BN_FUSION_SPLIT_BATCH:
        return "sequential"
    return "stacked"


def run_experiment_multiseed(
    cfg: ExperimentConfig,
    folds: Dict[int, Dict[str, np.ndarray]],
    art_dir: str,
    seeds: Optional[Sequence[int]] = None,
    n_runs: int = 5,
    mesh=None,
    verbose: bool = True,
    share_compile: bool = True,
    mode: str = "auto",
) -> Dict[str, Any]:
    """The reference's full evaluation protocol (`README.md:62-64`): the
    k-fold experiment repeated over N seeds, reported as the mean (and std)
    over seeds of the cross-fold-average ER/F1.

    ``mode="stacked"`` trains all N repetitions of a fold as one vmapped
    program — the right shape for small models (the chip is otherwise
    underutilized) and for meshes (seed axis sharded, zero collectives).
    ``mode="sequential"`` runs the seeds one at a time through ``run_fold``
    (identical artifact layout, seeds still share the compiled epoch
    program) — on a SINGLE chip this is the faster choice for the conv-128
    models: stacking multiplies the effective conv batch, and past B~256
    XLA splits the BatchNorm passes out of the conv fusions into standalone
    HBM loops (measured: 4 stacked v1 seeds at 0.63x the aggregate rate of
    4 sequential runs — scripts/hw_batch_r3.py multiseed_check).
    ``mode="auto"`` (the default) applies that measurement via
    `choose_runs_mode`; an explicit mode that contradicts the prediction
    runs as asked but warns."""
    if mode not in ("auto", "stacked", "sequential"):
        raise ValueError(
            f"mode must be 'auto', 'stacked' or 'sequential', got {mode!r}"
        )
    predicted = choose_runs_mode(cfg, n_runs, mesh)
    if mode == "auto":
        mode = predicted
        if verbose:
            print(f"runs-mode auto -> {mode}")
    elif mode != predicted and verbose:
        print(
            f"WARNING: --runs-mode {mode} is predicted SLOWER than "
            f"{predicted!r} here (conv "
            f"{max(cfg.model.conv_channels)}ch, stacked effective batch "
            f"{cfg.train.batch_size * n_runs} vs the measured BatchNorm "
            f"fusion-split point {BN_FUSION_SPLIT_BATCH}); proceeding as asked"
        )
    if mode == "sequential" and mesh is not None:
        raise ValueError("mode='sequential' does not shard seeds; drop mesh")
    if seeds is None:
        seeds = run_seeds(cfg.train.seed, n_runs)
    seeds = list(seeds)
    plan = plan_folds(cfg, folds) if share_compile and len(folds) > 1 else None
    per_fold: Dict[int, List[FoldResult]] = {}
    for fold_id, fold_data in sorted(folds.items()):
        fold_dir = os.path.join(art_dir, f"fold{fold_id}")
        if mode == "stacked":
            per_fold[fold_id] = run_fold_multiseed(
                cfg, fold_data, fold_id, fold_dir,
                seeds, mesh=mesh, verbose=verbose, plan=plan,
            )
        else:
            from sed_crnn_tpu.train.loop import run_fold

            per_fold[fold_id] = [
                run_fold(
                    cfg, fold_data, fold_id,
                    os.path.join(fold_dir, f"seed{s}"),
                    seed=s, verbose=verbose, plan=plan,
                )
                for s in seeds
            ]
    # seed-major: run j's cross-fold mean, then mean/std over runs
    er_by_seed = [
        float(np.mean([per_fold[f][j].best_er for f in per_fold]))
        for j in range(len(seeds))
    ]
    f1_by_seed = [
        float(np.mean([per_fold[f][j].best_f1 for f in per_fold]))
        for j in range(len(seeds))
    ]
    out = {
        "mean_er": float(np.mean(er_by_seed)),
        "std_er": float(np.std(er_by_seed)),
        "mean_f1": float(np.mean(f1_by_seed)),
        "std_f1": float(np.std(f1_by_seed)),
        "er_by_seed": er_by_seed,
        "f1_by_seed": f1_by_seed,
        "seeds": seeds,
        "folds": per_fold,
    }
    if verbose:
        print(
            f"{len(seeds)}-run protocol: ER {out['mean_er']:.3f} ± {out['std_er']:.3f}"
            f" | F1 {out['mean_f1']:.3f} ± {out['std_f1']:.3f}"
        )
    artifacts.append_jsonl(
        os.path.join(art_dir, "experiment_multiseed.jsonl"),
        {k: v for k, v in out.items() if k != "folds"} | {"experiment": cfg.name},
    )
    return out
