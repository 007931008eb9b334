"""Data-parallel training over a 1-D device mesh.

The whole training epoch runs as one `shard_map`-decorated device program per
chip: each replica samples its own sub-batch on device (RNG folded with the
replica index, fold features replicated in each chip's HBM), computes local
gradients, and joins the others with a single `pmean` over ICI per step.
Parameters and optimizer state stay replicated and bit-identical across
replicas because every replica applies the same reduced gradient. BatchNorm
uses cross-replica `pmean` statistics (see `nn/layers.py:BatchNorm2d`), so
the reduced gradient equals the single-device gradient of the same GLOBAL
batch — verified directly in `tests/test_parallel.py` (RNG *streams* differ
from the single-device trainer by construction: each replica draws its own
windows and dropout masks).
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from sed_crnn_tpu.core.config import TrainConfig
from sed_crnn_tpu.data.sampler import BalancedWindowSampler
from sed_crnn_tpu.models.crnn import CRNN
from sed_crnn_tpu.nn.layers import Ctx
from sed_crnn_tpu.parallel.mesh import DATA_AXIS, local_batch_slice
from sed_crnn_tpu.train.loop import Trainer, TrainState


class DataParallelTrainer(Trainer):
    """Trainer whose epoch programs shard the global batch over a mesh."""

    def __init__(
        self,
        model: CRNN,
        tcfg: TrainConfig,
        train_sampler: BalancedWindowSampler,
        val_sampler: BalancedWindowSampler,
        mesh,
        axis_name: str = DATA_AXIS,
    ):
        super().__init__(model, tcfg, train_sampler, val_sampler)
        self.mesh = mesh
        self.axis_name = axis_name
        self.n_replicas = mesh.shape[axis_name]
        self.local_batch = local_batch_slice(tcfg.batch_size, mesh, axis_name)

    # ---- per-replica step bodies ----------------------------------------
    def _dp_train_step(self, state: TrainState, key: jax.Array):
        ax = self.axis_name
        replica = jax.lax.axis_index(ax)
        k_batch, k_drop = jax.random.split(jax.random.fold_in(key, replica))
        x, y = self.train_sampler.sample_batch(k_batch, self.local_batch)

        def loss_of(params):
            logits, new_mstate, _ = self.model.apply(
                params,
                state.model_state,
                x,
                Ctx(train=True, rng=k_drop, axis_name=ax),
            )
            # pmean INSIDE the differentiated function: the loss becomes the
            # global-batch mean, and differentiating w.r.t. the replicated
            # params emits exactly one gradient psum over ICI (the transpose
            # of the implicit broadcast) — grads come out replicated and
            # equal to the single-device global-batch gradient; no outer
            # reduction is needed (an extra pmean would double-count).
            loss = jax.lax.pmean(self.loss_fn(logits, y), ax)
            return loss, (logits, new_mstate)

        (loss, (logits, new_mstate)), grads = jax.value_and_grad(
            loss_of, has_aux=True
        )(state.params)
        new_params, new_opt = self.adam.update(
            grads, state.opt_state, state.params, state.lr_scale
        )
        new_state = TrainState(new_params, new_mstate, new_opt, state.lr_scale)
        return new_state, (loss, jax.nn.sigmoid(logits), y)

    def _dp_eval_step(self, state: TrainState, key: jax.Array):
        ax = self.axis_name
        replica = jax.lax.axis_index(ax)
        k = jax.random.fold_in(key, replica)
        x, y = self.val_sampler.sample_batch(k, self.local_batch)
        logits, _, _ = self.model.apply(
            state.params, state.model_state, x, Ctx(train=False)
        )
        loss = jax.lax.pmean(self.loss_fn(logits, y), ax)
        return state, (loss, jax.nn.sigmoid(logits), y)

    # ---- epoch programs --------------------------------------------------
    @partial(jax.jit, static_argnums=(0, 3))
    def train_epoch(self, state: TrainState, key: jax.Array, n_steps: int):
        def epoch_body(state):
            keys = jax.random.split(key, n_steps)
            state, (losses, preds, ys) = jax.lax.scan(self._dp_train_step, state, keys)
            return state, losses, preds, ys

        sharded = shard_map(
            epoch_body,
            mesh=self.mesh,
            in_specs=(P(),),
            out_specs=(P(), P(), P(None, self.axis_name), P(None, self.axis_name)),
            check_vma=False,
        )
        state, losses, preds, ys = sharded(state)
        scores = self._epoch_scores(losses[:, None], preds, ys)
        return state, scores

    @partial(jax.jit, static_argnums=(0, 3))
    def eval_epoch(self, state: TrainState, key: jax.Array, n_steps: int):
        def epoch_body(state):
            keys = jax.random.split(key, n_steps)
            _, (losses, preds, ys) = jax.lax.scan(self._dp_eval_step, state, keys)
            return losses, preds, ys

        sharded = shard_map(
            epoch_body,
            mesh=self.mesh,
            in_specs=(P(),),
            out_specs=(P(), P(None, self.axis_name), P(None, self.axis_name)),
            check_vma=False,
        )
        losses, preds, ys = sharded(state)
        return self._epoch_scores(losses[:, None], preds, ys)


def shard_fold_data(
    fold_data: Dict[str, np.ndarray], mesh, axis_name: str = DATA_AXIS
) -> Dict[str, np.ndarray]:
    """Per-host data sharding hook for multi-host DP: each host keeps only its
    process's contiguous frame range (samplers then draw host-local windows).
    Single-host meshes return the data unchanged (replication in HBM)."""
    n_proc = jax.process_count()
    if n_proc == 1:
        return fold_data
    pid = jax.process_index()
    out = {}
    for split in ("train", "val"):
        x, y = fold_data[f"{split}_x"], fold_data[f"{split}_y"]
        chunk = x.shape[0] // n_proc
        sl = slice(pid * chunk, (pid + 1) * chunk)
        out[f"{split}_x"], out[f"{split}_y"] = x[sl], y[sl]
    return out
