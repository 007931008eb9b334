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

The epoch programs themselves live in `train/loop.py::_epoch_program` —
one builder covers single-device and DP (the DP branch wraps the scan in
shard_map and folds the replica index into step keys), so DP folds share
compiled programs across folds exactly like single-device folds do.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np

from sed_crnn_tpu.core.config import TrainConfig
from sed_crnn_tpu.data.sampler import find_clean_negative_starts
from sed_crnn_tpu.models.crnn import CRNN
from sed_crnn_tpu.parallel.mesh import DATA_AXIS, local_batch_slice
from sed_crnn_tpu.train.loop import Trainer


class DataParallelTrainer(Trainer):
    """Trainer whose epoch programs shard the global batch over a mesh."""

    def __init__(
        self,
        model: CRNN,
        tcfg: TrainConfig,
        train_sampler,
        val_sampler,
        mesh,
        axis_name: str = DATA_AXIS,
    ):
        super().__init__(model, tcfg, train_sampler, val_sampler)
        self.mesh = mesh
        self.axis_name = axis_name
        self.n_replicas = mesh.shape[axis_name]
        self.local_batch = local_batch_slice(tcfg.batch_size, mesh, axis_name)

    def _dp(self):
        return (self.mesh, self.axis_name)


def shard_fold_data(
    fold_data: Dict[str, np.ndarray],
    mesh,
    axis_name: str = DATA_AXIS,
    seq_len_in: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Per-host data sharding hook for multi-host DP: each host keeps only its
    process's contiguous frame range (samplers then draw host-local windows).
    Single-host meshes return the data unchanged (replication in HBM).

    Contiguous slicing can starve a host when positives cluster in one region
    (e.g. all events in the recording's first half): the balanced sampler
    would then fail inside jit setup with an unhelpful message. Each shard is
    therefore validated up front — any-class positive frames must remain, and
    when ``seq_len_in`` is given, at least one clean-negative window start
    too (`data/sampler.py::find_clean_negative_starts`) — with an error that
    names the host, the split, and the counts, so the fix (interleave videos
    across hosts, or rebalance the catalog) is actionable."""
    n_proc = jax.process_count()
    if n_proc == 1:
        return fold_data
    pid = jax.process_index()
    out = {}
    for split in ("train", "val"):
        x, y = fold_data[f"{split}_x"], fold_data[f"{split}_y"]
        chunk = x.shape[0] // n_proc
        sl = slice(pid * chunk, (pid + 1) * chunk)
        xs, ys = x[sl], y[sl]
        n_pos = int((np.asarray(ys).max(axis=1) > 0).sum())
        if n_pos == 0:
            raise ValueError(
                f"host {pid}/{n_proc}: contiguous {split} shard "
                f"(frames [{sl.start}, {sl.stop})) contains NO positive "
                f"frames — the balanced sampler cannot draw from it. "
                f"Interleave videos across hosts or rebalance the fold."
            )
        if seq_len_in is not None:
            n_neg = int(find_clean_negative_starts(ys, seq_len_in).size)
            if n_neg == 0:
                raise ValueError(
                    f"host {pid}/{n_proc}: contiguous {split} shard "
                    f"(frames [{sl.start}, {sl.stop}), {n_pos} positive "
                    f"frames) has no clean {seq_len_in}-frame negative "
                    f"window — the balanced sampler cannot draw negatives. "
                    f"Interleave videos across hosts or rebalance the fold."
                )
        out[f"{split}_x"], out[f"{split}_y"] = xs, ys
    return out
