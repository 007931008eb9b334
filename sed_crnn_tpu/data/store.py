"""Feature-store contracts — drop-in compatible with the reference npz files.

* per-video ``{base}_mon.npz``: ``arr_0`` = log-mel ``(frames, n_mels)``,
  ``arr_1`` = labels ``(frames, n_classes)`` (reference `feature.py:95`);
* per-fold ``mbe_mon_fold{k}.npz``: ``arr_0..arr_3`` = X_train, Y_train,
  X_test, Y_test (reference `feature.py:131-132`), X's standardized with
  statistics fit on the train split only (`feature.py:127-129`). Packs
  written by THIS framework additionally carry the fit statistics as
  ``arr_4`` = per-mel-bin mean and ``arr_5`` = scale (std), so serving
  (`apps/infer.py`) normalizes new audio with the EXACT training statistics
  instead of refitting them. Reference loaders read only ``arr_0..arr_3``,
  so the files stay drop-in compatible both ways.

A user of the reference can point this framework at their existing cache
directory (or vice versa) and the files interoperate.
"""

from __future__ import annotations

import os
from typing import Dict, Mapping, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from sed_crnn_tpu.ops import frontend


def save_video_features(path: str, mbe: np.ndarray, label: np.ndarray) -> None:
    np.savez(path, mbe, label)


def load_video_features(path: str) -> Tuple[np.ndarray, np.ndarray]:
    data = np.load(path)
    return data["arr_0"], data["arr_1"]


def video_feature_path(cache_dir: str, video_name: str, channel_tag: str = "mon") -> str:
    base = os.path.splitext(video_name)[0]
    return os.path.join(cache_dir, f"{base}_{channel_tag}.npz")


def fold_path(cache_dir: str, fold_id: int, channel_tag: str = "mon") -> str:
    """1-based fold id, matching the reference's file naming."""
    return os.path.join(cache_dir, f"mbe_{channel_tag}_fold{fold_id}.npz")


def pack_folds(
    per_video: Mapping[str, Tuple[np.ndarray, np.ndarray, int]],
    cache_dir: str,
    channel_tag: str = "mon",
) -> Dict[int, str]:
    """Concatenate per-video (mbe, label, fold_id) into per-fold train/test
    packs with train-only standardization, and save them.

    Fold k's test split is the videos assigned fold_id == k-1 (0-based ids in,
    1-based filenames out, as in the reference).
    """
    os.makedirs(cache_dir, exist_ok=True)
    fold_ids = sorted({fold for (_, _, fold) in per_video.values()})
    paths: Dict[int, str] = {}
    for fold in fold_ids:
        train_x, train_y, test_x, test_y = [], [], [], []
        for _, (mbe, lbl, f) in per_video.items():
            (test_x if f == fold else train_x).append(mbe)
            (test_y if f == fold else train_y).append(lbl)
        if not train_x or not test_x:
            raise ValueError(f"fold {fold}: empty train or test split")
        X_train = np.concatenate(train_x, axis=0)
        Y_train = np.concatenate(train_y, axis=0)
        X_test = np.concatenate(test_x, axis=0)
        Y_test = np.concatenate(test_y, axis=0)

        stats = frontend.fit_norm_stats(jnp.asarray(X_train))
        X_train = np.asarray(frontend.normalize(jnp.asarray(X_train), stats))
        X_test = np.asarray(frontend.normalize(jnp.asarray(X_test), stats))

        out = fold_path(cache_dir, fold + 1, channel_tag)
        np.savez(
            out, X_train, Y_train, X_test, Y_test,
            np.asarray(stats.mean), np.asarray(stats.scale),
        )
        paths[fold + 1] = out
    return paths


def load_fold(cache_dir: str, fold_id: int, channel_tag: str = "mon") -> Dict[str, np.ndarray]:
    arr = np.load(fold_path(cache_dir, fold_id, channel_tag))
    fold = {
        "train_x": arr["arr_0"],
        "train_y": arr["arr_1"],
        "val_x": arr["arr_2"],
        "val_y": arr["arr_3"],
    }
    if "arr_4" in arr.files and "arr_5" in arr.files:
        fold["norm_mean"], fold["norm_scale"] = arr["arr_4"], arr["arr_5"]
    return fold


def load_fold_stats(
    cache_dir: str, fold_id: int, channel_tag: str = "mon"
) -> "Tuple[np.ndarray, np.ndarray] | None":
    """The (mean, scale) this fold's X's were standardized with, if the pack
    recorded them (packs from this framework do; reference packs do not)."""
    path = fold_path(cache_dir, fold_id, channel_tag)
    if not os.path.exists(path):
        return None
    arr = np.load(path)
    if "arr_4" in arr.files and "arr_5" in arr.files:
        return arr["arr_4"], arr["arr_5"]
    return None


def load_all_folds(
    cache_dir: str, fold_ids: Sequence[int] = (1, 2, 3, 4), channel_tag: str = "mon"
) -> Dict[int, Dict[str, np.ndarray]]:
    return {k: load_fold(cache_dir, k, channel_tag) for k in fold_ids}
