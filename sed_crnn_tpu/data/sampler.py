"""Balanced window sampling, redesigned for TPU: the entire fold lives in HBM
and every batch is assembled ON DEVICE inside the jitted train step — index
sampling with counter-based `jax.random`, window gathers, label max-pooling,
and SpecAugment all fuse into one XLA program. No host loop, no worker
processes (the reference forks 4 DataLoader workers per loop,
`sed.py:153-156`), no per-step host->device copies.

Sampling semantics follow the reference's `HitWindowDataset`
(`sed.py:48-79`, `decorte_datamodule.py:18-111`): an "epoch" is
``2 x #positive-frames`` draws, alternating between (a) a uniformly chosen
positive frame with a uniform window placement containing it, and (b) a
uniformly chosen "clean negative" start — a window position with no positive
frame anywhere inside, precomputed via a box-filter convolution over the
label mask. Labels are max-pooled ``seq_len_in -> seq_len_out``. The
reference's unseeded `random` module becomes explicit key-driven RNG
(documented divergence: deterministic by construction).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def find_clean_negative_starts(label_vec: np.ndarray, seq_len: int) -> np.ndarray:
    """Window starts whose ``seq_len`` span contains no positive frame
    (reference `sed.py:48-52` semantics via a box-filter convolution)."""
    mask = (np.asarray(label_vec)[:, 0] > 0).astype(np.int64)
    if len(mask) < seq_len:
        return np.empty((0,), np.int64)
    window_sums = np.convolve(mask, np.ones(seq_len, dtype=np.int64), mode="valid")
    return np.flatnonzero(window_sums == 0)


@dataclasses.dataclass
class BalancedWindowSampler:
    """Device-resident balanced pos/neg window sampler over one split."""

    mel: jnp.ndarray            # (frames, n_mels) — lives in HBM
    lab: jnp.ndarray            # (frames, n_classes)
    seq_len_in: int = 64
    seq_len_out: int = 8
    augment: bool = False
    time_mask_w: int = 8
    freq_mask_w: int = 8
    masks_per_example: int = 2

    pos_frames: jnp.ndarray = dataclasses.field(init=False)
    neg_starts: jnp.ndarray = dataclasses.field(init=False)
    total_frames: int = dataclasses.field(init=False)

    def __post_init__(self):
        lab_np = np.asarray(self.lab)
        self.total_frames = int(lab_np.shape[0])
        if self.total_frames < self.seq_len_in:
            raise ValueError(
                f"split has {self.total_frames} frames < window {self.seq_len_in}"
            )
        pos = np.flatnonzero(lab_np[:, 0] > 0)
        if pos.size == 0:
            raise ValueError("split contains no positive frames — cannot balance")
        neg = find_clean_negative_starts(lab_np, self.seq_len_in)
        if neg.size == 0:
            raise ValueError("split contains no clean negative windows")
        self.pos_frames = jnp.asarray(pos, jnp.int32)
        self.neg_starts = jnp.asarray(neg, jnp.int32)
        self.mel = jnp.asarray(self.mel, jnp.float32)
        self.lab = jnp.asarray(self.lab, jnp.float32)

    # ---- epoch accounting (reference: len = 2 x #pos) ------------------
    @property
    def epoch_examples(self) -> int:
        return 2 * int(self.pos_frames.shape[0])

    def steps_per_epoch(self, batch_size: int, drop_last: bool = True) -> int:
        n = self.epoch_examples
        return n // batch_size if drop_last else -(-n // batch_size)

    # ---- device-side batch assembly ------------------------------------
    def sample_starts(self, key: jax.Array, batch_size: int) -> jnp.ndarray:
        """Half positive-anchored, half clean-negative window starts
        (interleaved; odd batch sizes get the extra positive)."""
        n_pos = (batch_size + 1) // 2
        n_neg = n_pos  # drawn equal, interleaved, then sliced to batch_size
        k1, k2, k3 = jax.random.split(key, 3)

        ci = jax.random.randint(k1, (n_pos,), 0, self.pos_frames.shape[0])
        centers = self.pos_frames[ci]
        lo = jnp.maximum(0, centers - self.seq_len_in + 1)
        hi = jnp.minimum(centers, self.total_frames - self.seq_len_in)
        hi = jnp.maximum(hi, lo)  # v2's bounds fallback (`decorte_datamodule.py:83-85`)
        u = jax.random.uniform(k2, (n_pos,))
        pos_starts = lo + jnp.floor(u * (hi - lo + 1).astype(jnp.float32)).astype(jnp.int32)
        pos_starts = jnp.minimum(pos_starts, hi)

        ni = jax.random.randint(k3, (n_neg,), 0, self.neg_starts.shape[0])
        neg_starts = self.neg_starts[ni]
        # Interleave pos/neg as the reference's even/odd indices do.
        return jnp.stack([pos_starts, neg_starts], axis=1).reshape(-1)[:batch_size]

    def gather_windows(self, starts: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        idx = starts[:, None] + jnp.arange(self.seq_len_in)[None, :]
        x = self.mel[idx]                       # (B, T, F)
        y_win = self.lab[idx]                   # (B, T, C)
        B = starts.shape[0]
        pool = self.seq_len_in // self.seq_len_out
        y = y_win.reshape(B, self.seq_len_out, pool, -1).max(axis=2)
        return x, y

    def _augment(self, key: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
        return spec_augment_batch(
            key, x, self.time_mask_w, self.freq_mask_w, self.masks_per_example
        )

    def sample_batch(self, key: jax.Array, batch_size: int):
        """(x (B, T, F) float32, y (B, T_out, C) float32) — call inside jit."""
        ks, ka = jax.random.split(key)
        starts = self.sample_starts(ks, batch_size)
        x, y = self.gather_windows(starts)
        if self.augment:
            x = self._augment(ka, x)
        return x, y

    @partial(jax.jit, static_argnums=(0, 2))
    def sample_batch_jit(self, key: jax.Array, batch_size: int):
        return self.sample_batch(key, batch_size)

    def __hash__(self):  # jit static-arg support: identity-based
        return id(self)

    def __eq__(self, other):
        return self is other


@dataclasses.dataclass
class SequenceWindowSampler:
    """Full-sweep sampler for the legacy DCASE pipeline: the split is cut
    into aligned non-overlapping ``seq_len_in``-frame sequences
    (`utils.py:28-41` `split_in_seqs` semantics) and batches draw uniformly
    from them on device. An epoch visits ``ceil(N / batch)`` batches — iid
    uniform draws rather than an explicit permutation (documented divergence
    from shuffled-sweep epochs; identical in expectation)."""

    mel: jnp.ndarray
    lab: jnp.ndarray
    seq_len_in: int = 256
    seq_len_out: int = 256
    augment: bool = False
    time_mask_w: int = 8
    freq_mask_w: int = 8
    masks_per_example: int = 2

    n_windows: int = dataclasses.field(init=False)

    def __post_init__(self):
        frames = int(np.asarray(self.lab).shape[0])
        self.n_windows = frames // self.seq_len_in
        if self.n_windows < 1:
            raise ValueError(
                f"split has {frames} frames < one {self.seq_len_in}-frame sequence"
            )
        self.mel = jnp.asarray(self.mel, jnp.float32)
        self.lab = jnp.asarray(self.lab, jnp.float32)

    @property
    def epoch_examples(self) -> int:
        return self.n_windows

    def steps_per_epoch(self, batch_size: int, drop_last: bool = False) -> int:
        n = self.n_windows
        return max(1, n // batch_size if drop_last else -(-n // batch_size))

    def sample_batch(self, key: jax.Array, batch_size: int):
        ks, ka = jax.random.split(key)
        idx = jax.random.randint(ks, (batch_size,), 0, self.n_windows)
        starts = idx * self.seq_len_in
        window_idx = starts[:, None] + jnp.arange(self.seq_len_in)[None, :]
        x = self.mel[window_idx]
        y_win = self.lab[window_idx]
        pool = self.seq_len_in // self.seq_len_out
        y = y_win.reshape(batch_size, self.seq_len_out, pool, -1).max(axis=2)
        if self.augment:
            x = spec_augment_batch(
                ka, x, self.time_mask_w, self.freq_mask_w, self.masks_per_example
            )
        return x, y

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


def spec_augment(
    key: jax.Array,
    x: jnp.ndarray,
    time_mask_w: int = 8,
    freq_mask_w: int = 8,
    n_masks: int = 2,
) -> jnp.ndarray:
    """SpecAugment-style masking on one (T, F) window: ``n_masks`` iterations,
    each zeroing one time stripe and one frequency stripe at uniform offsets
    (reference `decorte_datamodule.py:39-49`; stripe start in
    ``[0, dim - width)``, matching np.random.randint's exclusive high)."""
    T, F = x.shape
    t_ids = jnp.arange(T)[:, None]
    f_ids = jnp.arange(F)[None, :]
    keys = jax.random.split(key, 2 * n_masks)
    for i in range(n_masks):
        if T > time_mask_w:
            t0 = jax.random.randint(keys[2 * i], (), 0, T - time_mask_w)
            x = jnp.where((t_ids >= t0) & (t_ids < t0 + time_mask_w), 0.0, x)
        if F > freq_mask_w:
            f0 = jax.random.randint(keys[2 * i + 1], (), 0, F - freq_mask_w)
            x = jnp.where((f_ids >= f0) & (f_ids < f0 + freq_mask_w), 0.0, x)
    return x


def spec_augment_batch(key, x, time_mask_w=8, freq_mask_w=8, n_masks=2):
    keys = jax.random.split(key, x.shape[0])
    return jax.vmap(lambda k, xi: spec_augment(k, xi, time_mask_w, freq_mask_w, n_masks))(
        keys, x
    )
