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

Each sampler is split into a hashable static ``WindowSpec`` (a jit cache key)
and a traced ``data`` pytree (fold arrays + element counts as traced
scalars), so ONE compiled epoch program serves every fold: fold data enters
as arguments, never as closure constants, and folds of different sizes share
shapes by zero-padding to common buckets while sampling draws only from the
first ``n_*`` valid elements.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def find_clean_negative_starts(label_vec: np.ndarray, seq_len: int) -> np.ndarray:
    """Window starts whose ``seq_len`` span contains no positive frame
    (reference `sed.py:48-52` semantics via a box-filter convolution).

    A frame is positive when ANY class is active — for the reference's
    1-class hit pipelines this is exactly its ``label[:, 0] > 0`` rule, and
    multi-class configs balance on event presence rather than silently on
    class 0 alone."""
    mask = (np.asarray(label_vec).max(axis=1) > 0).astype(np.int64)
    if len(mask) < seq_len:
        return np.empty((0,), np.int64)
    window_sums = np.convolve(mask, np.ones(seq_len, dtype=np.int64), mode="valid")
    return np.flatnonzero(window_sums == 0)


def balanced_counts(label_vec: np.ndarray, seq_len: int) -> Tuple[int, int]:
    """(#positive frames, #clean-negative window starts) for one split —
    the quantities that size the balanced sampler's epoch and buckets."""
    lab = np.asarray(label_vec)
    n_pos = int(np.flatnonzero(lab.max(axis=1) > 0).size)
    n_neg = int(find_clean_negative_starts(lab, seq_len).size)
    return n_pos, n_neg


# ---------------------------------------------------------------------------
# Static spec + pure sampling functions over a traced data pytree
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class WindowSpec:
    """Hashable sampling description — everything an epoch program needs to
    know at TRACE time. Fold contents stay out of it by construction."""

    kind: str                   # "balanced" | "sequence"
    seq_len_in: int
    seq_len_out: int
    augment: bool = False
    time_mask_w: int = 8
    freq_mask_w: int = 8
    masks_per_example: int = 2


def gather_windows(spec: WindowSpec, data: Dict, starts: jnp.ndarray):
    """Window gather + label max-pooling from the fold arrays."""
    idx = starts[:, None] + jnp.arange(spec.seq_len_in)[None, :]
    x = data["mel"][idx]                    # (B, T, F)
    y_win = data["lab"][idx]                # (B, T, C)
    B = starts.shape[0]
    pool = spec.seq_len_in // spec.seq_len_out
    y = y_win.reshape(B, spec.seq_len_out, pool, -1).max(axis=2)
    return x, y


def _balanced_starts(spec: WindowSpec, data: Dict, key: jax.Array, batch_size: int):
    """Half positive-anchored, half clean-negative window starts
    (interleaved; odd batch sizes get the extra positive). Counts are traced
    scalars so padded fold arrays sample only their valid prefix."""
    n_pos = (batch_size + 1) // 2
    k1, k2, k3 = jax.random.split(key, 3)

    ci = jax.random.randint(k1, (n_pos,), 0, data["n_pos"])
    centers = data["pos"][ci]
    lo = jnp.maximum(0, centers - spec.seq_len_in + 1)
    hi = jnp.minimum(centers, data["n_frames"] - spec.seq_len_in)
    hi = jnp.maximum(hi, lo)  # v2's bounds fallback (`decorte_datamodule.py:83-85`)
    u = jax.random.uniform(k2, (n_pos,))
    pos_starts = lo + jnp.floor(u * (hi - lo + 1).astype(jnp.float32)).astype(jnp.int32)
    pos_starts = jnp.minimum(pos_starts, hi)

    ni = jax.random.randint(k3, (n_pos,), 0, data["n_neg"])
    neg_starts = data["neg"][ni]
    # Interleave pos/neg as the reference's even/odd indices do.
    return jnp.stack([pos_starts, neg_starts], axis=1).reshape(-1)[:batch_size]


def sample_batch_from(spec: WindowSpec, data: Dict, key: jax.Array, batch_size: int):
    """Random batch draw — call inside jit. Returns (x (B, T, F), y (B, T_out, C))."""
    ks, ka = jax.random.split(key)
    if spec.kind == "balanced":
        starts = _balanced_starts(spec, data, ks, batch_size)
    elif spec.kind == "sequence":
        idx = jax.random.randint(ks, (batch_size,), 0, data["n_frames"] // spec.seq_len_in)
        starts = idx * spec.seq_len_in
    else:
        raise ValueError(f"unknown sampler kind {spec.kind!r}")
    x, y = gather_windows(spec, data, starts)
    if spec.augment:
        x = spec_augment_batch(
            ka, x, spec.time_mask_w, spec.freq_mask_w, spec.masks_per_example
        )
    return x, y


def sweep_batch_from(spec: WindowSpec, data: Dict, idx: jnp.ndarray):
    """Deterministic aligned windows by index for full-split sweeps
    (`utils.py:28-41` split_in_seqs semantics: non-overlapping, tail
    truncated). Out-of-range indices are clamped and flagged invalid; the
    caller masks them out of metrics. Returns (x, y, valid)."""
    n_windows = data["n_frames"] // spec.seq_len_in
    valid = idx < n_windows
    idx_c = jnp.minimum(idx, jnp.maximum(n_windows - 1, 0))
    x, y = gather_windows(spec, data, idx_c * spec.seq_len_in)
    return x, y, valid


def _pad_axis0(a: np.ndarray, bucket: Optional[int], what: str) -> np.ndarray:
    if bucket is None or bucket == a.shape[0]:
        return a
    if bucket < a.shape[0]:
        raise ValueError(f"{what} bucket {bucket} < actual {a.shape[0]}")
    pad = ((0, bucket - a.shape[0]),) + ((0, 0),) * (a.ndim - 1)
    return np.pad(a, pad)


# ---------------------------------------------------------------------------
# Device-resident sampler objects (spec + data + host-side epoch accounting)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class BalancedWindowSampler:
    """Device-resident balanced pos/neg window sampler over one split.

    ``frame_bucket``/``pos_bucket``/``neg_bucket`` zero-pad the fold arrays to
    shared shapes so one compiled epoch program serves all folds; sampling is
    unaffected (valid counts travel as traced scalars in ``data``).
    """

    mel: jnp.ndarray            # (frames, n_mels) — lives in HBM
    lab: jnp.ndarray            # (frames, n_classes)
    seq_len_in: int = 64
    seq_len_out: int = 8
    augment: bool = False
    time_mask_w: int = 8
    freq_mask_w: int = 8
    masks_per_example: int = 2
    frame_bucket: Optional[int] = None
    pos_bucket: Optional[int] = None
    neg_bucket: Optional[int] = None

    pos_frames: jnp.ndarray = dataclasses.field(init=False)
    neg_starts: jnp.ndarray = dataclasses.field(init=False)
    total_frames: int = dataclasses.field(init=False)
    n_pos: int = dataclasses.field(init=False)
    n_neg: int = dataclasses.field(init=False)
    data: Dict = dataclasses.field(init=False)

    def __post_init__(self):
        lab_np = np.asarray(self.lab, np.float32)
        mel_np = np.asarray(self.mel, np.float32)
        self.total_frames = int(lab_np.shape[0])
        if self.total_frames < self.seq_len_in:
            raise ValueError(
                f"split has {self.total_frames} frames < window {self.seq_len_in}"
            )
        pos = np.flatnonzero(lab_np.max(axis=1) > 0)
        if pos.size == 0:
            raise ValueError("split contains no positive frames — cannot balance")
        neg = find_clean_negative_starts(lab_np, self.seq_len_in)
        if neg.size == 0:
            raise ValueError("split contains no clean negative windows")
        self.n_pos, self.n_neg = int(pos.size), int(neg.size)

        self.mel = jnp.asarray(_pad_axis0(mel_np, self.frame_bucket, "frame"))
        self.lab = jnp.asarray(_pad_axis0(lab_np, self.frame_bucket, "frame"))
        self.pos_frames = jnp.asarray(
            _pad_axis0(pos.astype(np.int32), self.pos_bucket, "pos")
        )
        self.neg_starts = jnp.asarray(
            _pad_axis0(neg.astype(np.int32), self.neg_bucket, "neg")
        )
        self.data = {
            "mel": self.mel,
            "lab": self.lab,
            "pos": self.pos_frames,
            "neg": self.neg_starts,
            "n_pos": np.int32(self.n_pos),
            "n_neg": np.int32(self.n_neg),
            "n_frames": np.int32(self.total_frames),
        }

    @property
    def spec(self) -> WindowSpec:
        return WindowSpec(
            "balanced",
            self.seq_len_in,
            self.seq_len_out,
            self.augment,
            self.time_mask_w,
            self.freq_mask_w,
            self.masks_per_example,
        )

    # ---- epoch accounting (reference: len = 2 x #pos) ------------------
    @property
    def epoch_examples(self) -> int:
        return 2 * self.n_pos

    def steps_per_epoch(self, batch_size: int, drop_last: bool = True) -> int:
        n = self.epoch_examples
        return n // batch_size if drop_last else -(-n // batch_size)

    # ---- full-sweep accounting (deterministic validation) ---------------
    @property
    def sweep_windows(self) -> int:
        return self.total_frames // self.seq_len_in

    def sweep_steps(self, batch_size: int) -> int:
        return max(1, -(-self.sweep_windows // batch_size))

    # ---- device-side batch assembly ------------------------------------
    def sample_starts(self, key: jax.Array, batch_size: int) -> jnp.ndarray:
        return _balanced_starts(self.spec, self.data, key, batch_size)

    def gather_windows(self, starts: jnp.ndarray):
        return gather_windows(self.spec, self.data, starts)

    def sample_batch(self, key: jax.Array, batch_size: int):
        """(x (B, T, F) float32, y (B, T_out, C) float32) — call inside jit."""
        return sample_batch_from(self.spec, self.data, key, batch_size)

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
    from shuffled-sweep epochs; identical in expectation). Deterministic
    full-sweep evaluation enumerates the same windows in time order."""

    mel: jnp.ndarray
    lab: jnp.ndarray
    seq_len_in: int = 256
    seq_len_out: int = 256
    augment: bool = False
    time_mask_w: int = 8
    freq_mask_w: int = 8
    masks_per_example: int = 2
    frame_bucket: Optional[int] = None

    n_windows: int = dataclasses.field(init=False)
    total_frames: int = dataclasses.field(init=False)
    data: Dict = dataclasses.field(init=False)

    def __post_init__(self):
        lab_np = np.asarray(self.lab, np.float32)
        mel_np = np.asarray(self.mel, np.float32)
        self.total_frames = int(lab_np.shape[0])
        self.n_windows = self.total_frames // self.seq_len_in
        if self.n_windows < 1:
            raise ValueError(
                f"split has {self.total_frames} frames < one {self.seq_len_in}-frame sequence"
            )
        self.mel = jnp.asarray(_pad_axis0(mel_np, self.frame_bucket, "frame"))
        self.lab = jnp.asarray(_pad_axis0(lab_np, self.frame_bucket, "frame"))
        self.data = {
            "mel": self.mel,
            "lab": self.lab,
            "n_frames": np.int32(self.total_frames),
        }

    @property
    def spec(self) -> WindowSpec:
        return WindowSpec(
            "sequence",
            self.seq_len_in,
            self.seq_len_out,
            self.augment,
            self.time_mask_w,
            self.freq_mask_w,
            self.masks_per_example,
        )

    @property
    def epoch_examples(self) -> int:
        return self.n_windows

    def steps_per_epoch(self, batch_size: int, drop_last: bool = False) -> int:
        n = self.n_windows
        return max(1, n // batch_size if drop_last else -(-n // batch_size))

    @property
    def sweep_windows(self) -> int:
        return self.n_windows

    def sweep_steps(self, batch_size: int) -> int:
        return max(1, -(-self.n_windows // batch_size))

    def sample_batch(self, key: jax.Array, batch_size: int):
        return sample_batch_from(self.spec, self.data, key, batch_size)

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
