"""On-device log-mel frontend + per-split normalization statistics.

Capability parity with the reference feature extractor:

* `_mbe` (`feature.py:55-59`): STFT (n_fft 2048, hop 1024) -> power spectrum
  -> 40-band slaney mel matmul -> natural log (no epsilon) -> transpose to
  ``(frames, n_mels)``. Here the whole chain is one jitted device program.
* `StandardScaler` fit/transform (`feature.py:127-129`): per-mel-bin mean and
  *population* variance computed from the train split only, zero-variance
  bins left unscaled — implemented as on-device reductions that compose with
  `psum` for sharded corpora.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sed_crnn_tpu.core.config import FrontendConfig
from sed_crnn_tpu.ops import stft as stft_ops
from sed_crnn_tpu.ops.mel import mel_filterbank


def log_mel_energies(y: jnp.ndarray, cfg: FrontendConfig) -> jnp.ndarray:
    """Log mel-band energies of a 1-D waveform -> ``(n_frames, n_mels)``."""
    backend = cfg.backend
    if backend not in ("fft", "matmul", "pallas"):
        raise ValueError(
            f"unknown frontend backend {backend!r}; expected 'fft', 'matmul', or 'pallas'"
        )
    if backend == "pallas":
        from sed_crnn_tpu.ops.pallas.fused_logmel import fused_log_mel

        return fused_log_mel(y, cfg)

    power = stft_ops.stft_power(
        y, cfg.n_fft, cfg.hop_length, center=cfg.center, backend=backend
    )  # (frames, bins)
    fb = jnp.asarray(
        mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax)
    )  # (n_mels, bins)
    mel = jnp.dot(power, fb.T, precision=jax.lax.Precision.HIGHEST)
    if cfg.log_floor is not None:
        mel = jnp.maximum(mel, cfg.log_floor)
    return jnp.log(mel)


@partial(jax.jit, static_argnums=(1,))
def _log_mel_jit(y, cfg):
    return log_mel_energies(y, cfg)


def log_mel_from_frames(frames, cfg: FrontendConfig) -> jnp.ndarray:
    """Log-mel rows from pre-framed windows ``(n, n_fft)`` — the live
    serving path: a streaming framer (`utils/native.py`) emits complete
    frames incrementally and this computes the identical rows
    `log_mel_energies` produces for the whole waveform (same windowed-FFT
    power, filterbank matmul precision, and floor semantics)."""
    power = stft_ops.power_spectrum_fft(
        jnp.asarray(frames), cfg.n_fft, jnp.asarray(stft_ops.hann_window(cfg.n_fft))
    )
    fb = jnp.asarray(
        mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax)
    )
    mel = jnp.dot(power, fb.T, precision=jax.lax.Precision.HIGHEST)
    if cfg.log_floor is not None:
        mel = jnp.maximum(mel, cfg.log_floor)
    return jnp.log(mel)


@partial(jax.jit, static_argnums=(1,))
def _log_mel_uncentered_jit(y, cfg):
    return log_mel_energies(y, dataclasses.replace(cfg, center=False))


def extract(y, cfg: FrontendConfig, bucket_seconds: float = 30.0) -> np.ndarray:
    """Host convenience wrapper: waveform (numpy) -> log-mel (numpy).

    Real corpora have a different length per recording; jitting per exact
    length would recompile for every file. Instead the CENTER reflect padding
    is applied on host (so tail-frame semantics stay bit-identical to
    librosa's), the padded signal is zero-extended to a ``bucket_seconds``
    multiple, and the device program (compiled once per bucket) runs
    uncentered framing; the output is trimmed to the true frame count.
    ``bucket_seconds=0`` disables bucketing (one compile per exact length).
    """
    y = np.asarray(y, dtype=np.float32)
    if bucket_seconds <= 0:
        return np.asarray(_log_mel_jit(jnp.asarray(y), cfg))

    true_frames = 1 + (len(y) + (cfg.n_fft if cfg.center else 0) - cfg.n_fft) // cfg.hop_length
    if cfg.center:
        y = np.pad(y, cfg.n_fft // 2, mode="reflect")
    bucket = max(int(bucket_seconds * cfg.sample_rate), cfg.n_fft)
    padded_len = -(-len(y) // bucket) * bucket
    y = np.pad(y, (0, padded_len - len(y)))
    out = _log_mel_uncentered_jit(jnp.asarray(y), cfg)
    return np.asarray(out[:true_frames])


class NormStats(NamedTuple):
    """Per-feature standardization statistics (sklearn StandardScaler parity:
    biased variance, zero-variance features get scale 1)."""

    mean: jnp.ndarray   # (n_mels,)
    scale: jnp.ndarray  # (n_mels,) std with zeros replaced by 1

    @property
    def std(self) -> jnp.ndarray:
        return self.scale


def fit_norm_stats(x: jnp.ndarray, axis_name: Optional[str] = None) -> NormStats:
    """Mean/std over frames of ``x (frames, n_mels)``.

    With ``axis_name`` set (inside `shard_map`), the moment sums are combined
    across devices with `psum`, yielding global-corpus statistics from
    per-shard data.
    """
    x = x.astype(jnp.float32)
    n = jnp.asarray(x.shape[0], jnp.float32)
    s1 = jnp.sum(x, axis=0)
    if axis_name is not None:
        n = jax.lax.psum(n, axis_name)
        s1 = jax.lax.psum(s1, axis_name)
    mean = s1 / n
    # Two-pass centered variance: exact zeros for constant features (so the
    # scale-1 fallback below fires, matching sklearn) and better conditioned
    # than the one-pass moment formula in float32.
    sq = jnp.sum((x - mean) ** 2, axis=0)
    if axis_name is not None:
        sq = jax.lax.psum(sq, axis_name)
    var = sq / n
    std = jnp.sqrt(var)
    scale = jnp.where(std == 0.0, 1.0, std)
    return NormStats(mean=mean, scale=scale)


def normalize(x: jnp.ndarray, stats: NormStats) -> jnp.ndarray:
    return (x - stats.mean) / stats.scale
