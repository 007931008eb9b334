"""Slaney-style mel filterbank construction.

The reference frontend calls ``librosa.filters.mel(sr, n_fft, n_mels)`` with
librosa-0.7 defaults (`feature.py:58`): HTK=False (Slaney's auditory-toolbox
mel scale — linear below 1 kHz, logarithmic above) and area ("slaney")
normalization. This module re-derives that filterbank from the published
formulas (Slaney 1998, Auditory Toolbox) so the new framework carries no
librosa dependency. Construction happens once on host in float64 and the
result is baked into jitted programs as a constant.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional

import numpy as np

# Slaney mel scale constants: 200/3 Hz per mel below the 1 kHz break, then
# logarithmic with step log(6.4)/27 per mel.
_F_SP = 200.0 / 3.0
_MIN_LOG_HZ = 1000.0
_MIN_LOG_MEL = _MIN_LOG_HZ / _F_SP
_LOGSTEP = np.log(6.4) / 27.0


def hz_to_mel(freq_hz) -> np.ndarray:
    f = np.asanyarray(freq_hz, dtype=np.float64)
    mel = f / _F_SP
    log_region = f >= _MIN_LOG_HZ
    mel = np.where(
        log_region,
        _MIN_LOG_MEL + np.log(np.maximum(f, 1e-300) / _MIN_LOG_HZ) / _LOGSTEP,
        mel,
    )
    return mel


def mel_to_hz(mel) -> np.ndarray:
    m = np.asanyarray(mel, dtype=np.float64)
    hz = m * _F_SP
    log_region = m >= _MIN_LOG_MEL
    hz = np.where(log_region, _MIN_LOG_HZ * np.exp(_LOGSTEP * (m - _MIN_LOG_MEL)), hz)
    return hz


def mel_center_frequencies(n_mels: int, fmin: float, fmax: float) -> np.ndarray:
    """`n_mels` band centers plus the two edge points (length n_mels + 2)."""
    mels = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    return mel_to_hz(mels)


@lru_cache(maxsize=16)
def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    dtype=np.float32,
) -> np.ndarray:
    """Triangular mel filterbank, shape ``(n_mels, 1 + n_fft // 2)``.

    Matches librosa-0.7 ``filters.mel`` defaults: Slaney scale, area
    normalization (each triangle scaled by 2 / bandwidth), float64 math.
    """
    if fmax is None:
        fmax = float(sr) / 2.0

    n_bins = 1 + n_fft // 2
    fft_freqs = np.linspace(0.0, float(sr) / 2.0, n_bins, dtype=np.float64)
    band_edges = mel_center_frequencies(n_mels, fmin, fmax)  # (n_mels + 2,)

    # Triangle m rises from edge[m] to edge[m+1] and falls to edge[m+2].
    edge_diff = np.diff(band_edges)                               # (n_mels+1,)
    ramps = band_edges[:, None] - fft_freqs[None, :]              # (n_mels+2, bins)
    rising = -ramps[:-2] / edge_diff[:-1, None]
    falling = ramps[2:] / edge_diff[1:, None]
    weights = np.maximum(0.0, np.minimum(rising, falling))        # (n_mels, bins)

    # Slaney area normalization: equal energy per band.
    enorm = 2.0 / (band_edges[2 : n_mels + 2] - band_edges[:n_mels])
    weights *= enorm[:, None]

    return weights.astype(dtype)
