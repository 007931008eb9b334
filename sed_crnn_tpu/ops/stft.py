"""Framed STFT / power-spectrum ops, TPU-first.

Reproduces the reference frontend's STFT semantics (`feature.py:56`,
librosa-0.7 defaults): centered frames with reflect padding of ``n_fft // 2``
samples, periodic Hann window of length ``n_fft``, hop ``n_fft // 2``.

Two device formulations:

* ``backend="fft"``    — frame + window + ``jnp.fft.rfft``. XLA lowers the
  FFT natively; good default.
* ``backend="matmul"`` — windowed real DFT as two GEMMs (frames @ cos-basis,
  frames @ sin-basis, then square-add). The DFT basis absorbs the window, so
  the whole frontend becomes matmul -> elementwise -> matmul: pure MXU work.
  This is also the formulation the fused Pallas kernel uses.

Framing avoids gathers when ``n_fft`` is a multiple of ``hop`` (the
reference's 50% overlap case): the padded signal is reshaped into hop-sized
chunks and frames are assembled from ``n_fft // hop`` shifted slices.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(n: int, dtype=np.float32) -> np.ndarray:
    """Periodic ("fftbins") Hann window, as used by librosa's STFT."""
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)).astype(dtype)


def num_frames(n_samples: int, n_fft: int, hop: int, center: bool = True) -> int:
    padded = n_samples + (n_fft if center else 0)
    return 1 + (padded - n_fft) // hop


def frame_signal(y: jnp.ndarray, n_fft: int, hop: int, center: bool = True) -> jnp.ndarray:
    """Slice a 1-D signal into overlapping frames, shape ``(n_frames, n_fft)``."""
    if center:
        y = jnp.pad(y, n_fft // 2, mode="reflect")
    n = y.shape[0]
    n_frames = 1 + (n - n_fft) // hop

    if n_fft % hop == 0:
        ratio = n_fft // hop
        n_chunks = n // hop
        chunks = y[: n_chunks * hop].reshape(n_chunks, hop)
        # Frame t = chunks[t], chunks[t+1], ..., chunks[t+ratio-1] laid flat.
        parts = [chunks[s : s + n_frames] for s in range(ratio)]
        return jnp.concatenate(parts, axis=1)

    starts = np.arange(n_frames) * hop
    idx = starts[:, None] + np.arange(n_fft)[None, :]
    return y[idx]


@lru_cache(maxsize=8)
def _dft_bases(n_fft: int, windowed: bool) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT cos/sin bases ``(n_fft, n_bins)``, optionally window-folded."""
    n_bins = 1 + n_fft // 2
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_bins, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    cos_b, sin_b = np.cos(ang), -np.sin(ang)
    if windowed:
        w = hann_window(n_fft, np.float64)[:, None]
        cos_b, sin_b = cos_b * w, sin_b * w
    return cos_b.astype(np.float32), sin_b.astype(np.float32)


def power_spectrum_fft(frames: jnp.ndarray, n_fft: int, window: jnp.ndarray) -> jnp.ndarray:
    """|rFFT(frames * window)|^2 -> ``(n_frames, 1 + n_fft // 2)``."""
    spec = jnp.fft.rfft(frames * window, n=n_fft)
    return jnp.real(spec) ** 2 + jnp.imag(spec) ** 2


def power_spectrum_matmul(frames: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    """Windowed power spectrum as two GEMMs (window folded into the basis)."""
    cos_b, sin_b = _dft_bases(n_fft, windowed=True)
    re = jnp.dot(frames, cos_b, precision=jax.lax.Precision.HIGHEST)
    im = jnp.dot(frames, sin_b, precision=jax.lax.Precision.HIGHEST)
    return re * re + im * im


def stft_power(
    y: jnp.ndarray,
    n_fft: int,
    hop: int,
    center: bool = True,
    backend: str = "fft",
) -> jnp.ndarray:
    """Power spectrogram ``(n_frames, 1 + n_fft // 2)`` of a 1-D signal."""
    if backend not in ("fft", "matmul"):
        raise ValueError(f"unknown STFT backend {backend!r}; expected 'fft' or 'matmul'")
    frames = frame_signal(y, n_fft, hop, center=center)
    if backend == "matmul":
        return power_spectrum_matmul(frames, n_fft)
    window = jnp.asarray(hann_window(n_fft))
    return power_spectrum_fft(frames, n_fft, window)
