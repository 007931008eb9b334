"""Independent numpy/scipy oracle reproducing the librosa-0.7 semantics the
reference frontend relies on (`/root/reference/feature.py:55-59`): centered
reflect-padded STFT with a periodic Hann window, |.|^2 power spectrum, and a
Slaney-scale / slaney-normalized 40-band mel filterbank, natural log, no eps.

Written directly from the published DSP formulas (Slaney 1998 auditory
toolbox mel scale) as a *test oracle* — deliberately simple, float64, scipy
FFT — so the device frontend can be checked against it numerically. librosa
itself is not installed in this environment.
"""

import numpy as np
import scipy.fft


def oracle_hann(n):
    # periodic ("fftbins") Hann
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)


def oracle_stft_power(y, n_fft=2048, hop=1024):
    y = np.asarray(y, dtype=np.float64)
    ypad = np.pad(y, n_fft // 2, mode="reflect")
    n_frames = 1 + (len(ypad) - n_fft) // hop
    win = oracle_hann(n_fft)
    out = np.empty((n_frames, 1 + n_fft // 2), dtype=np.float64)
    for t in range(n_frames):
        seg = ypad[t * hop : t * hop + n_fft] * win
        spec = scipy.fft.rfft(seg)
        out[t] = np.abs(spec) ** 2
    return out


def _hz2mel(f):
    f = np.asarray(f, dtype=np.float64)
    out = f / (200.0 / 3.0)
    brk = 1000.0 / (200.0 / 3.0)
    hi = f >= 1000.0
    out = np.where(hi, brk + np.log(np.where(hi, f, 1.0) / 1000.0) / (np.log(6.4) / 27.0), out)
    return out


def _mel2hz(m):
    m = np.asarray(m, dtype=np.float64)
    out = m * (200.0 / 3.0)
    brk = 1000.0 / (200.0 / 3.0)
    hi = m >= brk
    out = np.where(hi, 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - brk)), out)
    return out


def oracle_mel_fb(sr=44100, n_fft=2048, n_mels=40, fmin=0.0, fmax=None):
    if fmax is None:
        fmax = sr / 2.0
    fftfreqs = np.linspace(0, sr / 2.0, 1 + n_fft // 2)
    pts = _mel2hz(np.linspace(_hz2mel(fmin), _hz2mel(fmax), n_mels + 2))
    fb = np.zeros((n_mels, len(fftfreqs)))
    for m in range(n_mels):
        left, center, right = pts[m], pts[m + 1], pts[m + 2]
        up = (fftfreqs - left) / (center - left)
        down = (right - fftfreqs) / (right - center)
        tri = np.maximum(0.0, np.minimum(up, down))
        fb[m] = tri * (2.0 / (right - left))
    return fb


def oracle_log_mel(y, sr=44100, n_fft=2048, hop=1024, n_mels=40):
    """(frames, n_mels) natural-log mel-band energies, float64."""
    power = oracle_stft_power(y, n_fft, hop)
    fb = oracle_mel_fb(sr, n_fft, n_mels)
    return np.log(power @ fb.T)
