"""Frontend parity: device log-mel vs the independent librosa-semantics
oracle (reference `feature.py:55-59` behavior)."""

import numpy as np
import pytest

import jax.numpy as jnp

from sed_crnn_tpu.core.config import FrontendConfig
from sed_crnn_tpu.ops import frontend, stft
from sed_crnn_tpu.ops.mel import mel_filterbank

from tests.oracle.librosa_ref import (
    oracle_hann,
    oracle_log_mel,
    oracle_mel_fb,
    oracle_stft_power,
)


def _tone_mix(rng, n, sr=44100):
    t = np.arange(n) / sr
    y = (
        0.4 * np.sin(2 * np.pi * 440.0 * t)
        + 0.2 * np.sin(2 * np.pi * 3517.0 * t + 0.3)
        + 0.05 * rng.standard_normal(n)
    )
    return y.astype(np.float32)


def test_hann_window_matches_oracle():
    np.testing.assert_allclose(stft.hann_window(2048), oracle_hann(2048), atol=1e-7)


def test_mel_filterbank_matches_oracle():
    fb = mel_filterbank(44100, 2048, 40)
    ref = oracle_mel_fb(44100, 2048, 40)
    assert fb.shape == (40, 1025)
    np.testing.assert_allclose(fb, ref, rtol=1e-5, atol=1e-9)
    # every interior band should have positive area
    assert (fb.sum(axis=1) > 0).all()


def test_oracle_stft_cross_checked_by_torch(rng):
    """Validate the hand-written oracle ITSELF against torch.stft — an
    independent third implementation of the same semantics (centered
    reflect pad, periodic Hann, one-sided power spectrum). librosa is not
    installed here, so this pins the oracle's trustworthiness."""
    torch = pytest.importorskip("torch")
    y = _tone_mix(rng, 44100 + 999).astype(np.float64)
    ref = oracle_stft_power(y)
    spec = torch.stft(
        torch.from_numpy(y),
        n_fft=2048,
        hop_length=1024,
        window=torch.hann_window(2048, periodic=True, dtype=torch.float64),
        center=True,
        pad_mode="reflect",
        return_complex=True,
    )
    got = (spec.abs() ** 2).numpy().T  # (freq, frames) -> (frames, freq)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got / ref.max(), ref / ref.max(), atol=1e-12)


def test_frame_count_matches_oracle(rng):
    for n in [2048, 44100, 44100 * 2 + 777]:
        y = _tone_mix(rng, n)
        frames = stft.num_frames(n, 2048, 1024)
        assert frames == oracle_stft_power(y).shape[0]


@pytest.mark.parametrize("backend", ["fft", "matmul"])
def test_stft_power_parity(rng, backend):
    y = _tone_mix(rng, 44100)  # 1 second
    got = np.asarray(stft.stft_power(jnp.asarray(y), 2048, 1024, backend=backend))
    ref = oracle_stft_power(y)
    assert got.shape == ref.shape
    # float32 device FFT vs float64 oracle: compare relative to spectrum peak
    scale = ref.max()
    np.testing.assert_allclose(got / scale, ref / scale, atol=5e-6)


@pytest.mark.parametrize("backend", ["fft", "matmul"])
def test_log_mel_parity(rng, backend):
    y = _tone_mix(rng, 44100 + 12345)
    cfg = FrontendConfig(backend=backend)
    got = frontend.extract(y, cfg)
    ref = oracle_log_mel(y)
    assert got.shape == ref.shape == (stft.num_frames(len(y), 2048, 1024), 40)
    np.testing.assert_allclose(got, ref, atol=2e-4)


@pytest.mark.parametrize("mode,atol", [("exact", 2e-4), ("bf16x3", 5e-4)])
def test_pallas_fused_log_mel_parity(rng, mode, atol):
    """The fused Pallas kernel (interpreted on CPU) vs the oracle, in both
    precision modes: exact f32 and the hi/lo-split bf16x3 fast path."""
    from sed_crnn_tpu.ops.pallas.fused_logmel import fused_log_mel

    import jax

    y = _tone_mix(rng, 44100)
    got = np.asarray(
        jax.jit(lambda w: fused_log_mel(w, FrontendConfig(), mode))(jnp.asarray(y))
    )
    ref = oracle_log_mel(y)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=atol)


def test_pallas_bf16x3_pure_tone_energetic_bands(rng):
    """Pure tones are the hard case for reduced-precision spectral kernels:
    off-tone mel bands sit at the Hann sidelobe floor (~-120 dB), where even
    the f32 rfft backend disagrees with the f32 matmul backend by whole log
    units. What must hold — and what this pins — is agreement on every band
    within 60 dB of the frame peak (measured 1.3e-2 on hardware and under
    the interpreter)."""
    from sed_crnn_tpu.ops.pallas.fused_logmel import fused_log_mel

    import jax

    t = np.arange(44100 * 2) / 44100.0
    y = (0.3 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    cfg = FrontendConfig()
    got = np.asarray(jax.jit(lambda w: fused_log_mel(w, cfg))(jnp.asarray(y)))
    ref = oracle_log_mel(y)
    hot = ref > ref.max() - 20.0  # natural-log window ~ top 60 dB and louder
    assert hot.any()
    np.testing.assert_allclose(got[hot], ref[hot], atol=5e-2)


def test_pallas_bf16x3_odd_nfft_falls_back(rng):
    """n_fft not divisible by 4 cannot take the DIF split; bf16x3 must fall
    back to the exact grid rather than mis-factorize."""
    from sed_crnn_tpu.ops.pallas import fused_logmel

    import jax

    cfg = FrontendConfig(n_fft=1034, hop_length=517)
    y = _tone_mix(rng, 44100)
    got = np.asarray(
        jax.jit(lambda w: fused_logmel.fused_log_mel(w, cfg))(jnp.asarray(y))
    )
    ref = np.asarray(frontend.log_mel_energies(jnp.asarray(y), cfg))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_log_mel_framing_vs_gather_path(rng):
    # hop that does not divide n_fft exercises the gather fallback
    y = _tone_mix(rng, 20000)
    a = np.asarray(stft.frame_signal(jnp.asarray(y), 2048, 1024))
    b = np.asarray(stft.frame_signal(jnp.asarray(y), 2048, 1000))
    assert a.shape[1] == b.shape[1] == 2048
    # the two paths agree where hops coincide (frame 0)
    np.testing.assert_allclose(a[0], b[0], atol=0)


def test_norm_stats_match_sklearn(rng):
    from sklearn.preprocessing import StandardScaler

    x = rng.standard_normal((500, 40)).astype(np.float32) * 3.1 + 0.7
    x[:, 7] = 2.5  # zero-variance bin -> scale must stay 1
    stats = frontend.fit_norm_stats(jnp.asarray(x))
    sk = StandardScaler().fit(x)
    np.testing.assert_allclose(np.asarray(stats.mean), sk.mean_, atol=1e-4)
    np.testing.assert_allclose(np.asarray(stats.scale), sk.scale_, rtol=1e-4)

    got = np.asarray(frontend.normalize(jnp.asarray(x), stats))
    ref = sk.transform(x)
    np.testing.assert_allclose(got, ref, atol=1e-3)


def test_bucketed_extract_exact_vs_unbucketed(rng):
    """Length bucketing (host reflect-pad + zero-extend + trim) must match
    per-length compilation for awkward lengths, incl. the tail frames —
    windows see identical samples; only GEMM tiling noise (~1e-6, shape-
    dependent accumulation order) may differ."""
    for n in [2048, 30000, 44100 + 977, 44100 * 2]:
        y = _tone_mix(rng, n)
        cfg = FrontendConfig()
        bucketed = frontend.extract(y, cfg, bucket_seconds=1.0)
        exact = frontend.extract(y, cfg, bucket_seconds=0)
        assert bucketed.shape == exact.shape
        np.testing.assert_allclose(bucketed, exact, atol=1e-5)


def test_log_floor_guards_silence():
    y = np.zeros(8192, dtype=np.float32)
    cfg = FrontendConfig(log_floor=1e-30)
    out = frontend.extract(y, cfg)
    assert np.isfinite(out).all()
    # parity mode reproduces the reference's -inf on silence
    out_parity = frontend.extract(y, FrontendConfig())
    assert np.isneginf(out_parity).all()


def test_pallas_chunked_matches_framed_path():
    """The hop == n_fft/2 chunked-DMA fast path must be bit-identical to the
    framed DIF kernel (same windows, same samples, same GEMMs) for even and
    ragged signal lengths."""
    import jax.numpy as jnp

    from sed_crnn_tpu.core.config import FrontendConfig
    from sed_crnn_tpu.ops.pallas.fused_logmel import (
        frame_signal,
        fused_log_mel,
        fused_log_mel_frames,
    )

    cfg = FrontendConfig()
    rng = np.random.default_rng(11)
    for n in (44100, 44100 * 2 + 777, 2048):
        y = jnp.asarray(rng.standard_normal(n).astype(np.float32) * 0.3)
        fast = fused_log_mel(y, cfg)
        frames = frame_signal(y, cfg.n_fft, cfg.hop_length, center=cfg.center)
        ref = fused_log_mel_frames(frames.astype(jnp.float32), cfg)
        assert fast.shape == ref.shape
        np.testing.assert_array_equal(np.asarray(fast), np.asarray(ref))
