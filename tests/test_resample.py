"""Native polyphase resampler vs the scipy oracle, plus its wiring into
`decode_audio` (the reference accepted any input rate via ffmpeg ``-ar``,
reference `feature.py:41-49`; we accept any rate natively)."""

import numpy as np
import pytest

from sed_crnn_tpu.data import wavio
from sed_crnn_tpu.data.resample import (
    design_resample_filter,
    resample,
    resample_poly,
)

scipy_signal = pytest.importorskip("scipy.signal")


@pytest.fixture
def rng():
    return np.random.default_rng(0)


RATIOS = [(160, 441), (441, 160), (2, 1), (1, 2), (3, 7), (7, 3), (48, 44)]


@pytest.mark.parametrize("up,down", RATIOS)
def test_matches_scipy_resample_poly(rng, up, down):
    """Same Kaiser design (beta=5.0, scipy's hardcoded default) must give
    scipy's exact output up to the float32 output cast."""
    x = rng.standard_normal(2000)
    taps = design_resample_filter(up, down, beta=5.0)
    got = resample_poly(x, up, down, taps=taps)
    want = scipy_signal.resample_poly(x, up, down, window=("kaiser", 5.0))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-6)


def test_matches_scipy_on_2d_channels(rng):
    x = rng.standard_normal((1500, 2))
    taps = design_resample_filter(441, 160, beta=5.0)
    got = resample_poly(x, 441, 160, taps=taps)
    want = scipy_signal.resample_poly(x, 441, 160, window=("kaiser", 5.0), axis=0)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-6)


def test_tone_survives_16k_to_44k():
    sr_in, sr_out, f0 = 16000, 44100, 1000.0
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    y = resample(x, sr_in, sr_out)
    assert y.shape[0] == int(np.ceil(len(x) * sr_out / sr_in))
    # dominant FFT bin at f0, amplitude preserved away from the edges
    spec = np.abs(np.fft.rfft(y[2000:-2000] * np.hanning(len(y) - 4000)))
    peak_hz = np.argmax(spec) * sr_out / (len(y) - 4000)
    assert abs(peak_hz - f0) < 2.0
    mid = y[2000:-2000]
    assert abs(np.max(np.abs(mid)) - 1.0) < 0.01


def test_downsample_rejects_out_of_band(rng):
    """Energy above the target Nyquist must be attenuated, not aliased."""
    sr_in, sr_out = 44100, 16000
    t = np.arange(sr_in) / sr_in
    hi = np.sin(2 * np.pi * 15000.0 * t)  # above 8 kHz target Nyquist
    y = resample(hi, sr_in, sr_out)
    assert np.max(np.abs(y[1000:-1000])) < 0.01


def test_identity_and_gcd_reduction(rng):
    x = rng.standard_normal(500).astype(np.float32)
    same = resample(x, 44100, 44100)
    np.testing.assert_array_equal(same, x)
    # 88200/32000 reduces to 441/160 — must behave like the reduced ratio
    a = resample(x, 32000, 88200)
    b = resample_poly(x, 441, 160)
    np.testing.assert_allclose(a, b, atol=1e-7)


def test_output_length_contract(rng):
    for n in (1, 7, 64, 999):
        x = rng.standard_normal(n)
        for up, down in RATIOS:
            y = resample_poly(x, up, down)
            assert y.shape[0] == int(np.ceil(n * up / down)), (n, up, down)
    assert resample_poly(np.zeros(0), 3, 2).shape == (0,)


def test_input_validation():
    with pytest.raises(ValueError):
        resample_poly(np.zeros(8), 0, 2)
    with pytest.raises(ValueError):
        resample_poly(np.zeros((2, 2, 2)), 2, 1)
    with pytest.raises(ValueError):
        resample(np.zeros(8), 44100, 0)
    with pytest.raises(ValueError):
        resample_poly(np.zeros(8), 2, 1, taps=np.ones(4))  # even-length taps


def test_decode_audio_resamples_wav_natively(tmp_path):
    """A 16 kHz wav decodes at the 44.1 kHz pipeline rate with no ffmpeg."""
    sr_in, f0 = 16000, 880.0
    t = np.arange(2 * sr_in) / sr_in
    x = (0.5 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)
    p = str(tmp_path / "tone16k.wav")
    wavio.write_wav(p, x, sr_in)
    y = wavio.decode_audio(p, sr=44100, mono=True)
    assert y.dtype == np.float32
    assert abs(y.shape[0] - len(x) * 44100 / sr_in) <= 1
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    peak_hz = np.argmax(spec) * 44100 / len(y)
    assert abs(peak_hz - f0) < 2.0

# ---- streaming resampler: the live serving seam-free contract --------------


STREAM_RATES = [(16000, 44100), (48000, 44100), (44100, 16000), (22050, 44100)]


@pytest.mark.parametrize("sr_in,sr_out", STREAM_RATES)
def test_streaming_matches_offline_random_chunks(rng, sr_in, sr_out):
    """concat(push(c) for chunks) + flush() == resample_poly(concat(chunks))
    bit-for-bit (both paths cast to float32 at the end), for arbitrary chunk
    sizes including empty and single-sample pushes."""
    from math import gcd

    from sed_crnn_tpu.data.resample import StreamingResampler

    x = rng.standard_normal(9000).astype(np.float32)
    # adversarial chunking: empties, singles, and jagged sizes
    sizes = [0, 1, 7, 0, 1, 513, 64, 1, 2048, 0, 300]
    chunks, i = [], 0
    while i < len(x):
        for s in sizes:
            chunks.append(x[i : i + s])
            i += s
            if i >= len(x):
                break
    rs = StreamingResampler(sr_in, sr_out)
    outs = [rs.push(c) for c in chunks]
    outs.append(rs.flush())
    got = np.concatenate(outs)
    g = gcd(sr_out, sr_in)
    want = resample_poly(x, sr_out // g, sr_in // g)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_array_equal(got, want)


def test_streaming_flush_resets_for_a_new_stream(rng):
    from sed_crnn_tpu.data.resample import StreamingResampler

    x = rng.standard_normal(3000).astype(np.float32)
    rs = StreamingResampler(16000, 44100)
    first = np.concatenate([rs.push(x), rs.flush()])
    second = np.concatenate([rs.push(x), rs.flush()])
    np.testing.assert_array_equal(first, second)


def test_serve_resampled_chunks_matches_offline(rng):
    """The serve.py adapter wraps StreamingResampler; its concatenated
    output must equal offline resampling of the concatenated stream."""
    from math import gcd

    from sed_crnn_tpu.apps.serve import resampled_chunks

    x = rng.standard_normal(5000).astype(np.float32)
    chunks = [x[:1], x[1:1500], x[1500:1500], x[1500:4000], x[4000:]]
    got = np.concatenate(list(resampled_chunks(iter(chunks), 48000, 44100)))
    g = gcd(44100, 48000)
    want = resample_poly(x, 44100 // g, 48000 // g)
    np.testing.assert_array_equal(got, want)
