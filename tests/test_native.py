"""Native C++ frontend: builds with g++ at test time, parity vs the scipy
oracle and the native WAV reader vs the python one."""

import numpy as np
import pytest

from sed_crnn_tpu.data import wavio
from sed_crnn_tpu.utils import native

from tests.oracle.librosa_ref import oracle_log_mel

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="g++ and sources unavailable"
)


@pytest.fixture(scope="module")
def built():
    return native.build_library()


def test_native_logmel_matches_oracle(built, rng):
    t = np.arange(44100) / 44100.0
    y = (
        0.4 * np.sin(2 * np.pi * 440 * t)
        + 0.2 * np.sin(2 * np.pi * 3517 * t)
        + 0.05 * rng.standard_normal(t.size)
    ).astype(np.float32)
    got = native.log_mel_native(y)
    ref = oracle_log_mel(y)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-5)


def test_native_logmel_floor_and_silence(built):
    y = np.zeros(8192, np.float32)
    out = native.log_mel_native(y, log_floor=1e-30)
    assert np.isfinite(out).all()
    out_parity = native.log_mel_native(y)
    assert np.isneginf(out_parity).all()


def test_native_rejects_nonpositive_args(built):
    with pytest.raises(ValueError, match="positive"):
        native.log_mel_native(np.zeros(4096, np.float32), n_fft=-4)


def test_native_non_power_of_two_nfft_matches_oracle(built, rng):
    """Arbitrary n_fft runs through the Bluestein chirp-z path and must match
    the scipy oracle as tightly as the radix-2 path does."""
    from tests.oracle.librosa_ref import oracle_log_mel

    t = np.arange(44100) / 44100.0
    y = (0.4 * np.sin(2 * np.pi * 440 * t)
         + 0.05 * rng.standard_normal(t.size)).astype(np.float32)
    for n_fft in (1000, 1536):
        hop = n_fft // 2
        got = native.log_mel_native(y, n_fft=n_fft, hop=hop)
        ref = oracle_log_mel(y, n_fft=n_fft, hop=hop)
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-5)


def test_native_wav_reader_matches_python(built, tmp_path, rng):
    x = rng.uniform(-0.5, 0.5, (5000, 2)).astype(np.float32)
    p = str(tmp_path / "t.wav")
    wavio.write_wav(p, x, 44100)
    got, sr = native.wav_read_mono_native(p)
    ref, sr_ref = wavio.read_wav(p, mono=True)
    assert sr == sr_ref == 44100
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_native_wav_reader_rejects_garbage(built, tmp_path):
    p = str(tmp_path / "bad.wav")
    with open(p, "wb") as f:
        f.write(b"definitely not RIFF")
    with pytest.raises(ValueError):
        native.wav_read_mono_native(p)


class TestStreamingFramer:
    """Native incremental framer vs whole-signal `frame_signal`."""

    def _ref(self, y, n_fft, hop, center):
        import jax.numpy as jnp

        from sed_crnn_tpu.ops.stft import frame_signal

        return np.asarray(frame_signal(jnp.asarray(y), n_fft, hop, center))

    @pytest.mark.parametrize("center", [True, False])
    def test_chunked_feed_matches_whole_signal(self, rng, center):
        from sed_crnn_tpu.utils.native import StreamingFramer, native_available

        if not native_available():
            pytest.skip("no g++ / native source")
        n_fft, hop = 256, 128
        y = rng.standard_normal(n_fft * 7 + 41).astype(np.float32)
        fr = StreamingFramer(n_fft, hop, center)
        got, i = [], 0
        while i < len(y):
            step = int(rng.integers(1, 700))
            got.append(fr.feed(y[i : i + step]))
            i += step
        got.append(fr.flush())
        got = np.concatenate([g for g in got if g.size], axis=0)
        want = self._ref(y, n_fft, hop, center)
        assert got.shape == want.shape
        np.testing.assert_array_equal(got, want)

    def test_flush_guards(self, rng):
        from sed_crnn_tpu.utils.native import StreamingFramer, native_available

        if not native_available():
            pytest.skip("no g++ / native source")
        fr = StreamingFramer(256, 128, True)
        fr.feed(rng.standard_normal(10).astype(np.float32))
        with pytest.raises(ValueError):  # < n_fft/2 samples: reflect undefined
            fr.flush()
        fr2 = StreamingFramer(256, 128, True)
        fr2.feed(rng.standard_normal(300).astype(np.float32))
        fr2.flush()
        with pytest.raises(RuntimeError):
            fr2.flush()
