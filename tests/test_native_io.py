"""Native C++ WAV decoder vs the scipy reference path."""

import numpy as np
import pytest
from scipy.io import wavfile

from facodec_tpu import native

SR = 24000


def _tone(n, hz=220.0, sr=SR):
    t = np.arange(n) / sr
    return (0.5 * np.sin(2 * np.pi * hz * t)).astype(np.float32)


@pytest.fixture(scope="module", autouse=True)
def _require_native():
    if not native.available():
        pytest.skip("native toolchain unavailable")


def test_native_pcm16_matches_scipy(tmp_path):
    w = _tone(SR // 2)
    path = str(tmp_path / "a.wav")
    wavfile.write(path, SR, (w * 32767).astype(np.int16))
    got = native.load_wav_native(path, SR)
    want = wavfile.read(path)[1].astype(np.float32) / 32767.0
    assert got is not None and len(got) == len(want)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_native_float32_and_stereo(tmp_path):
    w = _tone(SR // 4)
    stereo = np.stack([w, -w], axis=1)  # mono mix -> ~0
    path = str(tmp_path / "s.wav")
    wavfile.write(path, SR, stereo)
    got = native.load_wav_native(path, SR)
    assert got is not None
    np.testing.assert_allclose(got, np.zeros_like(w), atol=1e-6)


def test_native_resample(tmp_path):
    sr_in = 48000
    w = _tone(sr_in, sr=sr_in)
    path = str(tmp_path / "r.wav")
    wavfile.write(path, sr_in, (w * 32767).astype(np.int16))
    got = native.load_wav_native(path, SR)
    assert got is not None
    assert abs(len(got) - SR) <= 1
    # compare against numpy linear resample
    t_out = np.arange(len(got)) * (sr_in / SR)
    j = t_out.astype(int)
    frac = t_out - j
    j1 = np.minimum(j + 1, len(w) - 1)
    want = (w[j] * (1 - frac) + w[j1] * frac) * (32767 / 32768.0)
    np.testing.assert_allclose(got, want.astype(np.float32), atol=2e-3)


def test_native_batch_and_missing(tmp_path):
    w = _tone(SR // 8)
    p1 = str(tmp_path / "b1.wav")
    wavfile.write(p1, SR, (w * 32767).astype(np.int16))
    out = native.load_batch([p1, str(tmp_path / "missing.wav"), p1], SR, workers=3)
    assert out[0] is not None and out[2] is not None
    assert out[1] is None
    np.testing.assert_allclose(out[0], out[2])


def test_data_pipeline_uses_native(tmp_path):
    from facodec_tpu.train.data import load_wav

    w = _tone(SR // 4)
    path = str(tmp_path / "d.wav")
    wavfile.write(path, SR, (w * 32767).astype(np.int16))
    got = load_wav(path)
    np.testing.assert_allclose(got, w, atol=2e-4)
