"""Unit tests for the objective quality/disentanglement metrics
(facodec_tpu/ops/metrics.py) powering cli/evaluate.py's scorecard."""

import numpy as np

from facodec_tpu.ops.metrics import f0_autocorr, f0_correlation, si_sdr, stoi

SR = 24000


def speechy(seconds=2.0, f0=160.0, seed=0):
    """Amplitude- and pitch-modulated harmonic signal (speech-like for STOI's
    band-correlation statistics)."""
    t = np.arange(int(seconds * SR)) / SR
    vib = f0 * (1 + 0.04 * np.sin(2 * np.pi * 3.0 * t))
    phase = 2 * np.pi * np.cumsum(vib) / SR
    x = sum(np.sin(k * phase) / k for k in (1, 2, 3, 4))
    env = 0.55 + 0.45 * np.sin(2 * np.pi * 2.5 * t)
    x = (x * env).astype(np.float64)
    return 0.3 * x / np.abs(x).max()


def test_si_sdr_properties():
    ref = speechy()
    assert si_sdr(ref, ref) > 60.0
    rng = np.random.default_rng(0)
    deg = ref + 0.05 * rng.standard_normal(len(ref))
    assert abs(si_sdr(0.25 * deg, ref) - si_sdr(deg, ref)) < 1e-6  # scale-inv
    noisy = ref + 0.1 * rng.standard_normal(len(ref)) * ref.std() / 0.1 * 0.316
    # ~10 dB SNR noise -> si_sdr near 10 dB
    val = si_sdr(noisy, ref)
    assert 5.0 < val < 15.0
    assert si_sdr(rng.standard_normal(len(ref)), ref) < 1.0


def test_stoi_properties():
    ref = speechy()
    perfect = stoi(ref, ref, SR)
    assert perfect > 0.98
    rng = np.random.default_rng(1)
    light = stoi(ref + 0.02 * rng.standard_normal(len(ref)), ref, SR)
    heavy = stoi(ref + 0.5 * rng.standard_normal(len(ref)), ref, SR)
    assert perfect >= light > heavy
    assert heavy < 0.75
    assert np.isnan(stoi(np.zeros(1000), np.zeros(1000), SR))  # too short


def test_f0_autocorr_tracks_pitch():
    t = np.arange(SR) / SR
    for hz in (110.0, 220.0, 330.0):
        f0 = f0_autocorr(0.5 * np.sin(2 * np.pi * hz * t), SR)
        voiced = f0[f0 > 0]
        assert len(voiced) > 0.9 * len(f0)
        np.testing.assert_allclose(np.median(voiced), hz, rtol=0.03)
    # silence and noise -> mostly unvoiced
    assert np.all(f0_autocorr(np.zeros(SR), SR) == 0)


def test_f0_correlation():
    ref = speechy(f0=140.0)
    f0a = f0_autocorr(ref, SR)
    r, agree = f0_correlation(f0a, f0a)
    assert abs(r - 1.0) < 1e-9 and agree == 1.0
    # an unrelated constant-pitch track: low |r|, defined
    t = np.arange(len(ref)) / SR
    other = f0_autocorr(0.5 * np.sin(2 * np.pi * 200.0 * t), SR)
    r2, _ = f0_correlation(f0a, other)
    assert np.isnan(r2) or abs(r2) < 0.9
    # no co-voiced frames -> nan
    r3, agree3 = f0_correlation(np.zeros(10), np.ones(10) * 100)
    assert np.isnan(r3) and agree3 == 0.0
