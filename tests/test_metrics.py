"""Unit tests for the objective quality/disentanglement metrics
(facodec_tpu/ops/metrics.py) powering cli/evaluate.py's scorecard."""

import numpy as np

from facodec_tpu.ops.metrics import (f0_autocorr, f0_correlation, mcd,
                                     si_sdr, stoi)

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


def test_mcd_properties():
    """MCD: 0 for identical signals, monotone in spectral degradation, and
    correctly scaled (a known smooth EQ tilt lands at its analytic few-dB
    value — this pins the log-magnitude convention and the 10/ln10 factor)."""
    ref = speechy()
    assert mcd(ref, ref) < 1e-6
    rng = np.random.default_rng(2)
    light = mcd(ref + 0.01 * rng.standard_normal(len(ref)), ref)
    heavy = mcd(ref + 0.2 * rng.standard_normal(len(ref)), ref)
    assert 0.0 < light < heavy
    assert np.isnan(mcd(np.zeros(10), np.zeros(10)))  # sub-frame input

    # scaling check on broadband material (no silent bands): a +6 dB power
    # shelf on the upper half of the spectrum is a smooth envelope change
    # whose cepstral distance is analytically (10/ln10)*sqrt(2*sum d_k^2)
    # ~= 4.34*sqrt(2 * 38 bins * (0.345 nats)^2) ~= 13 dB (+ transition
    # ripple). Pins the log-magnitude convention: the log-power convention
    # would double it, a missing sqrt(2) would shrink it by 1.41x.
    from scipy.signal import butter, sosfilt

    noise = rng.standard_normal(SR * 2).astype(np.float64)
    sos_lo = butter(4, 3000, fs=SR, btype="low", output="sos")
    sos_hi = butter(4, 3000, fs=SR, btype="high", output="sos")
    lo, hi = sosfilt(sos_lo, noise), sosfilt(sos_hi, noise)
    a, b = lo + hi, lo + 2.0 * hi  # +6 dB power above 3 kHz
    val = mcd(b, a)
    assert 9.0 < val < 22.0, val


def test_f0_autocorr_tracks_pitch():
    t = np.arange(SR) / SR
    for hz in (110.0, 220.0, 330.0):
        f0 = f0_autocorr(0.5 * np.sin(2 * np.pi * hz * t), SR)
        voiced = f0[f0 > 0]
        assert len(voiced) > 0.9 * len(f0)
        np.testing.assert_allclose(np.median(voiced), hz, rtol=0.03)
    # silence and noise -> mostly unvoiced
    assert np.all(f0_autocorr(np.zeros(SR), SR) == 0)


def test_f0_autocorr_tracks_glide():
    """Pitch glide 120->300 Hz over 2 s: the tracked contour must follow the
    instantaneous frequency frame by frame (the disentanglement probes in
    cli/evaluate correlate CONTOURS, not medians — a tracker that locks to
    one pitch would pass the constant-pitch test yet break them)."""
    secs = 2.0
    t = np.arange(int(secs * SR)) / SR
    inst = 120.0 * (300.0 / 120.0) ** (t / secs)  # exponential glide
    phase = 2 * np.pi * np.cumsum(inst) / SR
    f0 = f0_autocorr(0.5 * np.sin(phase), SR)
    # frame centers: frame i covers samples [i*300, i*300 + 1200)
    centers = (np.arange(len(f0)) * 300 + 600).clip(0, len(t) - 1)
    expect = inst[centers]
    voiced = f0 > 0
    assert voiced.mean() > 0.9
    rel = np.abs(f0[voiced] - expect[voiced]) / expect[voiced]
    assert np.median(rel) < 0.04, np.median(rel)
    # and the contour correlates with itself, anti-correlates with reverse
    r_fwd, _ = f0_correlation(f0, expect * voiced)
    r_rev, _ = f0_correlation(f0, (expect * voiced)[::-1])
    assert r_fwd > 0.95, r_fwd
    assert r_rev < -0.5, r_rev


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
