"""Spectral reconstruction losses on XLA FFT.

Numerically matches the reference's audiotools-based criteria
(/root/reference/dac/nn/loss.py):

  * `MultiScaleSTFTLoss` (:142-228): per-window log-magnitude + magnitude L1.
  * `MelSpectrogramLoss` (:231-327): multi-scale mel L1; audiotools mels use
    the **librosa slaney** mel scale and slaney filter normalization (unlike
    the codec front-end's torchaudio HTK mels — both live in this repo).
  * `L1Loss` (:11-48) and `SISDRLoss` (:51-140) on raw waveforms.

TPU notes: every scale is a static-shape rFFT + one (T', F) x (F, M) MXU
matmul; all scales fuse into one jitted program with the rest of the
generator loss. Filterbanks are numpy constants baked at trace time.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from facodec_tpu.ops.spectral import stft

# ------------------------------------------------------------ librosa mels


def _hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    f = np.asarray(f, dtype=np.float64)
    mel = 3.0 * f / 200.0
    min_log_hz = 1000.0
    min_log_mel = 15.0
    logstep = math.log(6.4) / 27.0
    above = f >= min_log_hz
    mel = np.where(above, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mel)
    return mel


def _mel_to_hz_slaney(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f = 200.0 * m / 3.0
    min_log_hz = 1000.0
    min_log_mel = 15.0
    logstep = math.log(6.4) / 27.0
    above = m >= min_log_mel
    return np.where(above, min_log_hz * np.exp(logstep * (m - min_log_mel)), f)


@functools.lru_cache(maxsize=64)
def _librosa_mel_fbank_np(
    sr: int, n_fft: int, n_mels: int, fmin: float, fmax: Optional[float]
) -> np.ndarray:
    """librosa.filters.mel(htk=False, norm='slaney') -> (n_freqs, n_mels).

    This is what audiotools' AudioSignal.mel_spectrogram uses, hence what the
    reference's MelSpectrogramLoss compares.
    """
    if fmax is None:
        fmax = sr / 2.0
    n_freqs = 1 + n_fft // 2
    fftfreqs = np.linspace(0.0, sr / 2.0, n_freqs)
    mel_f = _mel_to_hz_slaney(
        np.linspace(_hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax), n_mels + 2)
    )
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]  # (n_mels+2, n_freqs)
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]
    return weights.T.astype(np.float32)  # (n_freqs, n_mels)


def librosa_mel_fbank(sr, n_fft, n_mels, fmin=0.0, fmax=None) -> jnp.ndarray:
    return jnp.asarray(_librosa_mel_fbank_np(sr, n_fft, n_mels, fmin, fmax))


# ----------------------------------------------------------------- helpers


def _magnitude(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """|STFT| with audiotools defaults: hann, win == n_fft == w, hop w//4,
    center=True reflect. (B, T) -> (B, frames, w//2+1)."""
    return jnp.abs(stft(x, n_fft=w, hop_length=w // 4, win_length=w))


def _l1(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a - b))


# ------------------------------------------------------------------ losses


def multi_scale_stft_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    window_lengths: Sequence[int] = (2048, 512),
    clamp_eps: float = 1e-5,
    mag_weight: float = 1.0,
    log_weight: float = 1.0,
    pow: float = 2.0,
) -> jnp.ndarray:
    """Reference MultiScaleSTFTLoss defaults (loss.py:142-228). Waves (B, T)."""
    loss = 0.0
    for w in window_lengths:
        xm = _magnitude(pred, w)
        ym = _magnitude(target, w)
        xl = jnp.log10(jnp.power(jnp.maximum(xm, clamp_eps), pow))
        yl = jnp.log10(jnp.power(jnp.maximum(ym, clamp_eps), pow))
        loss = loss + log_weight * _l1(xl, yl) + mag_weight * _l1(xm, ym)
    return loss


def mel_spectrogram_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    sample_rate: int = 24000,
    n_mels: Sequence[int] = (5, 10, 20, 40, 80, 160, 320),
    window_lengths: Sequence[int] = (32, 64, 128, 256, 512, 1024, 2048),
    clamp_eps: float = 1e-5,
    mag_weight: float = 0.0,
    log_weight: float = 1.0,
    pow: float = 1.0,
    mel_fmin: Optional[Sequence[float]] = None,
    mel_fmax: Optional[Sequence[Optional[float]]] = None,
) -> jnp.ndarray:
    """Reference 7-scale mel loss as configured by train.py:155-163.
    Waves (B, T); mels via librosa-slaney filterbanks on |STFT|."""
    if mel_fmin is None:
        mel_fmin = [0.0] * len(n_mels)
    if mel_fmax is None:
        mel_fmax = [None] * len(n_mels)
    loss = 0.0
    for m, w, lo, hi in zip(n_mels, window_lengths, mel_fmin, mel_fmax):
        fb = librosa_mel_fbank(sample_rate, w, m, lo, hi)
        xm = _magnitude(pred, w) @ fb
        ym = _magnitude(target, w) @ fb
        xl = jnp.log10(jnp.power(jnp.maximum(xm, clamp_eps), pow))
        yl = jnp.log10(jnp.power(jnp.maximum(ym, clamp_eps), pow))
        loss = loss + log_weight * _l1(xl, yl) + mag_weight * _l1(xm, ym)
    return loss


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Plain waveform L1 (reference loss.py:11-48)."""
    return _l1(pred, target)


def sisdr_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    scaling: bool = True,
    zero_mean: bool = True,
    clip_min: Optional[float] = None,
) -> jnp.ndarray:
    """Negative SI-SDR (reference loss.py:51-140). Waves (B, T)."""
    eps = 1e-8
    references = target.reshape(target.shape[0], -1, 1)
    estimates = pred.reshape(pred.shape[0], -1, 1)
    if zero_mean:
        references = references - jnp.mean(references, axis=1, keepdims=True)
        estimates = estimates - jnp.mean(estimates, axis=1, keepdims=True)
    ref_proj = jnp.sum(jnp.square(references), axis=-2) + eps
    ref_on_est = jnp.sum(estimates * references, axis=-2) + eps
    scale = (ref_on_est / ref_proj)[:, None] if scaling else 1.0
    e_true = scale * references
    e_res = estimates - e_true
    signal = jnp.sum(jnp.square(e_true), axis=1)
    noise = jnp.sum(jnp.square(e_res), axis=1)
    sdr = -10.0 * jnp.log10(signal / noise + eps)
    if clip_min is not None:
        sdr = jnp.maximum(sdr, clip_min)
    return jnp.mean(sdr)
