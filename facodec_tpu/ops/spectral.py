"""STFT / mel front-end with exact torch-semantics, lowered to XLA FFT.

Numerically matches the reference's `torchaudio.transforms.MelSpectrogram`
front-end (reference: /root/reference/meldataset.py:28-47 and
/root/reference/modules/quantize.py:219-242): n_fft 2048, win 1200, hop 300,
80 HTK mels, power-2 spectrogram, centered reflect padding, and the
log-mel normalization `(log(1e-5 + mel) + 4) / 4`.

Design notes (TPU):
  * Framing is a static gather; the FFT lowers to XLA's TPU FFT; the mel
    projection is a single (frames, n_freqs) x (n_freqs, n_mels) matmul that
    rides the MXU.
  * All shape math is static so everything fuses under jit.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax.numpy as jnp
import numpy as np
from jax import lax


def hann_window(win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window, matching `torch.hann_window(N, periodic=True)`."""
    n = np.arange(win_length)
    w = 0.5 - 0.5 * np.cos(2.0 * math.pi * n / win_length)
    return jnp.asarray(w, dtype=dtype)


def _hz_to_mel_htk(f: np.ndarray) -> np.ndarray:
    return 2595.0 * np.log10(1.0 + f / 700.0)


def _mel_to_hz_htk(m: np.ndarray) -> np.ndarray:
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


@functools.lru_cache(maxsize=32)
def _mel_filterbank_np(
    n_freqs: int,
    n_mels: int,
    sample_rate: int,
    f_min: float,
    f_max: Optional[float],
    norm: Optional[str],
) -> np.ndarray:
    """Triangular mel filterbank, matching `torchaudio.functional.melscale_fbanks`
    with `mel_scale="htk"` (the reference's default). Returns (n_freqs, n_mels)."""
    if f_max is None:
        f_max = sample_rate / 2.0
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_min = _hz_to_mel_htk(np.asarray(f_min))
    m_max = _hz_to_mel_htk(np.asarray(f_max))
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz_htk(m_pts)

    f_diff = f_pts[1:] - f_pts[:-1]  # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down_slopes = (-slopes[:, :-2]) / f_diff[:-1]
    up_slopes = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down_slopes, up_slopes))
    if norm == "slaney":
        enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
        fb = fb * enorm[None, :]
    return fb.astype(np.float32)


def mel_filterbank(
    n_freqs: int,
    n_mels: int,
    sample_rate: int,
    f_min: float = 0.0,
    f_max: Optional[float] = None,
    norm: Optional[str] = None,
) -> jnp.ndarray:
    return jnp.asarray(_mel_filterbank_np(n_freqs, n_mels, sample_rate, f_min, f_max, norm))


def _frame(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """(B, T) -> (B, n_frames, frame_length).

    Overlapping frames are built by a hop-fold reshape plus ceil(frame/hop)
    shifted CONTIGUOUS slices — bit-identical to the naive row gather but it
    runs at copy bandwidth where the gather ran ~50x slower (15.9 ms for a
    105 MB gather in the flagship round trip; scripts/profile_roundtrip.py).
    """
    n_frames = 1 + (x.shape[-1] - frame_length) // hop
    if hop <= frame_length:
        k = -(-frame_length // hop)  # fold rows spanned by one frame
        rows = n_frames + k
        need = rows * hop
        xp = x[:, :need] if x.shape[-1] >= need else jnp.pad(
            x, ((0, 0), (0, need - x.shape[-1])))
        fold = xp.reshape(x.shape[0], rows, hop)
        frames = jnp.concatenate(
            [fold[:, j:j + n_frames] for j in range(k)], axis=-1)
        return frames[:, :, :frame_length]
    idx = np.arange(n_frames)[:, None] * hop + np.arange(frame_length)[None, :]
    return x[:, idx]


def stft(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    window: Optional[jnp.ndarray] = None,
    center: bool = True,
    pad_mode: str = "reflect",
) -> jnp.ndarray:
    """Complex STFT matching `torch.stft(..., onesided=True, normalized=False)`.

    Input (B, T) -> output (B, n_frames, n_fft // 2 + 1), complex64.
    (Torch returns (B, F, n_frames); we keep time-major NTC layout.)
    """
    if window is None:
        window = hann_window(win_length, dtype=x.dtype)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    if center:
        p = n_fft // 2
        x = jnp.pad(x, ((0, 0), (p, p)), mode=pad_mode)
    frames = _frame(x, n_fft, hop_length)
    frames = frames * window[None, None, :]
    return jnp.fft.rfft(frames, n=n_fft, axis=-1)


def spectrogram(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    power: float = 2.0,
    center: bool = True,
) -> jnp.ndarray:
    """Magnitude^power spectrogram, (B, T) -> (B, n_frames, n_freqs)."""
    z = stft(x, n_fft, hop_length, win_length, center=center)
    mag = jnp.abs(z)
    if power == 1.0:
        return mag
    if power == 2.0:
        return jnp.square(mag)
    return jnp.power(mag, power)


def mel_spectrogram(
    x: jnp.ndarray,
    sample_rate: int = 24000,
    n_fft: int = 2048,
    hop_length: int = 300,
    win_length: int = 1200,
    n_mels: int = 80,
    f_min: float = 0.0,
    f_max: Optional[float] = None,
    power: float = 2.0,
    norm: Optional[str] = None,
) -> jnp.ndarray:
    """(B, T) audio -> (B, n_frames, n_mels) mel power spectrogram.

    Matches `torchaudio.transforms.MelSpectrogram` with default
    `mel_scale="htk"`, `norm=None` (transposed to time-major layout).
    """
    spec = spectrogram(x, n_fft, hop_length, win_length, power=power)
    fb = mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate, f_min, f_max, norm)
    fb = fb.astype(spec.dtype)
    # (B, T, F) @ (F, M) — a single MXU matmul.
    return lax.dot_general(
        spec, fb, (((2,), (0,)), ((), ())), preferred_element_type=spec.dtype
    )


def log_mel_spectrogram(
    x: jnp.ndarray,
    sample_rate: int = 24000,
    n_fft: int = 2048,
    hop_length: int = 300,
    win_length: int = 1200,
    n_mels: int = 80,
    mel_mean: float = -4.0,
    mel_std: float = 4.0,
) -> jnp.ndarray:
    """The reference's normalized log-mel: `(log(1e-5 + mel) - mean) / std`
    (reference: meldataset.py:44-47). (B, T) -> (B, n_frames, n_mels)."""
    mel = mel_spectrogram(
        x,
        sample_rate=sample_rate,
        n_fft=n_fft,
        hop_length=hop_length,
        win_length=win_length,
        n_mels=n_mels,
    )
    return (jnp.log(1e-5 + mel) - mel_mean) / mel_std


def log_mel_spectrogram_np(
    x: np.ndarray,
    sample_rate: int = 24000,
    n_fft: int = 2048,
    hop_length: int = 300,
    win_length: int = 1200,
    n_mels: int = 80,
    mel_mean: float = -4.0,
    mel_std: float = 4.0,
) -> np.ndarray:
    """Pure-numpy twin of `log_mel_spectrogram` for HOST-SIDE pipelines.

    Needed because under multi-process (multi-host) JAX, `jax.jit` outputs
    span the GLOBAL device set — a jitted-on-CPU mel in the data loader
    produces non-addressable arrays and crashes (found by
    test_multihost.py). The input pipeline must never enter the JAX runtime;
    this keeps the exact same math (identical filterbank table, same torch
    STFT semantics) on the host. (B, T) -> (B, n_frames, n_mels) float32."""
    x = np.asarray(x, np.float32)
    n = np.arange(win_length)
    window = (0.5 - 0.5 * np.cos(2.0 * math.pi * n / win_length)).astype(np.float32)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = np.pad(window, (lpad, n_fft - win_length - lpad))
    p = n_fft // 2
    x = np.pad(x, ((0, 0), (p, p)), mode="reflect")
    n_frames = 1 + (x.shape[-1] - n_fft) // hop_length
    idx = np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
    frames = x[:, idx] * window[None, None, :]
    try:
        # scipy keeps the f32 dtype and threads the batch FFT — 3.5x faster
        # than np.fft here (the input pipeline's dominant cost, ~6 ms/item
        # at 2 s utterances); values agree to f32 rounding (~1e-7 rel).
        import scipy.fft

        z = scipy.fft.rfft(frames, n=n_fft, axis=-1, workers=4)
    except Exception:  # pragma: no cover - scipy always present here
        z = np.fft.rfft(frames, n=n_fft, axis=-1)
    spec = np.square(np.abs(z)).astype(np.float32)
    fb = _mel_filterbank_np(n_fft // 2 + 1, n_mels, sample_rate, 0.0, None, None)
    mel = spec @ fb
    return ((np.log(1e-5 + mel) - mel_mean) / mel_std).astype(np.float32)
