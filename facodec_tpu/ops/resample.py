"""Fractional sinc resampling with julius semantics.

The reference's MSD discriminator downsamples its input through
audiotools' `AudioSignal.resample`, which delegates to
`julius.resample_frac` (/root/reference/dac/model/discriminator.py:83-84).
This reproduces that exact algorithm so MSD at rate > 1 is golden-testable:

  * reduce (old_sr, new_sr) by their gcd;
  * one FIR kernel per output phase j in [0, new_sr): a sinc at the
    rolled-off cutoff `sr = rolloff * min(old, new)`, windowed by a
    squared-cosine over `zeros` zero crossings, normalized to unit sum
    (constant signals are preserved);
  * replicate-pad the input by (width, width + old_sr) and convolve with
    stride old_sr; interleave the new_sr phase outputs and trim to
    int(new_sr * length / old_sr) samples (julius full=False default).

The kernel bank is built in numpy at trace time (static shapes); the
runtime work is ONE strided conv — MXU-friendly, no gather/scatter.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np
from jax import lax


@lru_cache(maxsize=None)
def _kernel_bank(old_sr: int, new_sr: int, zeros: int, rolloff: float):
    """(new_sr, 1, 2*width + old_sr) float32 filter bank + width (static)."""
    sr = rolloff * min(old_sr, new_sr)
    width = int(math.ceil(zeros * old_sr / sr))
    idx = np.arange(-width, width + old_sr, dtype=np.float64)
    kernels = []
    for i in range(new_sr):
        t = (-i / new_sr + idx / old_sr) * sr
        t = np.clip(t, -zeros, zeros) * math.pi
        window = np.cos(t / zeros / 2) ** 2
        kernel = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t)) * window
        kernel /= kernel.sum()
        kernels.append(kernel)
    bank = np.stack(kernels).astype(np.float32)[:, None, :]  # (new, 1, K)
    return bank, width


def resample_frac(
    x: jnp.ndarray, old_sr: int, new_sr: int,
    zeros: int = 24, rolloff: float = 0.945,
) -> jnp.ndarray:
    """Resample the last axis of (..., T) from old_sr to new_sr
    (julius.resample_frac semantics, incl. replicate padding and the
    ceil-trimmed output length)."""
    g = math.gcd(int(old_sr), int(new_sr))
    old_sr, new_sr = int(old_sr) // g, int(new_sr) // g
    if old_sr == new_sr:
        return x
    shape = x.shape
    length = shape[-1]
    xf = x.reshape((-1, length))
    bank, width = _kernel_bank(old_sr, new_sr, zeros, rolloff)

    # replicate pad (width, width + old_sr)
    left = jnp.repeat(xf[:, :1], width, axis=1)
    right = jnp.repeat(xf[:, -1:], width + old_sr, axis=1)
    xp = jnp.concatenate([left, xf, right], axis=1)[:, :, None]  # (B, Tp, 1)

    kernel = jnp.asarray(np.transpose(bank, (2, 1, 0)))  # (K, 1, new_sr)
    ys = lax.conv_general_dilated(
        xp.astype(jnp.float32), kernel,
        window_strides=(old_sr,), padding=[(0, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )  # (B, T', new_sr)
    y = ys.reshape((ys.shape[0], -1))  # interleave phases
    out_len = int(new_sr * length / old_sr)  # julius default (full=False)
    return y[:, :out_len].reshape(shape[:-1] + (out_len,)).astype(x.dtype)
