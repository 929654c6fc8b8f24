"""Alias-free (anti-aliased) resampling and activation wrappers.

Kaiser-windowed sinc low-pass filters around each nonlinearity, matching the
reference's `alias_free_torch` package (filter.py:27-96, resample.py:9-57,
act.py:7-29). Filter taps are fixed buffers — computed host-side with numpy
at trace time and baked into the program as constants — and the up/down
resamplers are depthwise convs that XLA fuses with the activation between
them.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax import lax


def kaiser_sinc_filter1d(cutoff: float, half_width: float, kernel_size: int) -> np.ndarray:
    """LPF taps; matches reference alias_free_torch/filter.py:27-58. Returns (K,)."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2

    delta_f = 4 * half_width
    A = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if A > 50.0:
        beta = 0.1102 * (A - 8.7)
    elif A >= 21.0:
        beta = 0.5842 * (A - 21) ** 0.4 + 0.07886 * (A - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)  # symmetric == torch periodic=False

    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    if cutoff == 0:
        return np.zeros_like(time, dtype=np.float32)
    filt = 2 * cutoff * window * np.sinc(2 * cutoff * time)
    filt = filt / filt.sum()
    return filt.astype(np.float32)


def _depthwise_conv(x: jnp.ndarray, taps: np.ndarray, stride: int) -> jnp.ndarray:
    """(B, T, C) depthwise conv with shared taps across channels, VALID padding."""
    C = x.shape[-1]
    kernel = jnp.asarray(taps, x.dtype)[:, None, None] * jnp.ones((1, 1, C), x.dtype)
    return lax.conv_general_dilated(
        x,
        kernel,  # (K, 1, C)
        window_strides=(stride,),
        padding=[(0, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=C,
    )


def _depthwise_conv_transpose(x: jnp.ndarray, taps: np.ndarray, stride: int) -> jnp.ndarray:
    """(B, T, C) depthwise transposed conv (torch semantics, padding=0)."""
    C = x.shape[-1]
    k = len(taps)
    kernel = jnp.asarray(taps[::-1].copy(), x.dtype)[:, None, None] * jnp.ones((1, 1, C), x.dtype)
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1,),
        padding=[(k - 1, k - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=C,
    )


class UpSample1d(nn.Module):
    """ratio-x anti-aliased upsampling (reference resample.py:9-37). NTC."""

    ratio: int = 2
    kernel_size: int = None  # type: ignore[assignment]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ratio = self.ratio
        ks = int(6 * ratio // 2) * 2 if self.kernel_size is None else self.kernel_size
        pad = ks // ratio - 1
        pad_left = pad * ratio + (ks - ratio) // 2
        pad_right = pad * ratio + (ks - ratio + 1) // 2
        taps = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, ks)
        x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
        y = ratio * _depthwise_conv_transpose(x, taps, ratio)
        return y[:, pad_left : y.shape[1] - pad_right]


class DownSample1d(nn.Module):
    """ratio-x anti-aliased downsampling (reference resample.py:40-57). NTC."""

    ratio: int = 2
    kernel_size: int = None  # type: ignore[assignment]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ratio = self.ratio
        ks = int(6 * ratio // 2) * 2 if self.kernel_size is None else self.kernel_size
        even = ks % 2 == 0
        pad_left = ks // 2 - int(even)
        pad_right = ks // 2
        taps = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, ks)
        x = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)), mode="edge")
        return _depthwise_conv(x, taps, ratio)


class Activation1d(nn.Module):
    """2x-oversampled activation: up -> act -> down (reference act.py:7-29).

    When `snake_features` is set, the activation is a SnakeBeta child module
    named 'act' (mirroring the torch key `...block.N.act.alpha`); otherwise
    `act_fn` is applied as a plain function.
    """

    snake_features: Optional[int] = None
    alpha_logscale: bool = True
    act_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None
    up_ratio: int = 2
    down_ratio: int = 2
    up_kernel_size: int = 12
    down_kernel_size: int = 12

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from facodec_tpu.nn.activations import SnakeBeta

        x = UpSample1d(self.up_ratio, self.up_kernel_size, name="upsample")(x)
        if self.snake_features is not None:
            x = SnakeBeta(self.snake_features, self.alpha_logscale, name="act")(x)
        else:
            x = self.act_fn(x)
        x = DownSample1d(self.down_ratio, self.down_kernel_size, name="downsample")(x)
        return x
