"""1-D padding math for streaming-aware convolutions.

These are the TPU-native equivalents of the reference's causal/asymmetric
padding helpers (see /root/reference/dac/model/encodec.py:71-122). All shape
arithmetic is static Python-int math — under `jax.jit` the time length is a
trace-time constant, so XLA sees fixed shapes and can tile convs onto the MXU.

Layout convention: all tensors are NTC (batch, time, channels).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp

_PAD_MODE_MAP = {
    "zero": "constant",
    "constant": "constant",
    "reflect": "reflect",
    "replicate": "edge",
}


def get_extra_padding_for_conv1d(
    length: int, kernel_size: int, stride: int, padding_total: int = 0
) -> int:
    """Extra right-padding so the final conv window is full.

    Mirrors the frame-count rounding of the reference
    (dac/model/encodec.py:71-78): with this padding, a matching
    transposed conv can rebuild an output of the same length.
    """
    n_frames = (length - kernel_size + padding_total) / stride + 1
    ideal_length = (math.ceil(n_frames) - 1) * stride + (kernel_size - padding_total)
    return ideal_length - length


def pad1d(
    x: jnp.ndarray, paddings: Tuple[int, int], mode: str = "zero", value: float = 0.0
) -> jnp.ndarray:
    """Pad the time axis of an NTC tensor.

    Handles reflect-padding of inputs shorter than the pad amount by
    zero-extending first (matching dac/model/encodec.py:96-113).
    """
    padding_left, padding_right = paddings
    assert padding_left >= 0 and padding_right >= 0, paddings
    length = x.shape[1]
    if mode == "reflect":
        max_pad = max(padding_left, padding_right)
        extra_pad = 0
        if length <= max_pad:
            extra_pad = max_pad - length + 1
            x = jnp.pad(x, ((0, 0), (0, extra_pad), (0, 0)))
        padded = jnp.pad(x, ((0, 0), (padding_left, padding_right), (0, 0)), mode="reflect")
        end = padded.shape[1] - extra_pad
        return padded[:, :end]
    jmode = _PAD_MODE_MAP[mode]
    if jmode == "constant":
        return jnp.pad(
            x, ((0, 0), (padding_left, padding_right), (0, 0)), constant_values=value
        )
    return jnp.pad(x, ((0, 0), (padding_left, padding_right), (0, 0)), mode=jmode)


def unpad1d(x: jnp.ndarray, paddings: Tuple[int, int]) -> jnp.ndarray:
    """Remove padding from the time axis of an NTC tensor."""
    padding_left, padding_right = paddings
    assert padding_left >= 0 and padding_right >= 0, paddings
    assert (padding_left + padding_right) <= x.shape[1]
    end = x.shape[1] - padding_right
    return x[:, padding_left:end]
