"""DAC-style causal convolutional encoder/decoder (24 kHz codec backbone).

TPU-native rebuild of the reference architecture
(/root/reference/dac/model/dac.py:25-165): snake activations, weight-normed
streaming convs, dilated residual units, strided down/up-sampling stages and
a 2-layer skip-LSTM in the middle. NTC layout throughout; the whole stack is
a single fused XLA program under jit.

Module names mirror the torch Sequential indices (`block_0`, `block_1`, ...)
so the checkpoint converter is a mechanical key rewrite.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from facodec_tpu.nn.activations import Snake1d
from facodec_tpu.nn.conv import SConv1d, SConvTranspose1d
from facodec_tpu.nn.lstm import SLSTM


class ResidualUnit(nn.Module):
    """Snake -> dilated 7-tap conv -> Snake -> 1x1 conv, residual add
    (reference dac/model/dac.py:25-42)."""

    dim: int = 16
    dilation: int = 1
    causal: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = Snake1d(self.dim, name="block_0")(x)
        y = SConv1d(
            self.dim, self.dim, 7, dilation=self.dilation, causal=self.causal,
            norm="weight_norm", name="block_1",
        )(y)
        y = Snake1d(self.dim, name="block_2")(y)
        y = SConv1d(
            self.dim, self.dim, 1, causal=self.causal, norm="weight_norm", name="block_3"
        )(y)
        pad = (x.shape[1] - y.shape[1]) // 2
        if pad > 0:
            x = x[:, pad:-pad]
        return x + y


class EncoderBlock(nn.Module):
    """3 dilated residual units + strided down-conv; channels double
    (reference dac/model/dac.py:45-66)."""

    dim: int = 16
    stride: int = 1
    causal: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = self.dim // 2
        x = ResidualUnit(h, dilation=1, causal=self.causal, name="block_0")(x)
        x = ResidualUnit(h, dilation=3, causal=self.causal, name="block_1")(x)
        x = ResidualUnit(h, dilation=9, causal=self.causal, name="block_2")(x)
        x = Snake1d(h, name="block_3")(x)
        x = SConv1d(
            h, self.dim, 2 * self.stride, stride=self.stride, causal=self.causal,
            norm="weight_norm", name="block_4",
        )(x)
        return x


class Encoder(nn.Module):
    """Raw wave (B, T, 1) -> latent (B, T/hop, d_latent)
    (reference dac/model/dac.py:69-104). hop = prod(strides)."""

    d_model: int = 64
    strides: Tuple[int, ...] = (2, 4, 8, 8)
    d_latent: int = 64
    causal: bool = False
    lstm: int = 2

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, lstm_state=None, return_state: bool = False
    ):
        d = self.d_model
        x = SConv1d(1, d, 7, causal=self.causal, norm="weight_norm", name="block_0")(x)
        for i, stride in enumerate(self.strides):
            d *= 2
            x = EncoderBlock(d, stride=stride, causal=self.causal, name=f"block_{i + 1}")(x)
        n = len(self.strides) + 1
        new_state = None
        if self.lstm:
            x, new_state = SLSTM(d, self.lstm, name=f"block_{n}")(
                x, lstm_state, return_state=True
            )
            n += 1
        x = Snake1d(d, name=f"block_{n}")(x)
        x = SConv1d(
            d, self.d_latent, 3, causal=self.causal, norm="weight_norm",
            name=f"block_{n + 1}",
        )(x)
        if return_state:
            return x, new_state
        return x


class DecoderBlock(nn.Module):
    """Snake -> strided transpose up-conv -> 3 dilated residual units
    (reference dac/model/dac.py:107-128)."""

    input_dim: int = 16
    output_dim: int = 8
    stride: int = 1
    causal: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = Snake1d(self.input_dim, name="block_0")(x)
        x = SConvTranspose1d(
            self.input_dim, self.output_dim, 2 * self.stride, stride=self.stride,
            causal=self.causal, norm="weight_norm", name="block_1",
        )(x)
        x = ResidualUnit(self.output_dim, dilation=1, causal=self.causal, name="block_2")(x)
        x = ResidualUnit(self.output_dim, dilation=3, causal=self.causal, name="block_3")(x)
        x = ResidualUnit(self.output_dim, dilation=9, causal=self.causal, name="block_4")(x)
        return x


class Decoder(nn.Module):
    """Latent (B, T', C) -> wave (B, T, 1) with tanh output
    (reference dac/model/dac.py:131-165)."""

    input_channel: int
    channels: int
    rates: Tuple[int, ...]
    d_out: int = 1
    causal: bool = False
    lstm: int = 2

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, lstm_state=None, return_state: bool = False
    ):
        x = SConv1d(
            self.input_channel, self.channels, 7, causal=self.causal,
            norm="weight_norm", name="model_0",
        )(x)
        n = 1
        new_state = None
        if self.lstm:
            x, new_state = SLSTM(self.channels, self.lstm, name=f"model_{n}")(
                x, lstm_state, return_state=True
            )
            n += 1
        output_dim = self.channels
        for i, stride in enumerate(self.rates):
            input_dim = self.channels // 2**i
            output_dim = self.channels // 2 ** (i + 1)
            x = DecoderBlock(
                input_dim, output_dim, stride, causal=self.causal, name=f"model_{n}"
            )(x)
            n += 1
        x = Snake1d(output_dim, name=f"model_{n}")(x)
        x = SConv1d(
            output_dim, self.d_out, 7, causal=self.causal, norm="weight_norm",
            name=f"model_{n + 1}",
        )(x)
        x = jnp.tanh(x)
        if return_state:
            return x, new_state
        return x
