"""DAC-style causal convolutional encoder/decoder (24 kHz codec backbone).

TPU-native rebuild of the reference architecture
(/root/reference/dac/model/dac.py:25-165): snake activations, weight-normed
streaming convs, dilated residual units, strided down/up-sampling stages and
a 2-layer skip-LSTM in the middle. NTC layout throughout; the whole stack is
a single fused XLA program under jit.

Module names mirror the torch Sequential indices (`block_0`, `block_1`, ...)
so the checkpoint converter is a mechanical key rewrite.

Streaming: every module takes an optional `stream` state pytree (mirroring
the module-name tree) and then returns (y, new_state). Conv states carry
left context, transpose-conv states carry the overlap-add tail, the LSTM
carries (h, c) — chunked causal inference is EXACT (identical to the
full-utterance forward), unlike the reference's windowed recompute template
(dac/model/base.py:125-233). Chunk lengths must be hop multiples.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from facodec_tpu.nn.activations import Snake1d
from facodec_tpu.nn.conv import SConv1d, SConvTranspose1d
from facodec_tpu.nn.lstm import SLSTM

StreamState = Optional[Dict[str, Any]]


class ResidualUnit(nn.Module):
    """Snake -> dilated 7-tap conv -> Snake -> 1x1 conv, residual add
    (reference dac/model/dac.py:25-42)."""

    dim: int = 16
    dilation: int = 1
    causal: bool = False

    def _use_fused(self, x: jnp.ndarray) -> bool:
        from facodec_tpu.ops.fused import fused_enabled
        from facodec_tpu.ops.pallas.resunit import eligible

        return (
            fused_enabled()
            # f32 inputs and (under the bfloat16_act policy) bf16 inputs are
            # both supported: the kernel keeps the residual in the input
            # dtype and runs MXU operands in the backend's native precision
            # (ops/pallas/resunit._mxu_dtype)
            and x.dtype in (jnp.float32, jnp.bfloat16)
            and eligible(self.dim, 7, x.shape[1])
        )

    @nn.compact
    def __call__(self, x: jnp.ndarray, stream: StreamState = None, first: bool = False):
        new_state = {}
        snake1 = Snake1d(self.dim, name="block_0")
        conv1 = SConv1d(
            self.dim, self.dim, 7, dilation=self.dilation, causal=self.causal,
            norm="weight_norm", name="block_1",
        )
        if stream is None and self._use_fused(x):
            from facodec_tpu.ops.pallas.resunit import fused_residual_unit

            w7, b7 = conv1(x, weights_only=True)
            snake2 = Snake1d(self.dim, name="block_2")
            conv2 = SConv1d(
                self.dim, self.dim, 1, causal=self.causal,
                norm="weight_norm", name="block_3",
            )
            w1, b1 = conv2(x, weights_only=True)
            return fused_residual_unit(
                x, w7, b7, w1, b1,
                snake1(x, alpha_only=True), snake2(x, alpha_only=True),
                self.dilation, self.causal, "reflect",
            )
        y = snake1(x)
        if stream is not None:
            y, new_state["block_1"] = conv1(y, stream["block_1"], first=first)
        else:
            y = conv1(y)
        y = Snake1d(self.dim, name="block_2")(y)
        conv2 = SConv1d(
            self.dim, self.dim, 1, causal=self.causal, norm="weight_norm", name="block_3"
        )
        if stream is not None:
            y, new_state["block_3"] = conv2(y, stream["block_3"], first=first)
        else:
            y = conv2(y)
        pad = (x.shape[1] - y.shape[1]) // 2
        if pad > 0:
            x = x[:, pad:-pad]
        out = x + y
        if stream is not None:
            return out, new_state
        return out


class EncoderBlock(nn.Module):
    """3 dilated residual units + strided down-conv; channels double
    (reference dac/model/dac.py:45-66)."""

    dim: int = 16
    stride: int = 1
    causal: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, stream: StreamState = None, first: bool = False):
        h = self.dim // 2
        new_state = {}
        for i, dil in enumerate((1, 3, 9)):
            unit = ResidualUnit(h, dilation=dil, causal=self.causal, name=f"block_{i}")
            if stream is not None:
                x, new_state[f"block_{i}"] = unit(x, stream[f"block_{i}"], first=first)
            else:
                x = unit(x)
        x = Snake1d(h, name="block_3")(x)
        down = SConv1d(
            h, self.dim, 2 * self.stride, stride=self.stride, causal=self.causal,
            norm="weight_norm", name="block_4",
        )
        if stream is not None:
            x, new_state["block_4"] = down(x, stream["block_4"], first=first)
            return x, new_state
        return down(x)


class Encoder(nn.Module):
    """Raw wave (B, T, 1) -> latent (B, T/hop, d_latent)
    (reference dac/model/dac.py:69-104). hop = prod(strides)."""

    d_model: int = 64
    strides: Tuple[int, ...] = (2, 4, 8, 8)
    d_latent: int = 64
    causal: bool = False
    lstm: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, stream: StreamState = None, first: bool = False):
        d = self.d_model
        new_state: Dict[str, Any] = {}
        conv_in = SConv1d(1, d, 7, causal=self.causal, norm="weight_norm", name="block_0")
        if stream is not None:
            x, new_state["block_0"] = conv_in(x, stream["block_0"], first=first)
        else:
            x = conv_in(x)
        for i, stride in enumerate(self.strides):
            d *= 2
            blk = EncoderBlock(d, stride=stride, causal=self.causal, name=f"block_{i + 1}")
            if stream is not None:
                x, new_state[f"block_{i + 1}"] = blk(x, stream[f"block_{i + 1}"], first=first)
            else:
                x = blk(x)
        n = len(self.strides) + 1
        if self.lstm:
            lstm_state = stream[f"block_{n}"] if stream is not None else None
            x, lstm_out = SLSTM(d, self.lstm, name=f"block_{n}")(
                x, lstm_state, return_state=True
            )
            if stream is not None:
                new_state[f"block_{n}"] = lstm_out
            n += 1
        x = Snake1d(d, name=f"block_{n}")(x)
        final = SConv1d(
            d, self.d_latent, 3, causal=self.causal, norm="weight_norm",
            name=f"block_{n + 1}",
        )
        if stream is not None:
            x, new_state[f"block_{n + 1}"] = final(x, stream[f"block_{n + 1}"], first=first)
            return x, new_state
        return final(x)


class DecoderBlock(nn.Module):
    """Snake -> strided transpose up-conv -> 3 dilated residual units
    (reference dac/model/dac.py:107-128)."""

    input_dim: int = 16
    output_dim: int = 8
    stride: int = 1
    causal: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, stream: StreamState = None, first: bool = False):
        new_state = {}
        x = Snake1d(self.input_dim, name="block_0")(x)
        up = SConvTranspose1d(
            self.input_dim, self.output_dim, 2 * self.stride, stride=self.stride,
            causal=self.causal, norm="weight_norm", name="block_1",
        )
        if stream is not None:
            x, new_state["block_1"] = up(x, stream["block_1"])
        else:
            x = up(x)
        for i, dil in enumerate((1, 3, 9)):
            unit = ResidualUnit(self.output_dim, dilation=dil, causal=self.causal,
                                name=f"block_{i + 2}")
            if stream is not None:
                x, new_state[f"block_{i + 2}"] = unit(x, stream[f"block_{i + 2}"], first=first)
            else:
                x = unit(x)
        if stream is not None:
            return x, new_state
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
    def __call__(self, x: jnp.ndarray, stream: StreamState = None, first: bool = False):
        new_state: Dict[str, Any] = {}
        conv_in = SConv1d(
            self.input_channel, self.channels, 7, causal=self.causal,
            norm="weight_norm", name="model_0",
        )
        if stream is not None:
            x, new_state["model_0"] = conv_in(x, stream["model_0"], first=first)
        else:
            x = conv_in(x)
        n = 1
        if self.lstm:
            lstm_state = stream[f"model_{n}"] if stream is not None else None
            x, lstm_out = SLSTM(self.channels, self.lstm, name=f"model_{n}")(
                x, lstm_state, return_state=True
            )
            if stream is not None:
                new_state[f"model_{n}"] = lstm_out
            n += 1
        output_dim = self.channels
        for i, stride in enumerate(self.rates):
            input_dim = self.channels // 2**i
            output_dim = self.channels // 2 ** (i + 1)
            blk = DecoderBlock(input_dim, output_dim, stride, causal=self.causal,
                               name=f"model_{n}")
            if stream is not None:
                x, new_state[f"model_{n}"] = blk(x, stream[f"model_{n}"], first=first)
            else:
                x = blk(x)
            n += 1
        x = Snake1d(output_dim, name=f"model_{n}")(x)
        final = SConv1d(
            output_dim, self.d_out, 7, causal=self.causal, norm="weight_norm",
            name=f"model_{n + 1}",
        )
        if stream is not None:
            x, new_state[f"model_{n + 1}"] = final(x, stream[f"model_{n + 1}"], first=first)
            x = jnp.tanh(x)
            return x, new_state
        x = final(x)
        return jnp.tanh(x)


# --------------------------------------------------------- streaming states
# Free functions (NOT module methods — flax intercepts module construction
# inside module methods). Pure shape arithmetic mirroring the architecture.


def _conv_state(batch: int, cin: int, k: int, s: int = 1, d: int = 1) -> jnp.ndarray:
    return jnp.zeros((batch, (k - 1) * d + 1 - s, cin))


def _residual_unit_state(batch: int, dim: int, dilation: int) -> Dict[str, Any]:
    return {
        "block_1": _conv_state(batch, dim, 7, 1, dilation),
        "block_3": _conv_state(batch, dim, 1, 1, 1),
    }


def encoder_stream_state(enc: "Encoder", batch: int) -> Dict[str, Any]:
    d = enc.d_model
    state: Dict[str, Any] = {"block_0": _conv_state(batch, 1, 7)}
    for i, stride in enumerate(enc.strides):
        d *= 2
        h = d // 2
        state[f"block_{i + 1}"] = {
            "block_0": _residual_unit_state(batch, h, 1),
            "block_1": _residual_unit_state(batch, h, 3),
            "block_2": _residual_unit_state(batch, h, 9),
            "block_4": _conv_state(batch, h, 2 * stride, stride),
        }
    n = len(enc.strides) + 1
    if enc.lstm:
        state[f"block_{n}"] = (
            jnp.zeros((enc.lstm, batch, d)), jnp.zeros((enc.lstm, batch, d))
        )
        n += 1
    state[f"block_{n + 1}"] = _conv_state(batch, d, 3)
    return state


def decoder_stream_state(dec: "Decoder", batch: int) -> Dict[str, Any]:
    state: Dict[str, Any] = {
        "model_0": _conv_state(batch, dec.input_channel, 7)
    }
    n = 1
    if dec.lstm:
        state[f"model_{n}"] = (
            jnp.zeros((dec.lstm, batch, dec.channels)),
            jnp.zeros((dec.lstm, batch, dec.channels)),
        )
        n += 1
    output_dim = dec.channels
    for i, stride in enumerate(dec.rates):
        output_dim = dec.channels // 2 ** (i + 1)
        state[f"model_{n}"] = {
            # transpose-conv overlap-add tail lives at the OUTPUT channel dim
            "block_1": jnp.zeros((batch, 2 * stride - stride, output_dim)),
            "block_2": _residual_unit_state(batch, output_dim, 1),
            "block_3": _residual_unit_state(batch, output_dim, 3),
            "block_4": _residual_unit_state(batch, output_dim, 9),
        }
        n += 1
    state[f"model_{n + 1}"] = _conv_state(batch, output_dim, 7)
    return state


def min_first_chunk_frames(strides: Tuple[int, ...]) -> int:
    """Smallest first-chunk length (in latent frames) for exact streaming:
    the deepest dilated residual unit's reflect-pad span, ceil'd to frames.
    For the flagship strides (2,5,5,6) this is 10 frames (125 ms)."""
    import math

    hop = 1
    for st in strides:
        hop *= st
    worst = 7  # first conv k=7 span
    rate = 1
    for st in strides:
        worst = max(worst, 55 * rate)  # k=7 d=9 -> k_eff 55 at this rate
        rate *= st
    worst = max(worst, 3 * hop)  # final conv k=3 at frame rate
    return math.ceil(worst / hop)
