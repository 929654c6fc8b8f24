"""Convolution layers in NTC layout with torch-compatible parameterization.

Design decisions (TPU-first):
  * NTC (batch, time, channels) activations — XLA's preferred 1-D conv layout,
    tiling channels onto the MXU lanes.
  * Parameters are stored in the torch state-dict layout — conv weight
    (O, I/g, K), conv-transpose weight (I, O/g, K), `weight_g`/`weight_v` for
    weight norm — so checkpoint conversion from the reference is a plain
    tensor copy. The (static) transposition into XLA's WIO kernel layout is
    folded by the compiler at trace time; it costs nothing at runtime.
  * Weight norm is an explicit `g * v / ||v||` reparameterization over
    non-output dims (torch `weight_norm` with dim=0), needed for training
    parity; `fold_weight_norm` in utils/checkpoint.py converts to plain
    kernels for inference.
  * All padding arithmetic is static-int math so shapes are compile-time
    constants (no dynamic shapes under jit).

Reference semantics reproduced from /root/reference/dac/model/encodec.py
(SConv1d :192-228, SConvTranspose1d :231-270, NormConv1d :125-139).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from facodec_tpu.ops.padding import get_extra_padding_for_conv1d, pad1d
from facodec_tpu.ops.precision import (
    cast_operands,
    is_int8,
    out_dtype,
    quantize_dynamic,
)

Dtype = Any


def torch_conv_kernel_init(fan_in: int):
    """torch Conv/Linear default: kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), +)."""

    def init(rng, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
        return jax.random.uniform(rng, shape, dtype, minval=-bound, maxval=bound)

    return init


def _norm_except_dim0(v: jnp.ndarray) -> jnp.ndarray:
    """Per-slice L2 norm over all dims except 0, keepdims (torch weight_norm dim=0)."""
    axes = tuple(range(1, v.ndim))
    return jnp.sqrt(jnp.sum(jnp.square(v), axis=axes, keepdims=True))


def apply_weight_norm(v: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    return v * (g / _norm_except_dim0(v))


def xavier_uniform_conv_init(rng, shape, dtype=jnp.float32):
    """torch nn.init.xavier_uniform_ on a conv weight (O, I, *K)."""
    receptive = int(np.prod(shape[2:])) if len(shape) > 2 else 1
    fan_out = shape[0] * receptive
    fan_in = shape[1] * receptive
    a = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(rng, shape, dtype, minval=-a, maxval=a)


class _ConvBase(nn.Module):
    """Shared weight/bias parameter handling for conv layers (torch layouts)."""

    def _weight(self, shape: Tuple[int, ...], fan_in: int, use_weight_norm: bool):
        init = getattr(self, "kernel_init", None) or torch_conv_kernel_init(fan_in)
        if use_weight_norm:
            v = self.param("weight_v", init, shape)
            g = self.param("weight_g", lambda rng, _: _norm_except_dim0(v), None)
            return apply_weight_norm(v, g)
        return self.param("weight", init, shape)

    def _bias(self, out_channels: int, fan_in: int, use_bias: bool):
        if not use_bias:
            return None
        return self.param("bias", torch_conv_kernel_init(fan_in), (out_channels,))


def conv1d_ntc(
    x: jnp.ndarray,
    weight_oik: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
    padding: Tuple[int, int] = (0, 0),
    exact: bool = False,
) -> jnp.ndarray:
    """1-D conv over NTC input with a torch-layout (O, I/g, K) kernel.

    Under the bfloat16 precision policy (ops/precision.py) the operands are
    cast to bf16 and the result cast back to f32 (the MXU accumulates f32
    internally; conv VJPs require same-dtype operands, so unlike dot_general
    the f32 output must come from a cast, not preferred_element_type).
    `exact=True` opts a layer out (used by the VQ projections to protect
    code bit-exactness).

    Pointwise (K=1) convs bypass lax.conv: XLA's TPU conv emitter runs them
    ~10x slower than the identical einsum when fused into a larger program
    (45 ms vs 4 ms at (16, 240000, 64); scripts/bench_conv_fusion.py), and
    a 1x1 conv IS a matmul. Streaming and one-shot paths share this code, so
    chunked==one-shot bit-exactness is preserved."""
    if (
        weight_oik.shape[-1] == 1
        and stride == 1
        and groups == 1
        and padding == (0, 0)
    ):
        if not exact and is_int8(weight_oik.shape[1]):
            # W8A8: per-row activation scale x per-out-channel weight scale
            # both commute exactly with the matmul; int8 MXU at 2x bf16 peak
            xi, sx = quantize_dynamic(x, (1, 2))        # (B,1,1)
            wi, sw = quantize_dynamic(weight_oik[:, :, 0], (1,))  # (O,1)
            y = jnp.einsum(
                "btc,oc->bto", xi, wi, preferred_element_type=jnp.int32
            ).astype(jnp.float32) * (sx * sw[:, 0][None, None, :])
        elif not exact:
            x, w = cast_operands(x, weight_oik[:, :, 0])
            y = jnp.einsum("btc,oc->bto", x, w).astype(out_dtype())
        else:
            y = jnp.einsum(
                "btc,oc->bto", x, weight_oik[:, :, 0],
                precision=lax.Precision.HIGHEST,
            )
        if bias is not None:
            y = y + bias[None, None, :].astype(y.dtype)
        return y
    kernel = jnp.transpose(weight_oik, (2, 1, 0))  # -> (K, I/g, O) == WIO
    if not exact and is_int8(kernel.shape[0] * kernel.shape[1]):
        xi, sx = quantize_dynamic(x, (1, 2))      # (B,1,1)
        wi, sw = quantize_dynamic(kernel, (0, 1))  # (1,1,O)
        y = lax.conv_general_dilated(
            xi,
            wi,
            window_strides=(stride,),
            padding=[padding],
            rhs_dilation=(dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=groups,
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * (sx * sw)
        if bias is not None:
            y = y + bias[None, None, :].astype(y.dtype)
        return y
    if not exact:
        x, kernel = cast_operands(x, kernel)
    y = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride,),
        padding=[padding],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    ).astype(jnp.float32 if exact else out_dtype())
    if bias is not None:
        y = y + bias[None, None, :].astype(y.dtype)
    return y


def conv_transpose1d_ntc(
    x: jnp.ndarray,
    weight_iok: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    stride: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """1-D transposed conv (torch semantics, zero padding) over NTC input.

    `weight_iok` is the torch ConvTranspose1d layout (I, O/g, K). Implemented
    as an input-dilated conv with a flipped kernel — the standard identity —
    which XLA lowers to an MXU-friendly conv. Output length (T-1)*s + K.
    """
    k = weight_iok.shape[-1]
    in_ch = weight_iok.shape[0]
    out_per_group = weight_iok.shape[1]
    # (I, O/g, K) -> flip K -> (K, I/g_in?, ...)
    w = jnp.flip(weight_iok, axis=-1)
    if groups == 1:
        kernel = jnp.transpose(w, (2, 0, 1))  # (K, I, O)
    else:
        # grouped transpose conv: group g maps in-slice g to out-slice g.
        # torch weight is (I, O/g, K) with I = groups * (I/g).
        in_per_group = in_ch // groups
        w = w.reshape(groups, in_per_group, out_per_group, k)
        # jax grouped conv kernel: (K, I/g, O) with O = groups * O/g
        kernel = jnp.transpose(w, (3, 1, 0, 2)).reshape(k, in_per_group, groups * out_per_group)
    if is_int8(kernel.shape[0] * kernel.shape[1]):
        xi, sx = quantize_dynamic(x, (1, 2))      # (B,1,1)
        wi, sw = quantize_dynamic(kernel, (0, 1))  # (1,1,O)
        y = lax.conv_general_dilated(
            xi,
            wi,
            window_strides=(1,),
            padding=[(k - 1, k - 1)],
            lhs_dilation=(stride,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=groups,
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * (sx * sw)
    else:
        x, kernel = cast_operands(x, kernel)
        y = lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1,),
            padding=[(k - 1, k - 1)],
            lhs_dilation=(stride,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=groups,
        ).astype(out_dtype())
    if bias is not None:
        y = y + bias[None, None, :].astype(y.dtype)
    return y


class Conv1d(_ConvBase):
    """torch-style Conv1d (symmetric zero padding), NTC activations.

    Used where the reference uses a raw `nn.Conv1d`/`WNConv1d` with explicit
    padding (e.g. CNNLSTM residual units, modules/quantize.py:92-104).
    """

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    padding: int = 0
    use_bias: bool = True
    weight_norm: bool = False
    kernel_init: Optional[Any] = None
    exact: bool = False  # opt out of the bf16 policy (VQ projections)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fan_in = (self.in_channels // self.groups) * self.kernel_size
        w = self._weight(
            (self.out_channels, self.in_channels // self.groups, self.kernel_size),
            fan_in,
            self.weight_norm,
        )
        b = self._bias(self.out_channels, fan_in, self.use_bias)
        return conv1d_ntc(
            x, w, b,
            stride=self.stride, dilation=self.dilation, groups=self.groups,
            padding=(self.padding, self.padding), exact=self.exact,
        )


class ConvTranspose1d(_ConvBase):
    """torch-style ConvTranspose1d (padding=0), NTC activations."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    groups: int = 1
    use_bias: bool = True
    weight_norm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # torch ConvTranspose fan_in for init: out_channels/groups * K
        fan_in = (self.out_channels // self.groups) * self.kernel_size
        w = self._weight(
            (self.in_channels, self.out_channels // self.groups, self.kernel_size),
            fan_in,
            self.weight_norm,
        )
        b = self._bias(self.out_channels, fan_in, self.use_bias)
        return conv_transpose1d_ntc(x, w, b, stride=self.stride, groups=self.groups)


class Conv2d(_ConvBase):
    """torch-style Conv2d for the discriminators. NHWC activations,
    torch-layout weight (O, I, Kh, Kw)."""

    in_channels: int
    out_channels: int
    kernel_size: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    dilation: Tuple[int, int] = (1, 1)
    use_bias: bool = True
    weight_norm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        fan_in = self.in_channels * kh * kw
        w = self._weight((self.out_channels, self.in_channels, kh, kw), fan_in, self.weight_norm)
        b = self._bias(self.out_channels, fan_in, self.use_bias)
        kernel = jnp.transpose(w, (2, 3, 1, 0))  # (Kh, Kw, I, O) == HWIO
        x, kernel = cast_operands(x, kernel)
        y = lax.conv_general_dilated(
            x,
            kernel,
            window_strides=self.stride,
            padding=[(self.padding[0], self.padding[0]), (self.padding[1], self.padding[1])],
            rhs_dilation=self.dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).astype(out_dtype())
        if b is not None:
            y = y + b[None, None, None, :].astype(y.dtype)
        return y


class SConv1d(_ConvBase):
    """Streaming-aware Conv1d: the causal/asymmetric auto-padding wrapper that
    gives the codec its causality (reference dac/model/encodec.py:192-228).

    causal=True: left-pad `(k_eff - stride)`, right-pad `extra` so the final
    window is full. causal=False: asymmetric split. Default reflect padding
    with the short-input fallback.

    Streaming (causal only): pass `state` (B, k_eff - stride, C_in) — the
    carried left context replaces padding and the conv runs valid; chunk
    length must be a stride multiple. `init_state`/`state_len` build carries.
    With state, returns (y, new_state).
    """

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    causal: bool = False
    pad_mode: str = "reflect"
    norm: str = "weight_norm"

    @property
    def state_len(self) -> int:
        k_eff = (self.kernel_size - 1) * self.dilation + 1
        return k_eff - self.stride

    def init_state(self, batch: int, dtype=jnp.float32) -> jnp.ndarray:
        return jnp.zeros((batch, self.state_len, self.in_channels), dtype)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        state: Optional[jnp.ndarray] = None,
        first: bool = False,
        weights_only: bool = False,
    ):
        if weights_only:
            # create/fetch params and hand back the EFFECTIVE (weight-norm
            # applied) torch-layout kernel — used by the fused Pallas
            # residual unit (ops/pallas/resunit.py) which consumes raw
            # weights instead of calling the conv.
            fan_in = (self.in_channels // self.groups) * self.kernel_size
            w = self._weight(
                (self.out_channels, self.in_channels // self.groups,
                 self.kernel_size),
                fan_in,
                self.norm == "weight_norm",
            )
            b = self._bias(self.out_channels, fan_in, self.use_bias)
            return w, b
        k_eff = (self.kernel_size - 1) * self.dilation + 1
        padding_total = k_eff - self.stride
        if state is not None:
            assert self.causal, "streaming state requires causal mode"
            assert x.shape[1] % self.stride == 0, "chunk must be a stride multiple"
            if first:
                # chunk 0 reproduces the full forward's left reflect-pad
                # (the pad values come from the chunk itself)
                x = pad1d(x, (padding_total, 0), mode=self.pad_mode)
            else:
                x = jnp.concatenate([state, x], axis=1)
            new_state = x[:, x.shape[1] - padding_total :] if padding_total else x[:, :0]
        else:
            extra = get_extra_padding_for_conv1d(
                x.shape[1], k_eff, self.stride, padding_total
            )
            # NOTE: a "zero-pad inside the conv + fix up the H leading
            # outputs with dynamic_update_slice" fast path was tried here to
            # kill the pad concatenate copies; it MEASURED 4% slower end to
            # end — the DUS boundary breaks XLA's conv->cast output fusion,
            # adding explicit f32 materialization + convert_element_type at
            # every site. The concatenate fuses better than it profiles.
            if self.causal:
                x = pad1d(x, (padding_total, extra), mode=self.pad_mode)
            else:
                pr = padding_total // 2
                pl = padding_total - pr
                x = pad1d(x, (pl, pr + extra), mode=self.pad_mode)

        fan_in = (self.in_channels // self.groups) * self.kernel_size
        w = self._weight(
            (self.out_channels, self.in_channels // self.groups, self.kernel_size),
            fan_in,
            self.norm == "weight_norm",
        )
        b = self._bias(self.out_channels, fan_in, self.use_bias)
        y = conv1d_ntc(
            x, w, b, stride=self.stride, dilation=self.dilation, groups=self.groups
        )
        if state is not None:
            return y, new_state
        return y


class SConvTranspose1d(_ConvBase):
    """Streaming-aware ConvTranspose1d with right-trim for causal decoding
    (reference dac/model/encodec.py:231-270).

    Streaming (causal, trim_right_ratio=1 only): the trimmed right tail of
    each chunk's raw transpose-conv output — the contribution of this chunk's
    inputs to FUTURE output samples — is carried as `state` (B, k - s, C_out)
    and overlap-added onto the next chunk's head. Bias is applied after the
    overlap-add so it lands exactly once per output sample. With state,
    returns (y, new_state).
    """

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    use_bias: bool = True
    causal: bool = False
    trim_right_ratio: float = 1.0
    norm: str = "weight_norm"

    @property
    def state_len(self) -> int:
        return self.kernel_size - self.stride

    def init_state(self, batch: int, dtype=jnp.float32) -> jnp.ndarray:
        return jnp.zeros((batch, self.state_len, self.out_channels), dtype)

    @nn.compact
    def __call__(self, x: jnp.ndarray, state: Optional[jnp.ndarray] = None):
        assert self.causal or self.trim_right_ratio == 1.0
        padding_total = self.kernel_size - self.stride
        fan_in = self.out_channels * self.kernel_size
        w = self._weight(
            (self.in_channels, self.out_channels, self.kernel_size),
            fan_in,
            self.norm == "weight_norm",
        )
        b = self._bias(self.out_channels, fan_in, self.use_bias)

        if state is not None:
            assert self.causal and self.trim_right_ratio == 1.0, (
                "streaming requires causal with trim_right_ratio=1"
            )
            T = x.shape[1]
            y = conv_transpose1d_ntc(x, w, None, stride=self.stride)
            emit = y[:, : T * self.stride]
            if padding_total:
                emit = emit.at[:, :padding_total].add(state)
                new_state = y[:, T * self.stride :]
            else:
                new_state = y[:, :0]
            if b is not None:
                emit = emit + b[None, None, :]
            return emit, new_state

        y = conv_transpose1d_ntc(x, w, b, stride=self.stride)
        if self.causal:
            pr = math.ceil(padding_total * self.trim_right_ratio)
            pl = padding_total - pr
        else:
            pr = padding_total // 2
            pl = padding_total - pr
        end = y.shape[1] - pr
        return y[:, pl:end]
