"""Global timbre (style) encoder and the VITS-style attention it uses.

Reference: /root/reference/modules/style_encoder.py:13-91 and
modules/attentions.py:120-274. Produces one global timbre vector per
utterance from an 80-bin mel: 1x1 spectral convs + Mish, two GLU conv
blocks, one self-attention layer, then masked temporal average pooling.

NTC layout; masks are (B, T, 1). The attention is a single fused
softmax(QK^T)V on the MXU — sequence lengths here are mel frames (a few
hundred), so plain XLA attention is optimal (no flash/blockwise needed).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from facodec_tpu.nn.activations import mish
from facodec_tpu.nn.conv import Conv1d, xavier_uniform_conv_init
from facodec_tpu.ops.precision import cast_operands


class MultiHeadAttention(nn.Module):
    """Conv-1x1 q/k/v attention (reference modules/attentions.py:120-199;
    only the window_size=None, proximal_bias=False path is live in FAcodec).

    proximal_init ties the key projection to the query projection at
    initialization (attentions.py:153-156), reproduced here by initializing
    conv_k's params from conv_q's init values.
    """

    channels: int
    out_channels: int
    n_heads: int
    p_dropout: float = 0.0
    proximal_init: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        c: jnp.ndarray,
        attn_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        """x: queries (B, Tq, C); c: keys/values (B, Tk, C);
        attn_mask: broadcastable to (B, 1, Tq, Tk), 0 = masked."""
        k_channels = self.channels // self.n_heads

        # torch applies xavier_uniform to q/k/v weights (attentions.py:150-152);
        # proximal_init (k := q at init) is applied as a post-init fixup in
        # models/builder.py since flax initializes submodules independently.
        conv_q = Conv1d(self.channels, self.channels, 1, name="conv_q",
                        kernel_init=xavier_uniform_conv_init)
        conv_k = Conv1d(self.channels, self.channels, 1, name="conv_k",
                        kernel_init=xavier_uniform_conv_init)
        conv_v = Conv1d(self.channels, self.channels, 1, name="conv_v",
                        kernel_init=xavier_uniform_conv_init)
        conv_o = Conv1d(self.channels, self.out_channels, 1, name="conv_o")

        q = conv_q(x)
        k = conv_k(c)
        v = conv_v(c)

        B, Tq, _ = q.shape
        Tk = k.shape[1]
        H = self.n_heads
        # (B, T, C) -> (B, H, T, k_channels); torch views (B, H, k, T) then
        # transposes — channel grouping is [head0 dims, head1 dims, ...].
        q = q.reshape(B, Tq, H, k_channels).transpose(0, 2, 1, 3)
        k = k.reshape(B, Tk, H, k_channels).transpose(0, 2, 1, 3)
        v = v.reshape(B, Tk, H, k_channels).transpose(0, 2, 1, 3)

        # attention matmuls follow the bf16 precision policy (f32 accumulate,
        # f32 softmax) — the O(T^2) scores over full-utterance mel are the
        # style encoder's dominant cost at long T
        qc, kc = cast_operands(q / math.sqrt(k_channels), k)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", qc, kc, preferred_element_type=jnp.float32
        )
        if attn_mask is not None:
            scores = jnp.where(attn_mask == 0, -1e4, scores)
        p_attn = jax.nn.softmax(scores, axis=-1)
        p_attn = nn.Dropout(self.p_dropout, deterministic=not train)(p_attn)
        pc, vc = cast_operands(p_attn, v)
        out = jnp.einsum("bhqk,bhkd->bhqd", pc, vc, preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(B, Tq, self.channels)
        return conv_o(out)


class Conv1dGLU(nn.Module):
    """Conv1d + gated linear unit with residual connection
    (reference modules/style_encoder.py:13-31). kernel 5, zero-pad 2."""

    in_channels: int
    out_channels: int
    kernel_size: int
    dropout: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        residual = x
        h = Conv1d(
            self.in_channels, 2 * self.out_channels, self.kernel_size, padding=2,
            name="conv1",
        )(x)
        x1 = h[..., : self.out_channels]
        x2 = h[..., self.out_channels :]
        x = x1 * nn.sigmoid(x2)
        x = residual + nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class StyleEncoder(nn.Module):
    """mel (B, T, in_dim) + mask (B, T, 1) -> timbre vector (B, out_dim)
    (reference modules/style_encoder.py:33-91)."""

    in_dim: int = 513
    hidden_dim: int = 128
    out_dim: int = 256
    kernel_size: int = 5
    n_head: int = 2
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None, train: bool = False
    ) -> jnp.ndarray:
        if mask is None:
            mask = jnp.ones((x.shape[0], x.shape[1], 1), x.dtype)
        drop = nn.Dropout(self.dropout, deterministic=not train)

        # spectral: two 1x1 convs + Mish
        x = Conv1d(self.in_dim, self.hidden_dim, 1, name="spectral_0")(x)
        x = drop(mish(x))
        x = Conv1d(self.hidden_dim, self.hidden_dim, 1, name="spectral_3")(x)
        x = drop(mish(x)) * mask

        # temporal: two GLU conv blocks; mask applied once after both
        # (reference style_encoder.py:66 — NOT per-block)
        x = Conv1dGLU(self.hidden_dim, self.hidden_dim, self.kernel_size, self.dropout,
                      name="temporal_0")(x, train=train)
        x = Conv1dGLU(self.hidden_dim, self.hidden_dim, self.kernel_size, self.dropout,
                      name="temporal_1")(x, train=train) * mask

        # self-attention; mask (B,T,1) -> (B,1,Tq,Tk)
        m = mask[:, :, 0]
        attn_mask = (m[:, None, :, None] * m[:, None, None, :])
        y = MultiHeadAttention(
            self.hidden_dim, self.hidden_dim, self.n_head, p_dropout=self.dropout,
            proximal_init=True, name="slf_attn",
        )(x, x, attn_mask=attn_mask, train=train)
        x = x + drop(y)

        x = Conv1d(self.hidden_dim, self.out_dim, 1, name="fc")(x)

        # masked temporal average pooling — note the reference sums x
        # *unmasked* and divides by the masked length
        # (style_encoder.py:83-91); reproduced exactly.
        lengths = jnp.sum(mask, axis=1)  # (B, 1)
        pooled = jnp.sum(x, axis=1) / lengths
        return pooled
