"""WaveNet stack with gated tanh/sigmoid fusion and optional global
conditioning (reference /root/reference/modules/wavenet.py:103-174).

The fused gate `tanh(a[..., :H]) * sigmoid(a[..., H:])` is elementwise and
memory-bound: XLA fuses it with the surrounding 1-D convs into one kernel, so
no hand-written fusion is needed (the reference jit-scripts it for the same
reason, modules/commons.py:113-120). NTC layout; masks are (B, T, 1).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from facodec_tpu.nn.conv import SConv1d


def fused_gate(x_in: jnp.ndarray, g_l: jnp.ndarray, hidden: int) -> jnp.ndarray:
    a = x_in + g_l
    return jnp.tanh(a[..., :hidden]) * nn.sigmoid(a[..., hidden:])


class WN(nn.Module):
    """n_layers of dilated conv -> gate -> 1x1 residual/skip split.

    Streaming (causal only): `stream` carries each in_layer's conv left
    context; returns (y, new_state)."""

    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    p_dropout: float = 0.0
    causal: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        x_mask: Optional[jnp.ndarray] = None,
        g: Optional[jnp.ndarray] = None,
        train: bool = False,
        stream=None,
        first: bool = False,
    ):
        """x: (B, T, H); x_mask: (B, T, 1) or None; g: (B, Tg, gin) or None
        (global conditioning uses Tg == 1 and broadcasts)."""
        H = self.hidden_channels
        if x_mask is None:
            x_mask = jnp.ones((x.shape[0], x.shape[1], 1), x.dtype)
        output = jnp.zeros_like(x)
        new_state = {}

        if g is not None:
            g = SConv1d(
                self.gin_channels, 2 * H * self.n_layers, 1, norm="weight_norm",
                name="cond_layer",
            )(g)

        drop = nn.Dropout(self.p_dropout, deterministic=not train)
        for i in range(self.n_layers):
            dilation = self.dilation_rate**i
            conv = SConv1d(
                H, 2 * H, self.kernel_size, dilation=dilation, causal=self.causal,
                norm="weight_norm", name=f"in_layers_{i}",
            )
            if stream is not None:
                x_in, new_state[f"in_layers_{i}"] = conv(
                    x, stream[f"in_layers_{i}"], first=first
                )
            else:
                x_in = conv(x)
            if g is not None:
                g_l = g[..., i * 2 * H : (i + 1) * 2 * H]
            else:
                g_l = jnp.zeros_like(x_in)
            acts = fused_gate(x_in, g_l, H)
            acts = drop(acts)
            res_skip_channels = 2 * H if i < self.n_layers - 1 else H
            res_skip = SConv1d(
                H, res_skip_channels, 1, causal=self.causal, norm="weight_norm",
                name=f"res_skip_layers_{i}",
            )(acts)
            if i < self.n_layers - 1:
                x = (x + res_skip[..., :H]) * x_mask
                output = output + res_skip[..., H:]
            else:
                output = output + res_skip
        out = output * x_mask
        if stream is not None:
            return out, new_state
        return out


def wn_stream_state(wn: WN, batch: int) -> dict:
    """Zero left-context carries for every in_layer (causal streaming)."""
    H, k = wn.hidden_channels, wn.kernel_size
    return {
        f"in_layers_{i}": jnp.zeros(
            (batch, (k - 1) * (wn.dilation_rate**i), H)
        )
        for i in range(wn.n_layers)
    }
