"""JDCNet pitch estimator (F0 training teacher) in JAX.

Rebuild of /root/reference/modules/JDC/model.py:10-190 (Kum et al. 2019
CRNN), as configured by the reference: `JDCNet(num_class=1, seq_len=192)`
fed (B, 1, n_mels=80, T) normalized log-mels and returning per-frame F0 in
Hz (modules/commons.py:183-191; train.py:214-216).

Inference-only teacher: BatchNorm runs with the checkpoint's running stats,
dropout is a no-op. The unused detector branch of the torch model
(detector_conv / bilstm_detector / detector — not touched by its forward)
is not rebuilt; its checkpoint keys are dropped at load time.

Layout: input (B, T, F) mel (time-major; the torch (B, 1, F, T) transpose
happens at the call boundary). Convs are NHWC with H=T, W=F.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from facodec_tpu.nn.basic import Linear
from facodec_tpu.nn.lstm import lstm_layer

LEAK = 0.01


class BatchNorm2dInference(nn.Module):
    """Frozen BatchNorm: y = (x - running_mean) / sqrt(running_var + eps) *
    weight + bias, all stored as params for 1:1 checkpoint conversion."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ones = lambda *_: jnp.ones((self.features,))
        zeros = lambda *_: jnp.zeros((self.features,))
        w = self.param("weight", ones, ())
        b = self.param("bias", zeros, ())
        mean = self.param("running_mean", zeros, ())
        var = self.param("running_var", ones, ())
        inv = jax.lax.rsqrt(var + self.eps)
        return (x - mean) * inv * w + b


class Conv2dNoBias(nn.Module):
    """3x3 (or 1x1) conv, NHWC, torch-layout weight (O, I, Kh, Kw)."""

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    padding: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        init = nn.initializers.xavier_normal()
        w = self.param("weight", init, (self.out_channels, self.in_channels, k, k))
        kernel = jnp.transpose(w, (2, 3, 1, 0))
        return jax.lax.conv_general_dilated(
            x, kernel, (1, 1),
            [(self.padding, self.padding), (self.padding, self.padding)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


def _leaky(x):
    return nn.leaky_relu(x, LEAK)


def _maxpool_w(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """MaxPool2d(kernel=(1, k)) over NHWC width (frequency) axis."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, k, 1), (1, 1, k, 1), "VALID"
    )


class ResBlockJDC(nn.Module):
    """BN -> LReLU -> MaxPool(1,2) -> [conv-BN-LReLU-conv] + 1x1 skip
    (reference modules/JDC/model.py:158-190)."""

    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = BatchNorm2dInference(self.in_channels, name="pre_conv_0")(x)
        x = _leaky(x)
        x = _maxpool_w(x, 2)
        y = Conv2dNoBias(self.in_channels, self.out_channels, name="conv_0")(x)
        y = BatchNorm2dInference(self.out_channels, name="conv_1")(y)
        y = _leaky(y)
        y = Conv2dNoBias(self.out_channels, self.out_channels, name="conv_3")(y)
        if self.in_channels != self.out_channels:
            x = Conv2dNoBias(self.in_channels, self.out_channels, 1, 0,
                             name="conv1by1")(x)
        return y + x


class JDCNet(nn.Module):
    """mel (B, T, 80) -> F0 (B, T) Hz (num_class=1 configuration)."""

    num_class: int = 1

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B, T, F = mel.shape
        x = mel[:, :, :, None]  # NHWC: (B, T, F, 1)

        x = Conv2dNoBias(1, 64, name="conv_block_0")(x)
        x = BatchNorm2dInference(64, name="conv_block_1")(x)
        x = _leaky(x)
        x = Conv2dNoBias(64, 64, name="conv_block_3")(x)

        x = ResBlockJDC(64, 128, name="res_block1")(x)
        x = ResBlockJDC(128, 192, name="res_block2")(x)
        x = ResBlockJDC(192, 256, name="res_block3")(x)

        x = BatchNorm2dInference(256, name="pool_block_0")(x)
        x = _leaky(x)
        x = _maxpool_w(x, 4)  # (B, T, 2, 256)

        # (B, T, 2, 256) -> (B, T, 512); torch permutes (b, 256, T, 2) ->
        # (b, T, 256, 2) then views 512: feature order [c0w0, c0w1, c1w0, ...]
        feat = jnp.transpose(x, (0, 1, 3, 2)).reshape(B, T, 512)

        # bidirectional LSTM (torch bilstm_classifier)
        H = 256
        init = nn.initializers.orthogonal()

        def direction(name, xs):
            w_ih = self.param(f"bilstm_classifier/weight_ih_{name}", init, (4 * H, 512))
            w_hh = self.param(f"bilstm_classifier/weight_hh_{name}", init, (4 * H, H))
            b_ih = self.param(f"bilstm_classifier/bias_ih_{name}",
                              nn.initializers.normal(1.0), (4 * H,))
            b_hh = self.param(f"bilstm_classifier/bias_hh_{name}",
                              nn.initializers.normal(1.0), (4 * H,))
            h0 = jnp.zeros((B, H), xs.dtype)
            c0 = jnp.zeros((B, H), xs.dtype)
            y, _, _ = lstm_layer(xs, w_ih, w_hh, b_ih, b_hh, h0, c0)
            return y

        fwd = direction("l0", feat)
        bwd = direction("l0_reverse", feat[:, ::-1])[:, ::-1]
        y = jnp.concatenate([fwd, bwd], axis=-1)  # (B, T, 512)

        out = Linear(512, self.num_class, name="classifier")(y)
        return jnp.abs(out[..., 0] if self.num_class == 1 else out), feat


_JDC_UNUSED_PREFIXES = (
    "detector_conv", "bilstm_detector", "detector", "maxpool",
)


def convert_jdc_state_dict(sd) -> Dict[str, Any]:
    """torch JDCNet state_dict -> flax params (drops the unused detector
    branch and BN num_batches_tracked counters)."""
    from facodec_tpu.utils.checkpoint import convert_state_dict

    keep = {}
    for k, v in sd.items():
        if k.startswith(_JDC_UNUSED_PREFIXES) or k.endswith("num_batches_tracked"):
            continue
        if k.startswith("bilstm_classifier."):
            # keep the composite name used by the flax params above
            keep[k.replace(".", "/", 1)] = v
        else:
            # 'res_blockN.conv.M' would hit the generic converter's SConv1d
            # 'conv'-wrapper drop rule; pin the Sequential index to the name
            keep[k.replace(".conv.", ".conv_")] = v
    return convert_state_dict(keep)


def load_jdc_checkpoint(path: str) -> Dict[str, Any]:
    """Load the reference's modules/JDC/bst.t7 ({'net': state_dict})."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt.get("net", ckpt)
    return convert_jdc_state_dict(sd)
