"""Linear / Embedding / LayerNorm with torch-default initializers and
torch-layout parameters (for drop-in checkpoint conversion)."""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from facodec_tpu.nn.conv import torch_conv_kernel_init
from facodec_tpu.ops.precision import matmul


class Linear(nn.Module):
    """y = x @ W^T + b with torch-layout weight (out, in).

    The matmul follows the bf16 precision policy (ops/precision.py) with f32
    accumulation; bias add stays f32."""

    in_features: int
    out_features: int
    use_bias: bool = True
    bias_init: Optional[object] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        init = torch_conv_kernel_init(self.in_features)
        w = self.param("weight", init, (self.out_features, self.in_features))
        y = matmul(x, w.T)
        if self.use_bias:
            b = self.param("bias", self.bias_init or init, (self.out_features,))
            y = y + b
        return y


class Embedding(nn.Module):
    """Lookup table with torch init N(0, 1); weight (num_embeddings, dim).

    setup-style so `weight` is materialized even on paths that only read the
    table (e.g. the VQ nearest-neighbor search) without a lookup call."""

    num_embeddings: int
    features: int

    def setup(self):
        self.weight = self.param(
            "weight",
            lambda rng, shape: jax.random.normal(rng, shape, jnp.float32),
            (self.num_embeddings, self.features),
        )

    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        return jnp.take(self.weight, ids, axis=0)


class LayerNorm(nn.Module):
    """LayerNorm over the last axis, matching torch semantics/eps."""

    features: int
    eps: float = 1e-5
    elementwise_affine: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        if self.elementwise_affine:
            gamma = self.param("weight", lambda *_: jnp.ones((self.features,)), ())
            beta = self.param("bias", lambda *_: jnp.zeros((self.features,)), ())
            y = y * gamma + beta
        return y
