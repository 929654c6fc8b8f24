"""Core vector-quantization math: L2-normalized nearest-codebook search.

Matches the reference's factorized-VQ lookup (ViT-VQGAN style,
/root/reference/dac/nn/quantize.py:78-94): both the projected encodings and
the codebook are L2-normalized, distances are squared-euclidean (equivalently
cosine), and ties break toward the lowest index (torch `(-dist).max(1)` and
`jnp.argmax` both return the first maximal element).

The distance computation is a (B*T, D) x (D, N) matmul — for the FAcodec
configuration D=8, N=1024 this is tiny, so plain XLA is already optimal: the
matmul plus row-norm terms fuse into one kernel. A Pallas variant exists for
the fused normalize+distance+argmin+gather path (facodec_tpu/ops/pallas/vq.py).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import lax


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """Matches `torch.nn.functional.normalize`: x / max(||x||_2, eps)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def nearest_code(
    encodings: jnp.ndarray, codebook: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Find nearest codebook entries under L2-normalized euclidean distance.

    Args:
      encodings: (..., D) projected latents (un-normalized).
      codebook: (N, D) codebook (un-normalized).

    Returns:
      (indices (...,) int32, quantized (..., D)) where `quantized` gathers the
      *un-normalized* codebook rows (reference decode_code semantics).
    """
    e = l2_normalize(encodings.astype(jnp.float32), axis=-1)
    c = l2_normalize(codebook.astype(jnp.float32), axis=-1)
    # dist = ||e||^2 - 2 e.c + ||c||^2 ; argmax(-dist) == argmin(dist)
    e_sq = jnp.sum(jnp.square(e), axis=-1, keepdims=True)
    c_sq = jnp.sum(jnp.square(c), axis=-1)
    ec = lax.dot_general(
        e, c, (((e.ndim - 1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dist = e_sq - 2.0 * ec + c_sq
    indices = jnp.argmax(-dist, axis=-1).astype(jnp.int32)
    quantized = jnp.take(codebook, indices, axis=0)
    return indices, quantized
