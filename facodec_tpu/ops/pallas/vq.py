"""Fused VQ nearest-code search as a Pallas TPU kernel.

One VMEM-resident pass per row tile: L2-normalize the projected latents,
compute distances against the (normalized) codebook via an MXU matmul,
argmin over codes, and gather the selected (un-normalized) codebook rows
with a one-hot MXU matmul — four ops the XLA path materializes through HBM
collapsed into one kernel (reference semantics: dac/nn/quantize.py:78-94).

Shapes (flagship): latents (B*T, 8), codebook (1024, 8). The codebook and
both its derived forms live in VMEM for the whole grid; the row dimension is
tiled.

Measured on TPU v5e (16x30s batch): ~590us vs ~486us for the plain XLA path
— at codebook_dim=8 the K dimension pads 16x on the MXU and XLA's own fusion
is already near bandwidth-bound, so the XLA path remains the DEFAULT
(ops/vq_math.py). This kernel is kept as an alternative backend: it wins
when codebook_dim is lane-sized (>=64) or when the search is fused into a
larger pallas pipeline.

Differentiation: argmin/gather is piecewise-constant in the latents, and the
gathered output is linear in the codebook — the custom VJP scatters the
output cotangent into the selected rows (segment-sum), matching what XLA
autodiff produces for take()."""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 512


def _vq_kernel(lat_ref, cb_norm_ref, cb_ref, idx_ref, zq_ref):
    lat = lat_ref[:].astype(jnp.float32)  # (TILE_M, D)
    norm = jnp.sqrt(jnp.sum(jnp.square(lat), axis=-1, keepdims=True))
    e = lat / jnp.maximum(norm, 1e-12)

    cbn = cb_norm_ref[:]  # (N, D) pre-normalized
    # dist = ||e||^2 - 2 e.c + ||c||^2 with ||e||=||c||=1: argmin(-e.c)
    scores = jax.lax.dot_general(
        e, cbn, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (TILE_M, N) cosine similarity
    idx = jnp.argmax(scores, axis=-1).astype(jnp.int32)  # first max == torch
    idx_ref[:] = idx[:, None]

    n = cbn.shape[0]
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (lat.shape[0], n), 1) == idx[:, None]
    ).astype(jnp.float32)
    # HIGHEST precision: the one-hot gather-matmul must reproduce codebook
    # rows exactly (TPU default bf16 matmul precision would round them)
    zq_ref[:] = jax.lax.dot_general(
        onehot, cb_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _vq_forward(latents2d: jnp.ndarray, codebook: jnp.ndarray, interpret: bool):
    M, D = latents2d.shape
    N = codebook.shape[0]
    tile = min(TILE_M, max(8, M))
    M_pad = (M + tile - 1) // tile * tile
    lat = latents2d
    if M_pad != M:
        lat = jnp.pad(lat, ((0, M_pad - M), (0, 0)))
    cb32 = codebook.astype(jnp.float32)
    cb_norm = cb32 / jnp.maximum(
        jnp.linalg.norm(cb32, axis=-1, keepdims=True), 1e-12
    )
    idx, zq = pl.pallas_call(
        _vq_kernel,
        grid=(M_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((M_pad, D), jnp.float32),
        ],
        interpret=interpret,
    )(lat.astype(jnp.float32), cb_norm, cb32)
    return idx[:M, 0], zq[:M]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _nearest_code_2d(latents2d, codebook, interpret):
    return _vq_forward(latents2d, codebook, interpret)


def _fwd(latents2d, codebook, interpret):
    idx, zq = _vq_forward(latents2d, codebook, interpret)
    return (idx, zq), (idx, codebook.shape[0])


def _bwd(interpret, res, cts):
    idx, n = res
    _, g_zq = cts
    # scatter-add the z_q cotangent into the selected codebook rows
    d_cb = jax.ops.segment_sum(g_zq, idx, num_segments=n)
    return jnp.zeros_like(g_zq), d_cb.astype(g_zq.dtype)


_nearest_code_2d.defvjp(_fwd, _bwd)


def nearest_code_pallas(
    encodings: jnp.ndarray, codebook: jnp.ndarray, interpret: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in fused replacement for ops.vq_math.nearest_code.

    encodings (..., D) un-normalized; codebook (N, D). Returns
    (indices (...,) int32, quantized (..., D))."""
    shape = encodings.shape
    lat2d = encodings.reshape(-1, shape[-1])
    idx, zq = _nearest_code_2d(lat2d, codebook, interpret)
    return idx.reshape(shape[:-1]), zq.reshape(shape)
