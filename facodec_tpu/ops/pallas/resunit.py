"""Fused DAC residual unit as a Pallas TPU kernel.

The codec's hot loop is `x + conv1x1(snake(conv7_dilated(snake(x))))`
(reference dac/model/dac.py:25-42) at long time lengths and narrow channels
(e.g. (16, 240000, 64..96)). Composed from XLA ops this costs ~19-32 ms per
unit at that shape — every intermediate round-trips HBM and the TPU conv
emitter handles the fused narrow convs poorly (scripts/bench_conv_fusion.py).

This kernel streams the input through VMEM once per tile and does ALL the
work on-chip:

  tile loop over (batch, time):
    xbuf  = [carry | body_tile]          # halo = (K-1)*dilation input rows
    y1    = snake(xbuf)                  # polynomial sin^2 (nn/activations)
    acc   = sum_k  y1[k*d : k*d+T] @ W7[k]   # 7 shifted MXU matmuls
    y2    = snake(acc + b7)
    out   = residual + y2 @ W1 + b1

HBM traffic: read x once, write out once — vs ~6 tensor round trips for the
XLA composition. The halo is carried in VMEM scratch across sequentially-
executed grid steps (TPU grids iterate in order, last dim fastest), so tiles
need no overlapping reads; the host pre-pads the sequence exactly like
SConv1d would (snake commutes with reflect/zero padding: it is elementwise
and snake(0)=0, so padding x first is exact).

MEASURED (v5e, dilation 1, batch 16) vs the XLA composition after the
pointwise-conv einsum fix in nn/conv.py: 24.8 vs 19-20 ms at (240000, 64);
32.2 vs 29.5 ms at (120000, 192); 12.8 vs 9.2 ms at (24000, 384) — the
narrow channels leave the MXU at fractional tiles and the dilated-slice
relayouts eat the traffic savings at every codec width, so the XLA path
remains the DEFAULT (ops/fused.py gate off). Kept as an alternative backend
and as the substrate for a lane-folded (time-major space-to-depth) variant.

Gradients: custom_vjp whose backward is `jax.vjp` of the reference XLA
composition — identical math, recompute-based, so the kernel is usable
under training too (forward values differ from the XLA path only in f32
summation order, ~1e-6).

Enable via facodec_tpu.ops.fused (trace-time flag; default off — golden and
streaming-exactness tests compare against the XLA path bit-for-bit).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from facodec_tpu.nn.activations import sin2
from facodec_tpu.ops.padding import pad1d

# per-buffer VMEM budget ~0.5 MB f32 -> T_blk by channel count (the kernel
# keeps ~6 live buffers of this size plus Mosaic's scoped temporaries; larger
# tiles exceed the 16 MB scoped-vmem stack)
_VMEM_ROWS = int(__import__("os").environ.get("FACODEC_RESUNIT_ROWS", 131072))


def _tile_rows(channels: int) -> int:
    t = min(4096, max(512, (_VMEM_ROWS // channels) // 8 * 8))
    return t


def eligible(channels: int, kernel_size: int, t: int) -> bool:
    """Worth fusing: 7-tap units with VMEM-resident weights and enough time
    steps to amortize the halo recompute."""
    return kernel_size == 7 and channels <= 384 and t >= 2048


def _snake(x, a, r):
    return x + sin2(a * x) * r


def _kernel(head_ref, body_ref, w7_ref, b7_ref, w1_ref, b1_ref, prm_ref,
            out_ref, xbuf, carry, y1buf, *, T_blk, H, D, res_off):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        carry[:] = head_ref[0]

    xbuf[:H] = carry[:]
    xbuf[H:] = body_ref[0]
    carry[:] = xbuf[T_blk:]  # last H rows feed the next tile's halo

    a1 = prm_ref[0:1]  # (1, C) rows: alpha1, recip1, alpha2, recip2
    r1 = prm_ref[1:2]
    a2 = prm_ref[2:3]
    r2 = prm_ref[3:4]

    y1buf[:] = _snake(xbuf[:], a1, r1)  # (T_blk + H, C)
    acc = jax.lax.dot_general(
        y1buf[0:T_blk], w7_ref[0],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    for k in range(1, 7):
        acc = acc + jax.lax.dot_general(
            y1buf[k * D:k * D + T_blk], w7_ref[k],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    y2 = _snake(acc + b7_ref[:], a2, r2)
    out = jax.lax.dot_general(
        y2, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[:]
    out_ref[0] = xbuf[res_off:res_off + T_blk] + out


def _forward(x, w7, b7, w1, b1, alpha1, alpha2, dilation, causal, pad_mode):
    B, T, C = x.shape
    H = 6 * dilation
    if causal:
        xp = pad1d(x, (H, 0), mode=pad_mode)
        res_off = H
    else:
        pr = H // 2
        plft = H - pr
        xp = pad1d(x, (plft, pr), mode=pad_mode)
        res_off = plft
    T_blk = _tile_rows(C)
    n_t = -(-T // T_blk)
    Tp = n_t * T_blk
    if Tp != T:
        xp = jnp.pad(xp, ((0, 0), (0, Tp - T), (0, 0)))
    head, body = xp[:, :H], xp[:, H:]

    # (O, I, K) torch layout -> per-tap (I, O) matmul weights
    w7_kio = jnp.transpose(w7, (2, 1, 0))
    w1_io = jnp.transpose(w1[:, :, 0], (1, 0))
    zeros = jnp.zeros((C,), x.dtype)
    b7v = (b7 if b7 is not None else zeros)[None, :]
    b1v = (b1 if b1 is not None else zeros)[None, :]
    a1 = alpha1.reshape(1, C)
    a2 = alpha2.reshape(1, C)
    prm = jnp.concatenate(
        [a1, 1.0 / (a1 + 1e-9), a2, 1.0 / (a2 + 1e-9)], axis=0)

    grid = (B, n_t)
    kern = functools.partial(
        _kernel, T_blk=T_blk, H=H, D=dilation, res_off=res_off)
    y = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, H, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T_blk, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((7, C, C), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T_blk, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Tp, C), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((T_blk + H, C), jnp.float32),
            pltpu.VMEM((H, C), jnp.float32),
            pltpu.VMEM((T_blk + H, C), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Tp * C * C * 8,
            bytes_accessed=2 * B * Tp * C * 4,
            transcendentals=0,
        ),
        interpret=(jax.default_backend() == "cpu"),
    )(head, body, w7_kio, b7v, w1_io, b1v, prm)
    return y[:, :T] if Tp != T else y


def _reference(x, w7, b7, w1, b1, alpha1, alpha2, dilation, causal, pad_mode):
    """The XLA composition (same math; used for the VJP)."""
    from facodec_tpu.nn.conv import conv1d_ntc

    H = 6 * dilation
    a1 = alpha1.reshape(1, 1, -1)
    a2 = alpha2.reshape(1, 1, -1)
    y = _snake(x, a1, 1.0 / (a1 + 1e-9))
    if causal:
        y = pad1d(y, (H, 0), mode=pad_mode)
    else:
        pr = H // 2
        y = pad1d(y, (H - pr, pr), mode=pad_mode)
    y = conv1d_ntc(y, w7, b7, dilation=dilation)
    y = _snake(y, a2, 1.0 / (a2 + 1e-9))
    y = conv1d_ntc(y, w1, b1)
    return x + y


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_residual_unit(x, w7, b7, w1, b1, alpha1, alpha2,
                        dilation: int, causal: bool, pad_mode: str):
    """out = x + conv1x1(snake(conv7(snake(x)))), one VMEM pass.

    Weights are the EFFECTIVE (weight-norm applied) torch-layout kernels:
    w7 (C, C, 7), w1 (C, C, 1); alphas in the torch (1, C, 1) shape.
    """
    return _forward(x, w7, b7, w1, b1, alpha1, alpha2,
                    dilation, causal, pad_mode)


def _fwd(x, w7, b7, w1, b1, a1, a2, dilation, causal, pad_mode):
    out = _forward(x, w7, b7, w1, b1, a1, a2, dilation, causal, pad_mode)
    return out, (x, w7, b7, w1, b1, a1, a2)


def _bwd(dilation, causal, pad_mode, res, g):
    x, w7, b7, w1, b1, a1, a2 = res
    _, vjp = jax.vjp(
        lambda *args: _reference(*args, dilation, causal, pad_mode),
        x, w7, b7, w1, b1, a1, a2)
    return vjp(g)


fused_residual_unit.defvjp(_fwd, _bwd)
