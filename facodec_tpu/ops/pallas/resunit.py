"""Fused DAC residual unit as a Pallas TPU kernel (lane-folded).

The codec's hot loop is `x + conv1x1(snake(conv7_dilated(snake(x))))`
(reference dac/model/dac.py:25-42) at long time lengths and narrow channels
(e.g. (16, 240000, 64..96)). Composed from XLA ops this costs ~19-32 ms per
unit at that shape — every intermediate round-trips HBM and the TPU conv
emitter handles the fused narrow convs poorly (scripts/bench_conv_fusion.py).

This kernel streams the input through VMEM once per tile and does ALL the
work on-chip. The compute core is a single generic loop:

  tile loop over (batch, rows):
    xbuf  = [carry (halo rows) | body_tile]
    y1    = snake(xbuf)                     # polynomial sin^2
    acc   = sum_s  y1[offs[s] : offs[s]+T_blk] @ WS[s]    # MXU matmuls
    y2    = snake(acc + b7)
    out   = xbuf[res_off : res_off+T_blk] + y2 @ W1 + b1

where (offs, WS) encode the 7-tap dilated conv in one of two layouts:

  * F=1 (unfolded): offs = (0, d, 2d, .., 6d), WS[s] = W_s (C x C) — the
    plain shifted-slice accumulation. At C=64 this quarter-fills the 128-lane
    MXU (measured round 2: 24.8 ms vs XLA's 19-20 ms at (240000, 64)).
  * F>1 (LANE-FOLDED, round-3 fix): fold F consecutive time steps into the
    lane dim — a FREE contiguous reshape (B, T, C) -> (B, T/F, F*C) — so
    every matmul is (T_blk, F*C) @ (F*C, F*C) with full 128-lane tiles, and
    taps that land in the same folded row SHARE one matmul: output slot j,
    tap k reads folded row r + (j + o + k*d)//F, slot (j + o + k*d)%F, so
    the premixed block weights WS[s][(i_in)*C:, (j_out)*C:] = W_k collapse
    the 7 shifted matmuls to (6d + o)/F + 1 distinct row shifts. At C=64,
    F=2, d=1: FOUR (T/2, 128)@(128, 128) matmuls replace SEVEN (T, 64)@
    (64, 64) — ~3.5x fewer effective MXU tiles; d=3 folds to 10 shifts
    (~1.4x). The residual/snake/1x1 run on half the rows at full lanes
    (the 1x1 weight becomes block-diagonal, alphas/biases tile by F).

ROUND-3 MEASURED RESULTS (v5e, batch 16, (240000, 64) d=1, via
scripts/bench_resunit_folded.py) — and why this kernel CANNOT beat XLA at
the codec's widths:

    XLA composition                20.5 ms
    F=1 kernel, f32 dots           25.5 ms
    F=1 kernel, bf16 dots          26.4 ms   <- dtype-INSENSITIVE
    F=2 host-side fold             48.5 ms   <- fold relayout dominates

  * Mosaic's jnp-level dot_general pads operands to (128, 128) MXU tiles:
    a (T_blk, 64)@(64, 64) tap costs T_blk full MXU cycles regardless of
    dtype — 7 taps = 7T cycles ~= 28 ms at this shape, matching the
    measurement. bf16 operands do not help because ROWS, not passes, are
    the unit of cost below 128 lanes.
  * XLA's conv emitters (EmitAllBatchInSublanes etc., visible in the
    optimized HLO backend_config) pack batch x time into both systolic
    dims and reach ~24% (C=64 f32) to ~55% (C=192 bf16) of MXU peak — the
    four taps' 4.7 ms at C=64 is 5x faster than the Mosaic dot loop. XLA
    also already runs these 'f32' convs with bf16 operands (TPU default
    precision; the HLO converts snake outputs to bf16 before each conv).
  * The interleaved lane-fold (collapse 7 taps to 4 full-lane shifts)
    would halve the Mosaic dot cost but requires a (T, 64) -> (T/2, 128)
    relayout: host-side it is a gather at far below copy bandwidth
    (+23 ms, measured); in-kernel Mosaic rejects both the shape cast
    ('unsupported shape cast') and strided sublane slices. Even granting a
    free fold, the folded floor (~15-18 ms incl. VPU snake) only ties XLA.

  VERDICT: the XLA path stays the DEFAULT at every width; this kernel
  remains a correct, tested alternative backend (and the fold machinery a
  substrate for future Mosaic relayout support). The round-trip's actual
  top sinks after this analysis are XLA layout-assignment copies between
  encoder convs and the decoder LSTM while-loop overhead — tracked in
  BASELINE.md.

HBM traffic: read x once, write out once — vs ~6 tensor round trips for the
XLA composition. The halo is carried in VMEM scratch across sequentially-
executed grid steps (TPU grids iterate in order, last dim fastest), so tiles
need no overlapping reads; the host pre-pads the sequence exactly like
SConv1d would (snake commutes with reflect/zero padding: it is elementwise
and snake(0)=0, so padding x first is exact). Folding adds o = ceil(pad/F)*F
- pad alignment rows on the left; they are never read (min tap index = o).

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


import os as _os


def _fold_factor(channels: int, dilation: int, t: int) -> int:
    """Lane-fold factor. MEASURED (v5e, (16, 240000, 64) d=1): the folded
    kernel runs 48.5 ms vs 25.5 unfolded — the host-side fold reshape is a
    PHYSICAL relayout (XLA lane-pads a 64-channel array to 128 lanes:
    f32[...,64]{...:T(8,128)}, so (T, 64) -> (T/2, 128) moves every element)
    whose gather cost exceeds the MXU win. Folding therefore stays OFF until
    an in-kernel (VMEM-local) fold lands; FACODEC_RESUNIT_FOLD=1 re-enables
    the host-side variant for experiments."""
    if _os.environ.get("FACODEC_RESUNIT_FOLD", "0") != "1":
        return 1
    if t % 2:
        return 1
    if channels == 64 and dilation in (1, 3):
        return 2
    if channels == 192 and dilation == 1:
        return 2
    return 1


def _mxu_dtype():
    """MXU operand dtype for the kernel's dot_generals. On TPU, bf16
    operands with f32 accumulation — IDENTICAL to what XLA's own conv
    lowering does for these convs at the default precision (verified in the
    optimized HLO: the 'f32' encoder convs convert their inputs to bf16
    before the MXU; jax Precision.DEFAULT on TPU is bf16). An f32-operand
    Pallas matmul therefore does strictly MORE work than the XLA path it
    replaces — that mismatch is why the round-2 kernel lost at every width.
    On CPU (interpret mode, golden tests) stay f32 — CPU XLA computes convs
    in full f32, and the tests pin bit-closeness to that."""
    env = _os.environ.get("FACODEC_RESUNIT_MXU", "")
    if env in ("bf16", "bfloat16"):
        return jnp.bfloat16
    if env in ("f32", "float32"):
        return jnp.float32
    return jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16


def eligible(channels: int, kernel_size: int, t: int) -> bool:
    """Worth fusing: 7-tap units with VMEM-resident weights and enough time
    steps to amortize the halo recompute. d=9 at 64ch and the widths where
    XLA measured faster are excluded by the caller keeping the flag off or
    by _fold_factor returning 1 (the F=1 kernel is only marginally behind
    XLA; the gate in ops/fused.py decides the default)."""
    return kernel_size == 7 and channels <= 384 and t >= 2048


def _snake(x, a, r):
    return x + sin2(a * x) * r


def _kernel(head_ref, body_ref, ws_ref, b7_ref, w1_ref, b1_ref, prm_ref,
            out_ref, xbuf, carry, y1buf, *, T_blk, halo, offs, res_off):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        carry[:] = head_ref[0]

    xbuf[:halo] = carry[:]
    xbuf[halo:] = body_ref[0]
    carry[:] = xbuf[T_blk:]  # last `halo` rows feed the next tile

    a1 = prm_ref[0:1]  # (1, FC) rows: alpha1, recip1, alpha2, recip2
    r1 = prm_ref[1:2]
    a2 = prm_ref[2:3]
    r2 = prm_ref[3:4]

    # snake in f32 registers, stored in the MXU operand dtype (bf16 on TPU —
    # exactly the conversion XLA's own conv lowering inserts here)
    mxu = y1buf.dtype
    y1buf[:] = _snake(xbuf[:].astype(jnp.float32), a1, r1).astype(mxu)
    acc = jax.lax.dot_general(
        y1buf[offs[0]:offs[0] + T_blk], ws_ref[0],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    for n in range(1, len(offs)):
        acc = acc + jax.lax.dot_general(
            y1buf[offs[n]:offs[n] + T_blk], ws_ref[n],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    y2 = _snake(acc + b7_ref[:], a2, r2).astype(mxu)
    out = jax.lax.dot_general(
        y2, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[:]
    out_ref[0] = (xbuf[res_off:res_off + T_blk].astype(jnp.float32)
                  + out).astype(out_ref.dtype)


def _conv_layout(w7, C, F, o, dilation, dtype):
    """(offsets, stacked premixed weights (S, FC, FC)) for the generic
    shifted-matmul loop. F=1: per-tap identity layout. F>1: interleaved
    lane-fold block weights (see module docstring)."""
    w7_kio = jnp.transpose(w7, (2, 1, 0))  # (K, I, O)
    if F == 1:
        return tuple(k * dilation for k in range(7)), w7_kio
    FC = F * C
    blocks = {}
    for k in range(7):
        for j in range(F):
            s, i = divmod(j + o + k * dilation, F)
            blocks.setdefault(s, []).append((i, j, k))
    offs = tuple(sorted(blocks))
    mats = []
    for s in offs:
        m = jnp.zeros((FC, FC), dtype)
        for (i, j, k) in blocks[s]:
            m = lax.dynamic_update_slice(m, w7_kio[k], (i * C, j * C))
        mats.append(m)
    return offs, jnp.stack(mats)


def _forward(x, w7, b7, w1, b1, alpha1, alpha2, dilation, causal, pad_mode):
    B, T, C = x.shape
    H = 6 * dilation
    plft, pr = (H, 0) if causal else (H - H // 2, H // 2)
    F = _fold_factor(C, dilation, T)
    FC = F * C

    mxu = _mxu_dtype()
    if F == 1:
        P, o = plft, 0
    else:
        P = -(-plft // F) * F  # left pad aligned UP to whole folded rows
        o = P - plft  # alignment rows; never read by any tap
    offs, WS = _conv_layout(w7, C, F, o, dilation, jnp.float32)
    WS = WS.astype(mxu)
    halo = offs[-1]
    res_off = P // F if F > 1 else plft

    xp = pad1d(x, (P, pr), mode=pad_mode)
    T_blk = _tile_rows(FC)
    n_t = -(-(T // F) // T_blk)
    need = (halo + n_t * T_blk) * F
    if xp.shape[1] < need:
        xp = jnp.pad(xp, ((0, 0), (0, need - xp.shape[1]), (0, 0)))
    xf = xp.reshape(B, need // F, FC) if F > 1 else xp
    head, body = xf[:, :halo], xf[:, halo:]

    # 1x1 conv: (O, I, 1) torch layout -> (I, O); block-diagonal when folded
    w1_io = jnp.transpose(w1[:, :, 0], (1, 0)).astype(jnp.float32)
    if F > 1:
        w1f = jnp.zeros((FC, FC), jnp.float32)
        for i in range(F):
            w1f = lax.dynamic_update_slice(w1f, w1_io, (i * C, i * C))
        w1_io = w1f
    w1_io = w1_io.astype(mxu)
    zeros = jnp.zeros((C,), jnp.float32)
    b7v = jnp.tile((b7 if b7 is not None else zeros).astype(jnp.float32)[None, :],
                   (1, F))
    b1v = jnp.tile((b1 if b1 is not None else zeros).astype(jnp.float32)[None, :],
                   (1, F))
    a1 = jnp.tile(alpha1.reshape(1, C).astype(jnp.float32), (1, F))
    a2 = jnp.tile(alpha2.reshape(1, C).astype(jnp.float32), (1, F))
    prm = jnp.concatenate(
        [a1, 1.0 / (a1 + 1e-9), a2, 1.0 / (a2 + 1e-9)], axis=0)

    grid = (B, n_t)
    kern = functools.partial(
        _kernel, T_blk=T_blk, halo=halo, offs=offs, res_off=res_off)
    S = len(offs)
    y = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, halo, FC), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T_blk, FC), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, FC, FC), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, FC), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FC, FC), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, FC), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, FC), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T_blk, FC), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_t * T_blk, FC), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((T_blk + halo, FC), x.dtype),   # xbuf (residual src)
            pltpu.VMEM((halo, FC), x.dtype),           # carry
            pltpu.VMEM((T_blk + halo, FC), mxu),       # y1 in MXU dtype
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n_t * T_blk * FC * FC * (S + 1),
            bytes_accessed=2 * B * T * C * 4,
            transcendentals=0,
        ),
        interpret=(jax.default_backend() == "cpu"),
    )(head, body, WS, b7v, w1_io, b1v, prm)
    if F > 1:
        y = y.reshape(B, n_t * T_blk * F, C)
    return y[:, :T]


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
