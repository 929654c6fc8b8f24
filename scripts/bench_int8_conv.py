"""Microbench: can int8 MXU convs beat the bf16/f32 emitters at codec widths?

TPU v5e's MXU has a 2x int8 peak (394 TOPS vs 197 TFLOPs bf16). If XLA's
conv emitter packs int8 operands well at the decoder's shapes, an int8
post-training-quantized DECODE path (codes stay bit-exact — the encoder
stays f32) could be the next big RTF lever. This measures the raw emitter
question before building any quantization machinery.

Shapes: the decoder's residual-unit convs at each stage width (CLAUDE.md:
model_4 at 96-192ch is the top round-trip sink) + the widest 1x1s.

Timing: chained lax.scan iterations gated by one scalar read (the tunnel
methodology from bench.py). The chain consumes the FULL output via a sum —
reading any single element instead lets XLA push the slice through the
convolution and compute one output pixel per iteration (first version of
this script measured a flat ~1.5 ms at every shape, below speed-of-light
for the largest by 14x). An MFU column keeps the numbers honest.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")

from facodec_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

ITERS = 20
DN = ("NHC", "HIO", "NHC")  # NTC activations, (K, Cin, Cout) kernels


def timed(fn, *args):
    @jax.jit
    def chained(*a):
        def body(carry, _):
            out = fn(*a, carry)
            # full-output sum: no dead output elements, chain stays live
            return jnp.sum(out, dtype=jnp.float32) * jnp.float32(1e-30), None

        s, _ = lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return s

    float(chained(*args))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(*args))
        times.append(time.perf_counter() - t0)
    return min(times) / ITERS * 1e3  # ms


def conv_case(B, T, C, k, dil, dtype):
    key = jax.random.PRNGKey(0)
    if dtype == "int8":
        x = jax.random.randint(key, (B, T, C), -127, 127, jnp.int8)
        w = jax.random.randint(key, (k, C, C), -127, 127, jnp.int8)

        def fn(x, w, carry):
            xi = x + carry.astype(jnp.int8)  # keep the chain live
            return lax.conv_general_dilated(
                xi, w, (1,), "VALID", rhs_dilation=(dil,),
                dimension_numbers=DN, preferred_element_type=jnp.int32,
            )

        return timed(fn, x, w)
    jdt = dict(f32=jnp.float32, bf16=jnp.bfloat16)[dtype]
    x = 0.1 * jax.random.normal(key, (B, T, C), jnp.float32)
    w = 0.1 * jax.random.normal(key, (k, C, C), jnp.float32)
    x, w = x.astype(jdt), w.astype(jdt)

    def fn(x, w, carry):
        xi = x + carry.astype(jdt)
        return lax.conv_general_dilated(
            xi, w, (1,), "VALID", rhs_dilation=(dil,),
            dimension_numbers=DN, preferred_element_type=jnp.float32,
        )

    return timed(fn, x, w)


PEAK = {"f32": 197e12, "bf16": 197e12, "int8": 394e12}  # v5e MXU peaks


def main():
    B = 16
    # (T, C, k, dil): decoder stage widths at their time rates (10 s clips)
    cases = [
        (4000, 1536, 7, 1),
        (24000, 768, 7, 9),
        (120000, 192, 7, 9),
        (240000, 96, 7, 9),
        (240000, 96, 7, 1),
    ]
    hdr = " ".join(f"{d+'/mfu':>14}" for d in ("f32", "bf16", "int8"))
    print(f"{'T':>8} {'C':>5} {'k':>2} {'d':>2} | {hdr}  (ms)")
    for T, C, k, dil in cases:
        flops = 2 * B * (T - (k - 1) * dil) * C * C * k
        row = []
        for dt in ("f32", "bf16", "int8"):
            try:
                ms = conv_case(B, T, C, k, dil, dt)
                mfu = flops / (ms * 1e-3) / PEAK[dt]
                row.append(f"{ms:8.3f}/{mfu:5.2f}")
            except Exception as e:
                row.append(f"ERR:{type(e).__name__[:10]}")
        print(f"{T:>8} {C:>5} {k:>2} {dil:>2} | " + " ".join(row))


if __name__ == "__main__":
    main()
