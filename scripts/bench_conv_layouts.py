"""Microbench: can NCW dimension numbers kill encoder stage-1's layout copies?

scripts/profile_roundtrip.py (round 3) shows encoder stage-1 (~42 ms at
batch 16x10 s) spends 17.4 ms in XLA layout-assignment copies —
{2,0,1}<->{1,2,0} transposes BETWEEN convs. Our convs are all expressed
NWC/WIO (nn/conv.py:135); XLA's TPU layout assignment then re-layouts
activations per conv. This measures a representative stage-1 chain (k=7
dilated residual taps + 1x1 einsum + snake + strided down-conv) expressed
with (a) NWC dims, (b) NCW dims, (c) NWC with conv-only (no snake, isolates
the activation's layout influence) — if (b) beats (a) by ~the copy time,
the encoder's hot stages should switch dimension numbers.

Timing: chained lax.scan gated by a scalar read (tunnel methodology),
consuming the FULL chain output per iteration — the first version read one
element and XLA sliced the whole chain down to one receptive field.
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

ITERS = 10
B, T, C = 16, 240000, 64


def snake(x, alpha=1.0):
    s = jnp.sin(alpha * x)
    return x + s * s  # representative VPU load; layout-agnostic math


def chain_nwc(x, w7, w1, wdown):
    # x (B, T, C); weights WIO
    for d in (1, 3, 9):
        y = lax.conv_general_dilated(
            snake(x), w7, (1,), [(3 * d, 3 * d)], rhs_dilation=(d,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        x = x + jnp.einsum("btc,cd->btd", snake(y), w1)
    return lax.conv_general_dilated(
        snake(x), wdown, (2,), [(1, 1)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )


def chain_ncw(x, w7, w1, wdown):
    # x (B, C, T); weights OIW
    for d in (1, 3, 9):
        y = lax.conv_general_dilated(
            snake(x), w7, (1,), [(3 * d, 3 * d)], rhs_dilation=(d,),
            dimension_numbers=("NCW", "OIW", "NCW"),
        )
        x = x + jnp.einsum("bct,dc->bdt", snake(y), w1)
    return lax.conv_general_dilated(
        snake(x), wdown, (2,), [(1, 1)],
        dimension_numbers=("NCW", "OIW", "NCW"),
    )


def timed(fn, *args):
    @jax.jit
    def chained(*a):
        def body(carry, _):
            out = fn(a[0] + carry, *a[1:])
            # consume the FULL output: reading one element instead lets XLA
            # push the slice back through the whole chain (each conv then
            # computes only the receptive-field window of one output pixel)
            return jnp.sum(out, dtype=jnp.float32) * jnp.float32(1e-30), None

        s, _ = lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return s

    float(chained(*args))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(*args))
        times.append(time.perf_counter() - t0)
    return min(times) / ITERS * 1e3


def main():
    key = jax.random.PRNGKey(0)
    x_ntc = 0.1 * jax.random.normal(key, (B, T, C), jnp.float32)
    w7_wio = 0.1 * jax.random.normal(key, (7, C, C), jnp.float32)
    w1 = 0.1 * jax.random.normal(key, (C, C), jnp.float32)
    wd_wio = 0.1 * jax.random.normal(key, (4, C, 2 * C), jnp.float32)

    t_nwc = timed(chain_nwc, x_ntc, w7_wio, w1, wd_wio)
    print(f"NWC chain: {t_nwc:8.3f} ms")

    x_nct = jnp.swapaxes(x_ntc, 1, 2)
    w7_oiw = jnp.transpose(w7_wio, (2, 1, 0))
    wd_oiw = jnp.transpose(wd_wio, (2, 1, 0))
    t_ncw = timed(chain_ncw, x_nct, w7_oiw, w1, wd_oiw)
    print(f"NCW chain: {t_ncw:8.3f} ms")
    print(f"delta: {t_nwc - t_ncw:+.3f} ms ({t_nwc / t_ncw:.2f}x)")


if __name__ == "__main__":
    main()
