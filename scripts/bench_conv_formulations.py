"""Microbenchmark: 1-D conv formulations on TPU at the codec's hot shapes.

The round-trip profile (scripts/profile_roundtrip.py) shows XLA's TPU conv
emitter running the narrow-channel stride-1 convs at <1% MXU efficiency
(45 ms for a 31-GFLOP 1x1 conv at (16, 240000, 64)). Compare:

  conv      lax.conv_general_dilated (current path, NTC/TIO dims)
  dot       1x1 as a plain jnp.einsum matmul
  shifted   K-tap dilation-d conv as K accumulated matmuls over shifted
            slices of the padded input (no im2col materialization)

Each timed with the chained-scan trick (see bench.py docstring).
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


def timed(fn, *args):
    @jax.jit
    def chained(*a):
        def body(c, _):
            out = fn(*a[:-1], a[-1] + c * 1e-12)
            return jnp.sum(jnp.abs(out).astype(jnp.float32)), None

        s, _ = lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return s

    float(chained(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(*args))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS * 1e3  # ms


def conv_lax(w, x, dilation=1):
    # x (B,T,C), w (K,Cin,Cout) "TIO"
    return lax.conv_general_dilated(
        x, w, window_strides=(1,), padding="VALID", rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"))


def conv_dot(w, x):
    return jnp.einsum("btc,cd->btd", x, w[0])


def conv_shifted(w, x, dilation=1):
    K = w.shape[0]
    T = x.shape[1] - (K - 1) * dilation
    out = jnp.einsum("btc,cd->btd", lax.dynamic_slice_in_dim(x, 0, T, 1), w[0])
    for k in range(1, K):
        out = out + jnp.einsum(
            "btc,cd->btd", lax.dynamic_slice_in_dim(x, k * dilation, T, 1), w[k])
    return out


def main():
    B = 16
    key = jax.random.PRNGKey(0)
    shapes = [
        (240000, 64, 64),
        (240000, 96, 96),
        (120000, 192, 192),
        (120000, 128, 128),
        (24000, 384, 384),
        (24000, 256, 256),
    ]
    for T, Cin, Cout in shapes:
        x = 0.1 * jax.random.normal(key, (B, T, Cin), jnp.float32)
        flops1 = 2 * B * T * Cin * Cout
        # --- 1x1 ---
        w1 = 0.1 * jax.random.normal(key, (1, Cin, Cout), jnp.float32)
        t_conv = timed(lambda w, x: conv_lax(w, x), w1, x)
        t_dot = timed(conv_dot, w1, x)
        print(f"1x1  T={T:6d} C={Cin:4d}: conv {t_conv:7.2f} ms ({flops1/t_conv*1e-9:6.1f} TF/s)"
              f" | dot {t_dot:7.2f} ms ({flops1/t_dot*1e-9:6.1f} TF/s)", flush=True)
        # --- 7-tap, dilations 1 and 9 ---
        w7 = 0.1 * jax.random.normal(key, (7, Cin, Cout), jnp.float32)
        for d in (1, 9):
            xp = jnp.pad(x, ((0, 0), (6 * d, 0), (0, 0)))
            f = flops1 * 7
            t_conv = timed(lambda w, x: conv_lax(w, x, d), w7, xp)
            t_shift = timed(lambda w, x: conv_shifted(w, x, d), w7, xp)
            print(f"7tap d={d} T={T:6d} C={Cin:4d}: conv {t_conv:7.2f} ms ({f/t_conv*1e-9:6.1f} TF/s)"
                  f" | shifted {t_shift:7.2f} ms ({f/t_shift*1e-9:6.1f} TF/s)", flush=True)


if __name__ == "__main__":
    main()
