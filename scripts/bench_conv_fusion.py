"""Isolate which fusion pattern makes the model's convs 8x slower than
standalone convs (see bench_conv_formulations.py vs profile_roundtrip.py).

Variants at the hot shape (16, 240000, 64), 7-tap dilation-1 VALID conv:
  plain        conv(x)
  in_snake     conv(snake(x))          — snake input-fused into conv?
  out_snake    snake(conv(x))          — output fusion
  wnorm        conv with weight-norm reparameterized kernel
  all          snake -> wnorm conv -> snake (the ResidualUnit pattern)
  barrier      snake -> BARRIER -> wnorm conv -> snake
  snake_only   snake(x)
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
    return best / ITERS * 1e3


def conv(w, x, d=1):
    return lax.conv_general_dilated(
        x, w, (1,), "VALID", rhs_dilation=(d,),
        dimension_numbers=("NWC", "WIO", "NWC"))


def snake(x, a):
    return x + jnp.square(jnp.sin(a * x)) / (a + 1e-9)


def wnorm(v, g):
    n = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1), keepdims=True))
    return v * (g / n)


def main():
    B, T, C = 16, 240000, 64
    key = jax.random.PRNGKey(0)
    x = 0.1 * jax.random.normal(key, (B, T + 6, C), jnp.float32)
    w = 0.1 * jax.random.normal(key, (7, C, C), jnp.float32)
    g = jnp.ones((1, 1, C))
    a = jnp.ones((1, 1, C))

    cases = {
        "plain": lambda w, g, a, x: conv(w, x),
        "in_snake": lambda w, g, a, x: conv(w, snake(x, a)),
        "out_snake": lambda w, g, a, x: snake(conv(w, x), a),
        "wnorm": lambda w, g, a, x: conv(wnorm(w, g), x),
        "all": lambda w, g, a, x: snake(conv(wnorm(w, g), snake(x, a)), a),
        "barrier": lambda w, g, a, x: snake(
            conv(wnorm(w, g), lax.optimization_barrier(snake(x, a))), a),
        "snake_only": lambda w, g, a, x: snake(x, a),
    }
    for name, fn in cases.items():
        t = timed(fn, w, g, a, x)
        print(f"{name:12s} {t:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
