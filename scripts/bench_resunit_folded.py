"""Measure the fused Pallas residual unit (lane-folded vs F=1 vs XLA) at the
codec's hot shapes on the real chip. Timing follows CLAUDE.md rules: chained
lax.scan iterations + a scalar host read (axon block_until_ready returns
early).

    python scripts/bench_resunit_folded.py [C T dilation]
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
B = 16


def timed(fn, *args):
    @jax.jit
    def chained(*a):
        def body(c, _):
            out = fn(a[0] + c * 1e-12, *a[1:])
            return jnp.sum(jnp.abs(out).astype(jnp.float32)) * 1e-20, None

        s, _ = lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return s

    float(chained(*args))  # compile + warm
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(*args))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS * 1e3


def main(C=64, T=240000, dilations=(1, 3, 9)):
    from facodec_tpu.models.dac import ResidualUnit
    from facodec_tpu.ops.fused import enable_fused
    from facodec_tpu.ops.pallas import resunit as ru

    x = 0.35 * jax.random.normal(jax.random.PRNGKey(0), (B, T, C), jnp.float32)
    for d in dilations:
        unit = ResidualUnit(C, dilation=d, causal=True)
        params = unit.init(jax.random.PRNGKey(1), x)["params"]

        enable_fused(False)
        t_xla = timed(lambda xx: unit.apply({"params": params}, xx), x)

        enable_fused(True)
        t_fused = timed(lambda xx: unit.apply({"params": params}, xx), x)
        F = ru._fold_factor(C, d, T)

        # force-unfolded comparison when the default folds
        t_unf = float("nan")
        if F > 1:
            orig = ru._fold_factor
            ru._fold_factor = lambda *a: 1
            try:
                t_unf = timed(lambda xx: unit.apply({"params": params}, xx), x)
            finally:
                ru._fold_factor = orig
        enable_fused(False)
        print(f"C={C} T={T} d={d}: XLA {t_xla:6.2f} ms | fused(F={F}) "
              f"{t_fused:6.2f} ms | fused(F=1) {t_unf:6.2f} ms")


if __name__ == "__main__":
    if len(sys.argv) > 1:
        C, T = int(sys.argv[1]), int(sys.argv[2])
        ds = (int(sys.argv[3]),) if len(sys.argv) > 3 else (1, 3, 9)
        main(C, T, ds)
    else:
        main()
