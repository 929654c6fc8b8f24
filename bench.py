"""Headline benchmark: full codec round-trip (encode -> factorized quantize
-> decode) real-time factor on one chip, 24 kHz flagship configuration.

Prints ONE JSON line:
  {"metric": "encode_decode_rtf", "value": N, "unit": "x_realtime",
   "vs_baseline": N}

vs_baseline is relative to the driver target of 200x real time per chip
(BASELINE.md; the reference publishes no numbers of its own).

Timing methodology (see .claude/skills/verify/SKILL.md gotchas): on the
tunneled 'axon' TPU platform `block_until_ready` returns before execution
finishes, and each host materialization costs a ~32 ms tunnel round trip.
So ITERS round trips are CHAINED inside one jit via lax.scan (each iteration
consumes the previous scalar, preventing elision/reordering) and a single
float() gates the whole chain — the RTT amortizes to ~3 ms/iter."""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
from jax import lax

from __graft_entry__ import FLAGSHIP

TARGET_RTF = 200.0
SR = 24000
HOP = 300
ITERS = 10


def _cache():
    try:
        from facodec_tpu.utils.cache import enable_compile_cache

        enable_compile_cache()
    except Exception:
        pass


def main(batch: int = 16, seconds: float = 10.0):
    from facodec_tpu.models.builder import init_params
    from facodec_tpu.models.dac import Decoder, Encoder
    from facodec_tpu.models.fa_quantizer import FAquantizer

    models = dict(
        encoder=Encoder(**FLAGSHIP["encoder"]),
        quantizer=FAquantizer(**FLAGSHIP["quantizer"]),
        decoder=Decoder(**FLAGSHIP["decoder"]),
    )
    frames = int(seconds * SR) // HOP
    T = frames * HOP
    params = init_params(models, jax.random.PRNGKey(0), seg_frames=8)

    def roundtrip(params, wave):
        w = wave[:, :, None]
        z = models["encoder"].apply({"params": params["encoder"]}, w)
        outs, *_ = models["quantizer"].apply(
            {"params": params["quantizer"]}, z, wave, n_c=2
        )
        recon = models["decoder"].apply({"params": params["decoder"]}, outs)
        return jnp.sum(jnp.abs(recon))

    @jax.jit
    def chained(params, wave):
        def body(carry, _):
            # data dependency on the previous iteration's scalar keeps the
            # chain sequential and non-elidable
            s = roundtrip(params, wave + carry * 1e-12)
            return s, None
        s, _ = lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return s

    key = jax.random.PRNGKey(1)
    wave = 0.1 * jax.random.normal(key, (batch, T), jnp.float32)

    float(chained(params, wave))  # warmup / compile

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(params, wave))
        times.append(time.perf_counter() - t0)
    dt = min(times) / ITERS

    rtf = batch * seconds / dt
    print(json.dumps({
        "metric": "encode_decode_rtf",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / TARGET_RTF, 3),
    }))


if __name__ == "__main__":
    _cache()
    main()
