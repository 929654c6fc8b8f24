"""Headline benchmark: full codec round-trip (encode -> factorized quantize
-> decode) real-time factor on one chip, 24 kHz flagship configuration.

Prints ONE JSON line:
  {"metric": "encode_decode_rtf", "value": N, "unit": "x_realtime",
   "vs_baseline": N}

vs_baseline is relative to the driver target of 200x real time per chip
(BASELINE.md; the reference publishes no numbers of its own).

Timing methodology: the jitted round trip ends in a scalar reduction whose
host materialization (float()) gates the measurement — on the tunneled
'axon' TPU platform `block_until_ready` returns before execution finishes,
so naive async-loop timing reads absurdly high (~90000x); forcing a scalar
transfer measures true device completion."""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from __graft_entry__ import FLAGSHIP

TARGET_RTF = 200.0
SR = 24000
HOP = 300


def main():
    from facodec_tpu.models.builder import init_params
    from facodec_tpu.models.dac import Decoder, Encoder
    from facodec_tpu.models.fa_quantizer import FAquantizer

    models = dict(
        encoder=Encoder(**FLAGSHIP["encoder"]),
        quantizer=FAquantizer(**FLAGSHIP["quantizer"]),
        decoder=Decoder(**FLAGSHIP["decoder"]),
    )
    batch, seconds = 4, 10.0
    frames = int(seconds * SR) // HOP
    T = frames * HOP
    params = init_params(models, jax.random.PRNGKey(0), seg_frames=8)

    @jax.jit
    def roundtrip(params, wave):
        w = wave[:, :, None]
        z = models["encoder"].apply({"params": params["encoder"]}, w)
        outs, *_ = models["quantizer"].apply(
            {"params": params["quantizer"]}, z, wave, n_c=2
        )
        recon = models["decoder"].apply({"params": params["decoder"]}, outs)
        # scalar reduction: its host materialization proves the whole
        # round trip executed (block_until_ready is unreliable here)
        return jnp.sum(jnp.abs(recon))

    key = jax.random.PRNGKey(1)
    wave = 0.1 * jax.random.normal(key, (batch, T), jnp.float32)

    float(roundtrip(params, wave))  # warmup / compile

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(roundtrip(params, wave))
        times.append(time.perf_counter() - t0)
    dt = min(times)

    rtf = batch * seconds / dt
    print(json.dumps({
        "metric": "encode_decode_rtf",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / TARGET_RTF, 3),
    }))


if __name__ == "__main__":
    main()
