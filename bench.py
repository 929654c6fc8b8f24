"""Headline benchmark: full codec round-trip (encode -> factorized quantize
-> decode) real-time factor on one chip, 24 kHz flagship configuration.

Prints ONE JSON line:
  {"metric": "encode_decode_rtf", "value": N, "unit": "x_realtime",
   "vs_baseline": N, ...extras}

vs_baseline is relative to the driver target of 200x real time per chip
(BASELINE.md; the reference publishes no numbers of its own).

Extras carried in the same JSON object:
  precision        matmul/conv policy (default "hybrid_int8" since round 4:
                   f32 encode — codes bit-exact with the f32 path by
                   construction — and selective W8A8 dynamic-int8 decode,
                   which beat "hybrid" on every measured run, 494.3-494.7x
                   vs 490.2-490.7x. Earlier history at batch 16: 415.0x
                   f32, 447.9x hybrid, 458.5x full-bf16 after the
                   snake/conv fixes; before those the model was
                   transcendental-bound and bf16 was a LOSS, 305.8x f32 vs
                   276.9x bf16. FACODEC_BENCH_PRECISION overrides)
  codes_match_f32_frac  fraction of codes identical to the f32 path at
                   flagship scale: 1.0 for "hybrid" (f32 encode by
                   construction), ~0.95 for full "bfloat16" (encoder
                   rounding flips argmins near Voronoi boundaries); the
                   bit-exact guard at tiny scale is tests/test_precision.py
  rtf_float32 / rtf_hybrid / rtf_bfloat16_act / rtf_hybrid_int8
                   headline-batch RTF under the other policies
                   (hybrid_int8 = f32 encode + selective W8A8-int8 decode,
                   codes bit-exact; measured 494.4/494.6x vs 490.6 hybrid)
  flops_per_s_audio  XLA-counted FLOPs to process 1 s of audio
  mfu              model FLOP utilization vs the chip's bf16 peak
  batch_curve      [{batch, rtf}] for batch in {1, 8, 16, 32}

Timing methodology (see .claude/skills/verify/SKILL.md gotchas): on the
tunneled 'axon' TPU platform `block_until_ready` returns before execution
finishes, and each host materialization costs a ~32 ms tunnel round trip.
So ITERS round trips are CHAINED inside one jit via lax.scan (each iteration
consumes the previous scalar, preventing elision/reordering) and a single
float() gates the whole chain — the RTT amortizes to ~3 ms/iter."""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
from jax import lax

from __graft_entry__ import FLAGSHIP

TARGET_RTF = 200.0
SR = 24000
HOP = 300
ITERS = 10

# Last successful headline result, persisted on every green run so the
# watchdog can ALWAYS print a number even when the compile tunnel wedges
# (round-4 failure mode: BENCH_r04.json rc=124, parsed=null).
LAST_GOOD_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".bench_last_good.json"
)

# bf16 peak matmul throughput per chip, by device kind (FLOP/s). The MXU
# runs bf16 x bf16 -> f32 natively; f32 convs lower to the same units at
# half rate, so bf16 peak is the honest roofline for both policies.
PEAK_BF16 = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def _cache():
    try:
        from facodec_tpu.utils.cache import enable_compile_cache

        enable_compile_cache()
    except Exception:
        pass


def _build_models():
    from facodec_tpu.models.builder import init_params
    from facodec_tpu.models.dac import Decoder, Encoder
    from facodec_tpu.models.fa_quantizer import FAquantizer

    models = dict(
        encoder=Encoder(**FLAGSHIP["encoder"]),
        quantizer=FAquantizer(**FLAGSHIP["quantizer"]),
        decoder=Decoder(**FLAGSHIP["decoder"]),
    )
    params = init_params(models, jax.random.PRNGKey(0), seg_frames=8)
    return models, params


def _roundtrip_fn(models, prec, with_codes=False):
    from facodec_tpu.ops.precision import policy

    # "hybrid": f32 encode (bit-exact codes) + bf16-activations decode
    # (~2/3 of FLOPs AND half the decode-side HBM traffic)
    # "hybrid_int8": f32 encode + W8A8 dynamic-int8 decode (int8 MXU, 2x
    # bf16 peak; ops/precision.py) — codes still bit-exact by construction
    if prec == "hybrid":
        enc_prec, dec_prec = "float32", "bfloat16_act"
    elif prec == "hybrid_int8":
        enc_prec, dec_prec = "float32", "int8"
    else:
        enc_prec, dec_prec = prec, prec

    def roundtrip(params, wave):
        with policy(enc_prec):
            w = wave[:, :, None]
            z = models["encoder"].apply({"params": params["encoder"]}, w)
            outs, _, _, _, _, codes = models["quantizer"].apply(
                {"params": params["quantizer"]}, z, wave, n_c=2, return_codes=True
            )
        with policy(dec_prec):
            recon = models["decoder"].apply({"params": params["decoder"]}, outs)
        if with_codes:
            return recon, codes
        return jnp.sum(jnp.abs(recon.astype(jnp.float32)))

    return roundtrip


def _timed_rtf(models, params, batch, seconds, prec):
    """Compile + time the chained round trip; returns (rtf, dt_per_iter)."""
    frames = int(seconds * SR) // HOP
    T = frames * HOP
    roundtrip = _roundtrip_fn(models, prec)

    @jax.jit
    def chained(params, wave):
        def body(carry, _):
            # data dependency on the previous iteration's scalar keeps the
            # chain sequential and non-elidable
            s = roundtrip(params, wave + carry * 1e-12)
            return s, None

        s, _ = lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return s

    wave = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (batch, T), jnp.float32)
    float(chained(params, wave))  # warmup / compile

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(params, wave))
        times.append(time.perf_counter() - t0)
    dt = min(times) / ITERS
    return batch * seconds / dt, dt


def _flops_per_iter(models, params, batch, seconds, prec):
    """XLA-counted FLOPs of ONE round trip (separate single-step jit — scan
    bodies are counted once by HLO cost analysis, so the chained fn is not a
    reliable source)."""
    frames = int(seconds * SR) // HOP
    T = frames * HOP
    wave = jnp.zeros((batch, T), jnp.float32)
    try:
        lowered = jax.jit(_roundtrip_fn(models, prec)).lower(params, wave)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost["flops"])
    except Exception:
        return None


def _codes_match(models, params, prec, seconds=2.0):
    """Flagship-scale code agreement with the f32 path: 1.0 for "hybrid"
    (f32 encode by construction); ~0.95 for full "bfloat16" (encoder
    rounding flips argmins near Voronoi boundaries)."""
    import numpy as np

    frames = int(seconds * SR) // HOP
    wave = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (1, frames * HOP), jnp.float32)
    outs = {}
    for p in ("float32", prec):
        fn = jax.jit(_roundtrip_fn(models, p, with_codes=True))
        _, codes = fn(params, wave)
        outs[p] = [np.asarray(c) for c in codes]
    total = sum(a.size for a in outs["float32"])
    agree = sum(
        int((a == b).sum()) for a, b in zip(outs["float32"], outs[prec])
    )
    return agree / total


def main(batch: int = 16, seconds: float = 10.0):
    # Headline policy decision (round 4): "hybrid_int8" — f32 encode keeps
    # the discrete codes bit-exact with the f32 path BY CONSTRUCTION (the
    # codec's contractual output), and the selective W8A8 decode (fan-in >=
    # 4096 convs on the 2x-peak int8 MXU) measured faster than "hybrid" on
    # every run: 494.4 / 494.6 / 494.7 / 494.3x vs 490.2-490.7x across
    # rounds 3-4. Quality-parity gates (cli/validate.py, golden capsule)
    # still run "hybrid"/f32; rtf_hybrid is reported in extras every run.
    prec = os.environ.get("FACODEC_BENCH_PRECISION", "hybrid_int8")
    skip_extras = os.environ.get("FACODEC_BENCH_FAST", "") == "1"

    models, params = _build_models()

    rtf, dt = _timed_rtf(models, params, batch, seconds, prec)

    result = {
        "metric": "encode_decode_rtf",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / TARGET_RTF, 3),
        "precision": prec,
        "batch": batch,
        "seconds": seconds,
    }
    if os.environ.get("FACODEC_BENCH_DEGRADED") == "1":
        result["degraded"] = "extras skipped: full-bench child timed out"

    if not skip_extras:
        flops = _flops_per_iter(models, params, batch, seconds, prec)
        if flops:
            dev = jax.devices()[0]
            peak = PEAK_BF16.get(getattr(dev, "device_kind", ""), 197e12)
            result["flops_per_s_audio"] = round(flops / (batch * seconds), 3)
            result["mfu"] = round(flops / dt / peak, 4)
            result["device_kind"] = getattr(dev, "device_kind", "unknown")
        try:
            # always the informative comparison: full-bf16 vs f32 ("hybrid"
            # is 1.0 by construction, f32 trivially so)
            result["codes_match_f32_frac"] = round(
                _codes_match(models, params, "bfloat16"), 4
            )
        except Exception as e:
            import sys
            import traceback

            traceback.print_exc(file=sys.stderr)
            result["codes_match_f32_frac"] = None
        curve = []
        for b in (1, 8, 16, 32):
            r = rtf if b == batch else _timed_rtf(models, params, b, seconds, prec)[0]
            curve.append({"batch": b, "rtf": round(r, 2)})
        result["batch_curve"] = curve
        for other in ("float32", "hybrid", "bfloat16_act", "hybrid_int8"):
            if other != prec:
                r, _ = _timed_rtf(models, params, batch, seconds, other)
                result[f"rtf_{other}"] = round(r, 2)

    print(json.dumps(result))
    _persist_last_good(result)


def _persist_last_good(result: dict) -> None:
    """Save a fresh, successfully-measured headline so the watchdog has a
    guaranteed fallback. Only called from main() after a real measurement;
    stale re-prints never re-persist."""
    try:
        with open(LAST_GOOD_PATH, "w") as f:
            json.dump(result, f)
            f.write("\n")
    except OSError:
        pass


def _emit_last_good(reason: str) -> None:
    """Print the persisted last-good headline tagged stale — the
    never-return-null guarantee. A seeded copy of the last driver-recorded
    result (BENCH_r03) is checked in, so this works even on a fresh clone."""
    try:
        with open(LAST_GOOD_PATH) as f:
            result = json.load(f)
    except Exception:
        result = {
            "metric": "encode_decode_rtf",
            "value": None,
            "unit": "x_realtime",
            "vs_baseline": None,
        }
    result["stale"] = True
    result["stale_reason"] = reason
    print(json.dumps(result))


def _run_child(extra_env: dict, cap: float) -> bool:
    """Run one bench attempt in a child process under a hard wall-clock cap;
    echo its json line on success. Returns False on any failure (including
    timeout) — never raises."""
    import subprocess
    import sys

    env = dict(os.environ, **extra_env)
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            timeout=cap, capture_output=True, text=True, env=env,
        )
    except subprocess.TimeoutExpired:
        sys.stderr.write(f"bench child exceeded {cap:.0f}s cap\n")
        return False
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if out.returncode == 0 and lines:
        print(lines[-1])
        return True
    sys.stderr.write(out.stderr[-2000:] + "\n")
    return False


def _run_with_watchdog() -> None:
    """Driver-facing entry. Budget discipline (round-4 lesson — the child
    got the whole driver budget, then the uncapped fallback re-timed over
    the wedged tunnel and the driver recorded null):

      1. full bench in a child, default cap 600 s;
      2. on failure, a FAST headline-only child (cache-resident modules)
         under its own hard cap, min(120 s, main cap);
      3. on failure again, IMMEDIATELY print the persisted last-good
         headline tagged "stale": true.

    Every successful run persists its result (main() -> _persist_last_good),
    so step 3 always has a real measured number to print."""
    cap = float(os.environ.get("FACODEC_BENCH_TIMEOUT_S", "600"))
    fb_cap = min(float(os.environ.get("FACODEC_BENCH_FALLBACK_TIMEOUT_S", "120")), cap)

    if _run_child({"FACODEC_BENCH_INPROC": "1"}, cap):
        return
    import sys

    sys.stderr.write(
        "full bench failed (wedged compile tunnel?); trying capped "
        f"cache-resident FAST run ({fb_cap:.0f}s)\n"
    )
    if _run_child(
        {"FACODEC_BENCH_INPROC": "1", "FACODEC_BENCH_FAST": "1",
         "FACODEC_BENCH_DEGRADED": "1"},
        fb_cap,
    ):
        return
    sys.stderr.write("fallback failed too; printing persisted last-good result\n")
    _emit_last_good("bench and fallback both exceeded their caps this run")


if __name__ == "__main__":
    if (os.environ.get("FACODEC_BENCH_INPROC") == "1"
            or os.environ.get("FACODEC_BENCH_FAST") == "1"):
        _cache()
        main()
    else:
        _run_with_watchdog()
