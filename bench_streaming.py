"""Streaming benchmark: per-chunk latency of the exact stateful streaming
session (encode + decode) on one chip, flagship configuration.

Prints one JSON line:
  {"metric": "streaming_chunk_p50_ms", "value": N, "unit": "ms",
   "chunk_ms": M, "rtf": R}

This is the BASELINE.md 'streaming chunk p50 latency' metric. Two numbers:
  * interactive p50 — one host-driven chunk step (includes the ~32 ms tunnel
    RTT of this environment; on directly-attached TPUs that term vanishes);
  * device-only per-chunk time — the whole stream as one lax.scan
    (run_scan), total time / chunks, which amortizes the tunnel away and is
    the true on-device latency bound."""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import FLAGSHIP

SR, HOP = 24000, 300


def _cache():
    try:
        from facodec_tpu.utils.cache import enable_compile_cache

        enable_compile_cache()
    except Exception:
        pass


def main(chunk_frames: int = 4, seconds: float = 8.0, batch: int = 1):
    from facodec_tpu.models.builder import init_params
    from facodec_tpu.models.dac import Decoder, Encoder
    from facodec_tpu.models.latency import codec_latency
    from facodec_tpu.models.fa_quantizer import FAquantizer
    from facodec_tpu.models.streaming import StreamingFACodec

    enc = Encoder(**FLAGSHIP["encoder"])
    qt = FAquantizer(**FLAGSHIP["quantizer"])
    dec = Decoder(**FLAGSHIP["decoder"])
    models = dict(encoder=enc, quantizer=qt, decoder=dec)
    params = init_params(models, jax.random.PRNGKey(0), seg_frames=chunk_frames)

    sess = StreamingFACodec(enc, qt, dec, params, chunk_frames=chunk_frames, n_c=2)
    est = sess.init_encode_state(batch)
    dst = sess.init_decode_state(batch)
    timbre = jnp.zeros((batch, 1024), jnp.float32)

    n_chunks = int(seconds * SR) // (chunk_frames * HOP)
    key = jax.random.PRNGKey(1)
    lat = []
    for i in range(n_chunks):
        key, sub = jax.random.split(key)
        chunk = 0.1 * jax.random.normal(sub, (batch, chunk_frames * HOP), jnp.float32)
        float(jnp.sum(chunk))  # make input ready before timing
        t0 = time.perf_counter()
        # fused single-dispatch roundtrip: one device call per chunk (the
        # two-call encode/decode path pays a second dispatch, which
        # dominates at 50 ms chunks — round-4 trace: 1.08 ms device ops)
        est, dst, wave, codes = sess.roundtrip_chunk(est, dst, chunk, timbre)
        if wave is None:  # priming (chunk_frames < reflect span): no emission yet
            continue
        float(wave[0, -1])  # force completion
        lat.append(time.perf_counter() - t0)

    warm = lat[2:]
    p50 = float(np.percentile(warm, 50)) * 1e3
    p99 = float(np.percentile(warm, 99)) * 1e3
    chunk_ms = chunk_frames * HOP / SR * 1e3

    # device-only per-chunk: the chunk steps form a STATE DEPENDENCY CHAIN,
    # so dispatching M chunks and forcing only the last output measures all
    # M executions + one tunnel RTT, which amortizes. (run_scan would fuse
    # them into one launch but its serialized module exceeds the tunnel's
    # remote-compile size limit.)
    M = 16
    chunks = [
        0.1 * jax.random.normal(jax.random.PRNGKey(100 + i),
                                (batch, chunk_frames * HOP), jnp.float32)
        for i in range(M)
    ]
    jax.block_until_ready(chunks)

    def fork():
        """Fresh state buffers: the steady-state steps DONATE their state
        args (models/streaming.py), so each timing leg must start from its
        own copies — reusing `est`/`dst` after a leg consumed them would
        hit deleted buffers."""
        from dataclasses import replace as _replace

        e = _replace(est, core=jax.tree.map(jnp.copy, est.core))
        d = (jax.tree.map(jnp.copy, dst[0]), dst[1])
        jax.block_until_ready((e.core, d[0]))
        return e, d

    ts, ts2 = [], []
    for _ in range(3):
        e2, d2 = fork()
        t0 = time.perf_counter()
        for c in chunks:
            e2, d2, w, _ = sess.roundtrip_chunk(e2, d2, c, timbre)
        float(w[0, -1])
        ts.append(time.perf_counter() - t0)
        # two-call comparison leg (encode + decode as separate dispatches)
        e2, d2 = fork()
        t0 = time.perf_counter()
        for c in chunks:
            e2, outs, _ = sess.encode_chunk(e2, c, timbre)
            d2, w = sess.decode_chunk(d2, outs)
        float(w[0, -1])
        ts2.append(time.perf_counter() - t0)
    dev_ms = min(ts) / M * 1e3
    dev_ms_2call = min(ts2) / M * 1e3

    # true per-chunk DEVICE op time via a profiler trace: the chained
    # measurements above are dispatch-throughput through this env's tunnel
    # (per-call host->device send, 1-3 ms jitter); the trace sums only the
    # device's "XLA Ops" lane, which is what an attached TPU would cost
    # (round-4 finding: ~1.1 ms/chunk vs 3.8-6.9 ms chained).
    dev_op_ms = None
    try:
        import tempfile

        from facodec_tpu.utils.profiling import aggregate_device_trace, trace

        logdir = tempfile.mkdtemp(prefix="facodec_stream_trace_")
        e2, d2 = fork()
        with trace(logdir):
            for c in chunks:
                e2, d2, w, _ = sess.roundtrip_chunk(e2, d2, c, timbre)
            float(w[0, -1])
        _, _, total_ms = aggregate_device_trace(logdir, printout=False)
        if total_ms > 0:
            dev_op_ms = total_ms / M
    except Exception:
        pass

    # end-to-end latency a listener experiences in steady state: buffer one
    # chunk (chunk_ms) + 1 frame algorithmic mel lookahead + compute (p50,
    # which on this env includes the ~32 ms tunnel RTT; ~0 when attached)
    e2e = chunk_ms + HOP / SR * 1e3 + p50
    print(json.dumps({
        "metric": "streaming_chunk_p50_ms",
        "value": round(p50, 2),
        "unit": "ms",
        "chunk_ms": round(chunk_ms, 1),
        "p99_ms": round(p99, 2),
        "device_only_ms": round(dev_ms, 2),
        "device_only_2call_ms": round(dev_ms_2call, 2),
        "device_op_ms": round(dev_op_ms, 2) if dev_op_ms else None,
        "e2e_latency_ms": round(e2e, 2),
        "prime_ms": round(sess.prime_frames * HOP / SR * 1e3, 1),
        "rtf_interactive": round(chunk_ms / p50, 2),
        "rtf_device": round(chunk_ms / dev_ms, 2),
        # analytic per-config delay figures (models/latency.py, reference
        # dac/model/base.py:82-123 semantics)
        "latency_analytic": {
            k: v for k, v in codec_latency(
                tuple(enc.strides), tuple(dec.rates), causal=enc.causal,
                sample_rate=SR, chunk_frames=chunk_frames,
            ).as_dict().items()
            if k.endswith("_ms") or k in ("hop", "causal", "lookahead")
        },
        "redecoder_vc": bench_redecoder_vc(chunk_frames, batch),
        "group_capacity": bench_group_capacity(sess),
    }))


def bench_group_capacity(sess) -> dict:
    """Concurrent-real-time-stream capacity via continuous batching
    (models/stream_batch.py): per-tick device time of the masked batched
    step at group sizes B — every tick advances B live streams, so a chip
    sustains B streams in real time iff tick(B) <= chunk_ms. Reports the
    measured tick times, the largest swept B meeting the budget, and a
    linear extrapolation (tick time is ~linear in B past MXU fill).

    The reference has no serving stack; its real-time story is the
    causality claim (reference README.md:105-107) — one stream, one
    process. This is the per-chip capacity behind that claim."""
    import os

    from facodec_tpu.models.stream_batch import BatchedStreamGroup

    sweep = tuple(
        int(b) for b in os.environ.get(
            "FACODEC_BENCH_CAPACITY", "8,32,128").split(",")
    )
    chunk_ms = sess.chunk_frames * HOP / SR * 1e3
    step = sess.chunk_frames * HOP
    ticks = {}
    for B in sweep:
        try:
            group = BatchedStreamGroup(sess, B)
            waves = jnp.zeros((B, step), jnp.float32)
            mask = jnp.ones(B, bool)
            e, d = group.enc_core, group.dec_core
            w, _, e, d = group._step(
                sess.params, waves, group.timbre, e, d, mask)
            float(w[0, -1])  # warm compile + force
            M, ts = 8, []
            for _ in range(3):
                e2, d2 = e, d
                t0 = time.perf_counter()
                for _ in range(M):  # state chain amortizes the tunnel RTT
                    w, _, e2, d2 = group._step(
                        sess.params, waves, group.timbre, e2, d2, mask)
                float(w[0, -1])
                ts.append(time.perf_counter() - t0)
            ticks[B] = round(min(ts) / M * 1e3, 2)
        except Exception as e:  # noqa: BLE001 — OOM/compile cap: report, keep smaller B
            ticks[B] = f"failed: {type(e).__name__}"
            break
    ok = [B for B, t in ticks.items() if isinstance(t, float) and t <= chunk_ms]
    result = {"tick_ms": {str(B): t for B, t in ticks.items()},
              "chunk_budget_ms": round(chunk_ms, 1)}
    if ok:
        B = max(ok)
        result["sustained_streams_measured"] = B
        result["sustained_streams_extrapolated"] = int(B * chunk_ms / ticks[B])
    return result


def bench_redecoder_vc(chunk_frames: int = 4, batch: int = 1) -> dict:
    """Per-chunk latency of the streaming REDECODER VC path (source codes +
    target timbre -> wave; reference reconstruct_redecoder.py:94-128) at
    flagship width (WN-16 x 512ch conditioned on a 1024-d timbre + the full
    DAC decoder). Causal variant — the streamable real-time-VC config."""
    from facodec_tpu.models.builder import init_params
    from facodec_tpu.models.dac import Decoder
    from facodec_tpu.models.redecoder import Redecoder
    from facodec_tpu.models.streaming import StreamingRedecoder

    red = Redecoder(n_p_codebooks=1, n_c_codebooks=2, codebook_size=1024,
                    embed_dim=512, n_layers=16, causal=True, p_dropout=0.2,
                    gin_channels=1024, out_dim=1024)
    dec = Decoder(**FLAGSHIP["decoder"])
    params = init_params(dict(encoder=red, decoder=dec), jax.random.PRNGKey(0),
                         seg_frames=max(chunk_frames, 12))

    sess = StreamingRedecoder(red, dec, params, chunk_frames=chunk_frames,
                              use_p_code=False, n_c=1)
    state = sess.init_state(batch)
    timbre = jnp.zeros((batch, 1024), jnp.float32)
    rng = np.random.default_rng(0)

    def chunk(i):
        return (
            jnp.asarray(rng.integers(0, 1024, (batch, 1, chunk_frames)), jnp.int32),
            jnp.asarray(rng.integers(0, 1024, (batch, 2, chunk_frames)), jnp.int32),
        )

    lat = []
    n_chunks = max(12, 2 * sess.prime_frames // chunk_frames)
    for i in range(n_chunks):
        cp, cc = chunk(i)
        float(jnp.sum(cp))
        t0 = time.perf_counter()
        state, wave = sess.vc_chunk(state, cp, cc, timbre)
        if wave is None:
            continue
        float(wave[0, -1])
        lat.append(time.perf_counter() - t0)
    p50 = float(np.percentile(lat[2:], 50)) * 1e3

    # device-only: chained steps, force only the last output (amortizes RTT)
    M = 16
    cps = [chunk(100 + i) for i in range(M)]
    ts = []
    for _ in range(3):
        s2 = state
        t0 = time.perf_counter()
        for cp, cc in cps:
            s2, w = sess.vc_chunk(s2, cp, cc, timbre)
        float(w[0, -1])
        ts.append(time.perf_counter() - t0)
    dev_ms = min(ts) / M * 1e3
    chunk_ms = chunk_frames * HOP / SR * 1e3
    return {
        "p50_ms": round(p50, 2),
        "device_only_ms": round(dev_ms, 2),
        "rtf_device": round(chunk_ms / dev_ms, 2),
        "prime_ms": round(sess.prime_frames * HOP / SR * 1e3, 1),
    }


if __name__ == "__main__":
    _cache()
    import sys

    main(chunk_frames=int(sys.argv[1]) if len(sys.argv) > 1 else 4)
