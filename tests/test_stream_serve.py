"""Live duplex streaming server (cli/stream_serve.py): framed TCP protocol,
exactness vs the interactive StreamingFACodec session, VC mode, ragged and
short streams."""

import base64
import json
import os
import socket
import struct
import threading
import time

import numpy as np
import pytest

TINY = os.path.join(os.path.dirname(__file__), "tiny_config.yml")
SR, HOP = 24000, 300


def tone(seconds, hz=220.0, seed=0):
    t = np.arange(int(seconds * SR)) / SR
    rng = np.random.default_rng(seed)
    return (0.3 * np.sin(2 * np.pi * hz * t)
            + 0.02 * rng.standard_normal(len(t))).astype(np.float32)


def _live_pair(group_capacity):
    from facodec_tpu.api import FACodec
    from facodec_tpu.cli.serve import CodecService
    from facodec_tpu.cli.stream_serve import StreamingService, make_stream_server

    codec = FACodec.from_config(TINY, n_c=2)
    service = CodecService(codec, bucket_seconds=0.5)
    streaming = StreamingService(service, group_capacity=group_capacity)
    server = make_stream_server(streaming, port=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return streaming, server


@pytest.fixture(scope="module")
def live():
    """Grouping DISABLED: the dedicated-session path with its bit-exactness
    guarantees."""
    streaming, server = _live_pair(group_capacity=0)
    yield streaming, server.server_address[1]
    server.shutdown()
    server.server_close()


@pytest.fixture(scope="module")
def live_grouped():
    """Continuous batching ON (the serving default)."""
    streaming, server = _live_pair(group_capacity=4)
    yield streaming, server.server_address[1]
    server.shutdown()
    server.server_close()


def session_loop_reference(streaming, wave, timbre, chunk_frames):
    """The interactive session loop the server must match bit for bit.
    Uses the fused roundtrip_chunk — the same compiled module the server's
    solo path runs (the two-call composition is float-noise different under
    XLA fusion, so bit-exactness requires matching the call structure)."""
    import jax.numpy as jnp

    sess = streaming.session(chunk_frames)
    est, dst = sess.init_encode_state(1), sess.init_decode_state(1)
    w = jnp.asarray(wave)[None, :]
    t = jnp.asarray(timbre)
    parts = []
    step = chunk_frames * HOP
    for i in range(0, w.shape[1], step):
        est, dst, out, _ = sess.roundtrip_chunk(est, dst, w[:, i : i + step], t)
        if out is not None:
            parts.append(np.asarray(out)[0])
    outs_t, _ = sess.flush_encode(est, t)
    dst, out_t = sess.decode_chunk(dst, outs_t)
    parts.append(np.asarray(out_t)[0])
    return np.concatenate(parts)


def test_stream_exact_multiple_matches_session(live):
    """Whole-chunk input: server output == interactive session loop (with
    the server's own self-timbre), bit for bit including the flush frame."""
    from facodec_tpu.cli.stream_serve import stream_wav

    streaming, port = live
    C = 4
    sess = streaming.session(C)
    n_chunks = max(3, sess.prime_frames // C + 2)
    wave = tone(n_chunks * C * HOP / SR, seed=3)
    assert len(wave) == n_chunks * C * HOP

    out, status = stream_wav("127.0.0.1", port, wave, chunk_frames=C)
    assert status["prime_samples"] == sess.prime_frames * HOP
    assert status["vc"] is False
    assert out.shape == wave.shape

    # the server estimates timbre from the priming prefix
    timbre = streaming.timbre_from_wave(wave[: sess.prime_frames * HOP])
    want = session_loop_reference(streaming, wave, timbre, C)
    np.testing.assert_array_equal(out, want)


def test_stream_vc_target_timbre(live):
    """VC mode: output equals a session loop conditioned on the TARGET
    utterance's (bucketed masked-encode) timbre vector."""
    from facodec_tpu.cli.serve import write_wav_bytes
    from facodec_tpu.cli.stream_serve import stream_wav

    streaming, port = live
    C = 4
    sess = streaming.session(C)
    n_chunks = sess.prime_frames // C + 2
    source = tone(n_chunks * C * HOP / SR, hz=196.0, seed=5)
    target = tone(0.45, hz=330.0, seed=6)

    blob = write_wav_bytes(target)
    out, status = stream_wav(
        "127.0.0.1", port, source, chunk_frames=C, timbre_wav_bytes=blob,
    )
    assert status["vc"] is True
    # the wire carries int16 WAV: condition the reference on the same
    # quantized target the server decoded
    from facodec_tpu.cli.serve import read_wav_bytes

    timbre = streaming.timbre_from_wave(read_wav_bytes(blob))
    want = session_loop_reference(streaming, source, timbre, C)
    np.testing.assert_array_equal(out, want)
    # and it differs from the self-timbre stream (the timbre injection is live)
    out_self, _ = stream_wav("127.0.0.1", port, source, chunk_frames=C)
    assert not np.array_equal(out, out_self)


def test_stream_ragged_frames_and_tail(live):
    """Client frame sizes are arbitrary: an off-chunk send size plus a
    partial final chunk. Output length = input frame span; every sample
    before the final frame matches the exact-multiple stream (causal)."""
    from facodec_tpu.cli.stream_serve import stream_wav

    streaming, port = live
    C = 4
    sess = streaming.session(C)
    frames = sess.prime_frames + 2 * C + 2  # partial tail of 2 frames
    wave = tone(frames * HOP / SR, seed=7)

    out, _ = stream_wav("127.0.0.1", port, wave, chunk_frames=C,
                        send_samples=777)
    assert out.shape == (frames * HOP,)

    # prefix-exact vs the same stream extended to a whole chunk count
    full = tone((sess.prime_frames + 3 * C) * HOP / SR, seed=7)
    full[: len(wave)] = wave
    out_full, _ = stream_wav("127.0.0.1", port, full, chunk_frames=C)
    np.testing.assert_array_equal(out[: (frames - 1) * HOP],
                                  out_full[: (frames - 1) * HOP])
    assert np.isfinite(out).all()


def test_stream_shorter_than_priming(live):
    """A stream shorter than prime_samples still produces (trimmed, exact-
    length) output via zero-fed priming."""
    from facodec_tpu.cli.stream_serve import stream_wav

    streaming, port = live
    C = 4
    wave = tone(2 * HOP / SR, seed=9)  # 2 frames << prime
    out, _ = stream_wav("127.0.0.1", port, wave, chunk_frames=C)
    assert out.shape == (2 * HOP,)
    assert np.isfinite(out).all()


def test_stream_rejects_bad_header(live):
    _, port = live
    with socket.create_connection(("127.0.0.1", port)) as sock:
        sock.sendall(json.dumps({"chunk_frames": 9999}).encode() + b"\n")
        line = sock.makefile("rb").readline()
    assert json.loads(line)["status"] == "error"


def test_grouped_streams_batch_and_match_solo(live_grouped, live):
    """Concurrent connections share device ticks (continuous batching) and
    each stream's output matches the dedicated-session server to float
    tolerance."""
    from facodec_tpu.cli.stream_serve import stream_wav

    streaming, port = live_grouped
    _, solo_port = live
    C = 4
    sess = streaming.session(C)
    n_chunks = sess.prime_frames // C + 4
    waves = [tone(n_chunks * C * HOP / SR, hz=180.0 + 50 * i, seed=40 + i)
             for i in range(3)]

    results = [None] * 3

    def worker(i):
        results[i] = stream_wav("127.0.0.1", port, waves[i], chunk_frames=C)[0]

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    disp = streaming.dispatcher(C)
    assert disp is not None and disp.max_stacked >= 2, (
        "concurrent streams never shared a tick"
    )
    from facodec_tpu.cli.serve import render_metrics

    metrics = render_metrics(streaming.service)
    assert f'facodec_stream_ticks_total{{chunk_frames="{C}"}}' in metrics
    assert 'facodec_stream_tick_max_stacked' in metrics
    for i in range(3):
        want, _ = stream_wav("127.0.0.1", solo_port, waves[i], chunk_frames=C)
        assert results[i].shape == want.shape
        np.testing.assert_allclose(results[i], want, rtol=1e-5, atol=1e-6)


def test_grouped_overflow_falls_back_to_solo():
    """More concurrent streams than group slots: the overflow stream runs a
    dedicated session and still completes correctly."""
    from facodec_tpu.cli.stream_serve import stream_wav

    streaming, server = _live_pair(group_capacity=1)
    port = server.server_address[1]
    try:
        C = 4
        sess = streaming.session(C)
        n_chunks = sess.prime_frames // C + 3
        waves = [tone(n_chunks * C * HOP / SR, hz=200.0 + 60 * i, seed=50 + i)
                 for i in range(2)]
        results = [None] * 2
        threads = [
            threading.Thread(
                target=lambda i=i: results.__setitem__(
                    i, stream_wav("127.0.0.1", port, waves[i],
                                  chunk_frames=C)[0]
                )
            )
            for i in range(2)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i, out in enumerate(results):
            assert out.shape == (len(waves[i]),)
            assert np.isfinite(out).all()
        assert streaming.dispatcher(C).group.free_slots() == 1  # all released
    finally:
        server.shutdown()
        server.server_close()


def test_stream_metrics_and_requests(live):
    """Stream sessions count as requests and land chunk latencies in the
    /metrics window."""
    from facodec_tpu.cli.serve import render_metrics
    from facodec_tpu.cli.stream_serve import stream_wav

    streaming, port = live
    svc = streaming.service
    before = svc.requests
    C = 4
    sess = streaming.session(C)
    wave = tone((sess.prime_frames + C) * HOP / SR, seed=11)
    stream_wav("127.0.0.1", port, wave, chunk_frames=C)
    assert svc.requests > before
    assert 'op="stream_chunk"' in render_metrics(svc)


@pytest.fixture(scope="module")
def live_vc():
    """Server with a redecoder configured (live redecoder-VC route)."""
    from facodec_tpu.api import FACodec, FARedecoder
    from facodec_tpu.cli.serve import CodecService
    from facodec_tpu.cli.stream_serve import StreamingService, make_stream_server

    codec = FACodec.from_config(TINY, n_c=2)
    red = FARedecoder.from_config(TINY)
    service = CodecService(codec, red, bucket_seconds=0.5)
    streaming = StreamingService(service, group_capacity=0)
    server = make_stream_server(streaming, port=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    yield codec, red, streaming, server.server_address[1]
    server.shutdown()
    server.server_close()


def test_stream_redecoder_vc_matches_oneshot(live_vc):
    """vc_mode=redecoder: the live stream equals one-shot
    FARedecoder.resynthesize on the one-shot codes (streaming codes are
    bit-exact; the redecoder session is exact to float tolerance)."""
    from facodec_tpu.cli.serve import read_wav_bytes, write_wav_bytes
    from facodec_tpu.cli.stream_serve import stream_wav

    codec, red, streaming, port = live_vc
    C = 4
    sess = streaming.session(C)
    rsess = streaming.redecoder_session(C)
    n_chunks = (sess.prime_frames + rsess.prime_frames) // C + 3
    source = tone(n_chunks * C * HOP / SR, hz=196.0, seed=7)
    target = tone(0.45, hz=330.0, seed=8)
    blob = write_wav_bytes(target)

    out, status = stream_wav("127.0.0.1", port, source, chunk_frames=C,
                             timbre_wav_bytes=blob, vc_mode="redecoder")
    assert status["vc_mode"] == "redecoder"
    assert status["redecoder_prime_frames"] == rsess.prime_frames
    assert out.shape == source.shape

    f = codec.encode(source)
    timbre = streaming.timbre_from_wave(read_wav_bytes(blob))
    want = red.resynthesize(f, timbre)[0]
    np.testing.assert_allclose(out, want, rtol=2e-4, atol=2e-4)


def test_stream_redecoder_vc_short_stream(live_vc):
    """A stream shorter than the combined priming spans still produces
    full-length, finite output (zero-pad priming on both stages)."""
    from facodec_tpu.cli.serve import write_wav_bytes
    from facodec_tpu.cli.stream_serve import stream_wav

    _, _, streaming, port = live_vc
    C = 4
    source = tone(2 * C * HOP / SR, hz=250.0, seed=9)
    blob = write_wav_bytes(tone(0.45, hz=330.0, seed=10))
    out, _ = stream_wav("127.0.0.1", port, source, chunk_frames=C,
                        timbre_wav_bytes=blob, vc_mode="redecoder")
    assert out.shape == source.shape
    assert np.isfinite(out).all()


def test_stream_redecoder_vc_requires_timbre(live_vc):
    """vc_mode=redecoder without timbre_wav is a protocol error."""
    import socket

    _, _, _, port = live_vc
    with socket.create_connection(("127.0.0.1", port)) as sock:
        sock.sendall(json.dumps({"chunk_frames": 4,
                                 "vc_mode": "redecoder"}).encode() + b"\n")
        line = sock.makefile("rb").readline()
    assert json.loads(line)["status"] == "error"


def test_stream_redecoder_vc_unavailable(live):
    """vc_mode=redecoder on a server without --redecoder-config errors
    cleanly instead of crashing the connection thread."""
    import socket

    from facodec_tpu.cli.serve import write_wav_bytes

    _, port = live
    blob = write_wav_bytes(tone(0.45, hz=330.0, seed=12))
    header = {"chunk_frames": 4, "vc_mode": "redecoder",
              "timbre_wav": base64.b64encode(blob).decode()}
    with socket.create_connection(("127.0.0.1", port)) as sock:
        sock.sendall(json.dumps(header).encode() + b"\n")
        line = sock.makefile("rb").readline()
    assert json.loads(line)["status"] == "error"


def _wait_for(cond, timeout_s=60.0, what=""):
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if cond():
            return
        time.sleep(0.1)
    raise AssertionError(f"timed out waiting for {what}")


def _wait_handlers_done():
    """Block until no socketserver handler thread is running a device call —
    a handler alive inside XLA at interpreter exit aborts C++ teardown
    ('FATAL: exception not rethrown', exit 134)."""
    _wait_for(
        lambda: not any(
            t.is_alive() and "process_request_thread" in t.name
            for t in threading.enumerate()
        ),
        what="stream handler threads to exit",
    )


def test_grouped_slot_released_on_abrupt_disconnect(live_grouped):
    """A client that vanishes mid-stream (no end-of-stream marker, no drain)
    must not leak its group slot."""
    import socket

    streaming, port = live_grouped
    C = 4
    sess = streaming.session(C)
    disp = streaming.dispatcher(C)
    free_before = disp.group.free_slots()

    sock = socket.create_connection(("127.0.0.1", port))
    wfile = sock.makefile("wb")
    rfile = sock.makefile("rb")
    wfile.write(json.dumps({"chunk_frames": C}).encode() + b"\n")
    wfile.flush()
    assert json.loads(rfile.readline())["status"] == "ok"
    # prime (joins a slot) + a couple of live chunks
    step = C * HOP
    wave = tone((sess.prime_frames * HOP + 2 * step) / SR, seed=60)
    for i in range(0, len(wave), step):
        payload = np.ascontiguousarray(wave[i : i + step], np.float32).tobytes()
        wfile.write(struct.pack("<I", len(payload)) + payload)
    wfile.flush()
    _wait_for(lambda: disp.group.free_slots() < free_before,
              what="the stream to occupy a slot")
    # vanish: close EVERY handle (makefile objects keep the fd alive — the
    # server only sees EOF/RST once all of them are gone)
    wfile.close()
    rfile.close()
    sock.close()

    _wait_for(lambda: disp.group.free_slots() == free_before,
              what="the slot to be released")
    _wait_handlers_done()


def test_stream_idle_timeout_reclaims_connection():
    """A connection that goes SILENT (fd still open, nothing sent) is
    dropped after idle_timeout_s and its continuous-batching slot is
    reclaimed."""
    from facodec_tpu.cli.stream_serve import make_stream_server

    streaming, _server = _live_pair(group_capacity=2)
    _server.shutdown()
    _server.server_close()
    server = make_stream_server(streaming, port=0, idle_timeout_s=1.0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        C = 4
        sess = streaming.session(C)
        sock = socket.create_connection(("127.0.0.1", port))
        wfile = sock.makefile("wb")
        rfile = sock.makefile("rb")
        wfile.write(json.dumps({"chunk_frames": C}).encode() + b"\n")
        wfile.flush()
        assert json.loads(rfile.readline())["status"] == "ok"
        # prime (occupies a group slot), then go silent — do NOT close
        disp = streaming.dispatcher(C)
        free_before = disp.group.free_slots()
        wave = tone(sess.prime_frames * HOP / SR, seed=70)
        payload = np.ascontiguousarray(wave, np.float32).tobytes()
        wfile.write(struct.pack("<I", len(payload)) + payload)
        wfile.flush()
        _wait_for(lambda: disp.group.free_slots() < free_before,
                  what="the stream to occupy a slot")
        _wait_for(lambda: disp.group.free_slots() == free_before,
                  what="the idle timeout to reclaim the slot")
        wfile.close()
        rfile.close()
        sock.close()
        _wait_handlers_done()
    finally:
        server.shutdown()
        server.server_close()
