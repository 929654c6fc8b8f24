"""Live duplex streaming server (cli/stream_serve.py): framed TCP protocol,
exactness vs the interactive StreamingFACodec session, VC mode, ragged and
short streams."""

import json
import os
import socket
import struct
import threading

import numpy as np
import pytest

TINY = os.path.join(os.path.dirname(__file__), "tiny_config.yml")
SR, HOP = 24000, 300


def tone(seconds, hz=220.0, seed=0):
    t = np.arange(int(seconds * SR)) / SR
    rng = np.random.default_rng(seed)
    return (0.3 * np.sin(2 * np.pi * hz * t)
            + 0.02 * rng.standard_normal(len(t))).astype(np.float32)


@pytest.fixture(scope="module")
def live():
    """(server thread, StreamingService, port) over a tiny codec."""
    from facodec_tpu.api import FACodec
    from facodec_tpu.cli.serve import CodecService
    from facodec_tpu.cli.stream_serve import StreamingService, make_stream_server

    codec = FACodec.from_config(TINY, n_c=2)
    service = CodecService(codec, bucket_seconds=0.5)
    streaming = StreamingService(service)
    server = make_stream_server(streaming, port=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    yield streaming, server.server_address[1]
    server.shutdown()
    server.server_close()


def session_loop_reference(streaming, wave, timbre, chunk_frames):
    """The interactive session loop the server must match bit for bit
    (same pattern as tests/test_streaming.py::test_full_codec_streaming_exact)."""
    import jax.numpy as jnp

    sess = streaming.session(chunk_frames)
    est, dst = sess.init_encode_state(1), sess.init_decode_state(1)
    w = jnp.asarray(wave)[None, :]
    t = jnp.asarray(timbre)
    parts = []
    step = chunk_frames * HOP
    for i in range(0, w.shape[1], step):
        est, outs, _ = sess.encode_chunk(est, w[:, i : i + step], t)
        dst, out = sess.decode_chunk(dst, outs)
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
