"""The HTTP serving front-end (cli/serve.py): bucketed static shapes,
in-memory wav/.fac transport, and the live server endpoints."""

import base64
import json
import os
import threading
import urllib.request

import numpy as np
import pytest

TINY = os.path.join(os.path.dirname(__file__), "tiny_config.yml")
SR, HOP = 24000, 300


def tone(seconds=0.6, hz=220.0, seed=0):
    t = np.arange(int(seconds * SR)) / SR
    rng = np.random.default_rng(seed)
    return (0.4 * np.sin(2 * np.pi * hz * t) + 0.02 * rng.standard_normal(len(t))
            ).astype(np.float32)


@pytest.fixture(scope="module")
def service():
    from facodec_tpu.api import FACodec
    from facodec_tpu.cli.serve import CodecService

    codec = FACodec.from_config(TINY, n_c=2)
    # 0.5 s buckets so a 0.6 s tone exercises pad + trim
    return CodecService(codec, bucket_seconds=0.5, stream_threshold_seconds=4.0)


def test_wav_bytes_roundtrip():
    from facodec_tpu.cli.serve import read_wav_bytes, write_wav_bytes

    w = tone(0.2)
    blob = write_wav_bytes(w)
    back = read_wav_bytes(blob)
    assert back.shape == w.shape
    np.testing.assert_allclose(back, w, atol=2.0 / 32767)


def test_wav_bytes_resamples():
    from scipy.io import wavfile
    import io

    from facodec_tpu.cli.serve import read_wav_bytes

    t = np.arange(16000) / 16000.0
    w16 = (0.5 * np.sin(2 * np.pi * 100 * t)).astype(np.float32)
    buf = io.BytesIO()
    wavfile.write(buf, 16000, (w16 * 32767).astype(np.int16))
    out = read_wav_bytes(buf.getvalue())
    assert abs(len(out) - SR) <= 2  # 1 s at 24 kHz


def test_fac_bytes_roundtrip():
    from facodec_tpu.codec_file import FACodecFile

    rng = np.random.default_rng(1)
    f = FACodecFile(
        codes_p=rng.integers(0, 32, (1, 1, 7)).astype(np.uint16),
        codes_c=rng.integers(0, 32, (1, 2, 7)).astype(np.uint16),
        codes_r=None,
        timbre=rng.standard_normal((1, 16)).astype(np.float32),
        original_length=2100,
    )
    g = FACodecFile.from_bytes(f.to_bytes())
    np.testing.assert_array_equal(g.codes_p, f.codes_p)
    assert g.codes_r is None and g.original_length == 2100


def test_service_bucketing_shapes(service):
    """A 0.6 s request on 0.5 s buckets: padded to 1.0 s inside, output
    trimmed back to the request length; codes trimmed to true frames."""
    w = tone(0.6)
    true_frames = len(w) // HOP
    f = service.encode(w)
    assert f.codes_p.shape[-1] == true_frames
    assert f.original_length == true_frames * HOP
    out = service.reconstruct(w)
    assert out.shape == (1, true_frames * HOP)
    assert np.isfinite(out).all()


def test_service_bucketed_codes_prefix_match(service):
    """Causal config: bucket padding only perturbs the trailing mel
    reflect-pad span — every code frame before it matches the unpadded
    one-shot encoder bit for bit."""
    w = tone(0.6)
    f_b = service.encode(w)
    f_1 = service.codec.encode(w)
    # mel reflect pad spans n_fft//2 = 1024 samples ~ 4 frames
    guard = 5
    for a, b in ((f_b.codes_p, f_1.codes_p), (f_b.codes_c, f_1.codes_c),
                 (f_b.codes_r, f_1.codes_r)):
        np.testing.assert_array_equal(a[..., :-guard], b[..., :-guard])


def test_service_decode_matches_api(service):
    w = tone(0.6)
    f = service.codec.encode(w)
    np.testing.assert_allclose(
        service.decode(f), service.codec.decode(f), atol=0, rtol=0
    )


def test_microbatching_stacks_concurrent_requests():
    """4 concurrent same-bucket reconstructs land in ONE device call (window
    generously long so the burst always collects), and each result equals
    the sequential (batch-1) run of the same request."""
    from facodec_tpu.api import FACodec
    from facodec_tpu.cli.serve import CodecService

    codec = FACodec.from_config(TINY, n_c=2)
    service = CodecService(
        codec, bucket_seconds=0.5, max_batch=4, batch_window_ms=300.0
    )
    waves = [tone(0.4, hz=180.0 + 40 * i, seed=i) for i in range(4)]
    seq = [service.reconstruct(w) for w in waves]
    calls_before = service._batcher.calls

    results = [None] * 4

    def worker(i):
        results[i] = service.reconstruct(waves[i])

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert service._batcher.calls == calls_before + 1  # one stacked call
    assert service._batcher.max_seen == 4
    for got, want in zip(results, seq):
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    # error propagation: a bad payload must not wedge the worker
    with pytest.raises(Exception):
        service._batcher.submit(("encode", 123), (np.zeros(7, np.float32), 7))
    assert service.reconstruct(waves[0]).shape == seq[0].shape


def test_http_endpoints(service):
    from facodec_tpu.cli.serve import make_server, write_wav_bytes

    server = make_server(service, port=0)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{port}"
    try:
        health = json.loads(urllib.request.urlopen(f"{base}/health").read())
        assert health["status"] == "ok" and health["vc_available"] is False

        metrics = urllib.request.urlopen(f"{base}/metrics").read().decode()
        assert "facodec_requests_total" in metrics
        assert "facodec_device_calls_total" in metrics

        blob = write_wav_bytes(tone(0.6))
        req = urllib.request.Request(f"{base}/reconstruct", data=blob, method="POST")
        resp = urllib.request.urlopen(req)
        assert resp.headers["Content-Type"] == "audio/wav"
        assert len(resp.read()) > 44

        req = urllib.request.Request(f"{base}/encode", data=blob, method="POST")
        fac = urllib.request.urlopen(req).read()
        req = urllib.request.Request(f"{base}/decode", data=fac, method="POST")
        wav = urllib.request.urlopen(req).read()
        assert wav[:4] == b"RIFF"

        # residual-free decode
        req = urllib.request.Request(
            f"{base}/decode?residual=0", data=fac, method="POST"
        )
        assert urllib.request.urlopen(req).read()[:4] == b"RIFF"

        # after traffic, /metrics carries per-op latency quantiles
        metrics = urllib.request.urlopen(f"{base}/metrics").read().decode()
        assert 'facodec_request_latency_seconds{op="reconstruct",quantile="0.5"}' in metrics
        assert 'facodec_request_latency_seconds{op="decode",quantile="0.99"}' in metrics

        # VC without a redecoder -> 503
        body = json.dumps({
            "source_wav": base64.b64encode(blob).decode(),
            "target_wav": base64.b64encode(blob).decode(),
        }).encode()
        req = urllib.request.Request(f"{base}/convert", data=body, method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req)
        assert e.value.code == 503

        # malformed input -> 400, not a hung connection
        req = urllib.request.Request(
            f"{base}/decode", data=b"not a fac file", method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req)
        assert e.value.code == 400
    finally:
        server.shutdown()
        server.server_close()


def test_http_convert_with_redecoder():
    from facodec_tpu.api import FACodec, FARedecoder
    from facodec_tpu.cli.serve import CodecService, make_server, write_wav_bytes

    codec = FACodec.from_config(TINY, n_c=1)
    red = FARedecoder.from_config(TINY)
    service = CodecService(codec, red, bucket_seconds=0.5)
    server = make_server(service, port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        blob = write_wav_bytes(tone(0.6))
        body = json.dumps({
            "source_wav": base64.b64encode(blob).decode(),
            "target_wav": base64.b64encode(write_wav_bytes(tone(0.6, hz=330, seed=1))).decode(),
        }).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/convert", data=body, method="POST"
        )
        resp = urllib.request.urlopen(req)
        assert resp.read()[:4] == b"RIFF"
        health = json.loads(
            urllib.request.urlopen(f"http://127.0.0.1:{port}/health").read()
        )
        assert health["vc_available"] is True
    finally:
        server.shutdown()
        server.server_close()


def test_serve_sharded_inference(service):
    """--shard-inference semantics: a CodecService over a dp-sharded codec
    (params replicated, micro-batch sharded over the 8-virtual-device data
    axis) returns the same codes/audio as the single-device service."""
    from facodec_tpu.api import FACodec
    from facodec_tpu.cli.serve import CodecService

    wave = tone(0.6, hz=260.0, seed=21)
    f_ref = service.encode(wave)
    r_ref = service.reconstruct(wave)

    codec_dp = FACodec.from_config(TINY, n_c=2).shard_inference()
    svc_dp = CodecService(codec_dp, bucket_seconds=0.5,
                          stream_threshold_seconds=4.0)
    f_dp = svc_dp.encode(wave)
    for name in ("codes_p", "codes_c", "codes_r"):
        np.testing.assert_array_equal(getattr(f_dp, name), getattr(f_ref, name))
    np.testing.assert_allclose(f_dp.timbre, f_ref.timbre, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(svc_dp.reconstruct(wave), r_ref,
                               rtol=1e-5, atol=1e-5)


def test_fac_validation_rejects_malformed():
    """Hostile/malformed .fac uploads fail in FACodecFile.validate with a
    clear message rather than deep inside a jitted program."""
    from facodec_tpu.codec_file import FACodecFile

    rng = np.random.default_rng(2)

    def make(**kw):
        base = dict(
            codes_p=rng.integers(0, 32, (1, 1, 7)).astype(np.uint16),
            codes_c=rng.integers(0, 32, (1, 2, 7)).astype(np.uint16),
            codes_r=None,
            timbre=rng.standard_normal((1, 16)).astype(np.float32),
            original_length=2100,
        )
        base.update(kw)
        return FACodecFile(**base)

    with pytest.raises(ValueError, match="codes_c"):
        FACodecFile.from_bytes(
            make(codes_c=rng.integers(0, 32, (2, 7)).astype(np.uint16)
                 ).to_bytes())
    with pytest.raises(ValueError, match="codes_c"):
        FACodecFile.from_bytes(
            make(codes_c=rng.integers(0, 32, (1, 2, 9)).astype(np.uint16)
                 ).to_bytes())
    with pytest.raises(ValueError, match="timbre"):
        FACodecFile.from_bytes(
            make(timbre=np.zeros((2, 16), np.float32)).to_bytes())
    with pytest.raises(ValueError, match="original_length"):
        FACodecFile.from_bytes(make(original_length=-1).to_bytes())
    # integer dtype is required but any width is fine
    FACodecFile.from_bytes(
        make(codes_p=rng.integers(0, 32, (1, 1, 7)).astype(np.int64)
             ).to_bytes())


def test_decode_caps_hostile_length(service):
    """A crafted .fac claiming far more frames than --max-seconds decodes
    at most max_frames of audio instead of unbounded compute/output."""
    from facodec_tpu.codec_file import FACodecFile

    rng = np.random.default_rng(3)
    frames = service.max_frames + 64
    f = FACodecFile(
        codes_p=rng.integers(0, 32, (1, 1, frames)).astype(np.uint16),
        codes_c=rng.integers(0, 32, (1, 2, frames)).astype(np.uint16),
        codes_r=rng.integers(0, 32, (1, 3, frames)).astype(np.uint16),
        timbre=rng.standard_normal((1, 64)).astype(np.float32),
        original_length=frames * HOP,
    )
    out = service.decode(f)
    assert out.shape[-1] <= service.max_frames * HOP


def test_http_body_cap(service):
    """A request claiming an over-cap Content-Length is rejected with 413
    before the body is read."""
    from facodec_tpu.cli.serve import MAX_BODY_BYTES, make_server

    server = make_server(service, port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        import http.client

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.putrequest("POST", "/reconstruct")
        conn.putheader("Content-Length", str(MAX_BODY_BYTES + 1))
        conn.endheaders()
        # do NOT send the body; the server must answer from the header alone
        resp = conn.getresponse()
        assert resp.status == 413
        conn.close()
    finally:
        server.shutdown()
        server.server_close()
