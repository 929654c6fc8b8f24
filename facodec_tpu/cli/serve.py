"""HTTP inference server: the production serving front-end over the codec.

The reference's only serving surface is the gradio demo (webui.py:54-81);
this is the deployable equivalent — a dependency-free HTTP daemon (stdlib
`http.server`) exposing the same operations as bytes-in/bytes-out endpoints:

  GET  /health            liveness + device + compiled-bucket inventory
  GET  /metrics           Prometheus text: counters + per-op latency quantiles
  POST /reconstruct       WAV body        -> WAV   (codec round trip)
  POST /encode            WAV body        -> .fac  (factorized codes)
  POST /decode            .fac body       -> WAV   (?residual=0 drops r-codes)
  POST /convert           JSON {source_wav, target_wav} (base64 WAV)
                                          -> WAV   (zero-shot VC; 503 until
                                                    a redecoder is configured)

With --stream-port N, a second TCP listener serves LIVE duplex PCM streaming
(real-time reconstruction / zero-shot VC with one-chunk latency) through the
exact stateful session — framed protocol in cli/stream_serve.py.

TPU-native serving disciplines (what makes this more than a file-CLI loop):

  * STATIC SHAPES. Every request wave is zero-padded up to a length bucket
    (multiples of --bucket-seconds), so XLA compiles ONE program per bucket
    instead of one per distinct request length. Timbre pooling is masked to
    the true length (`wave_lens`, reference modules/quantize.py:375-382
    pools the full utterance), decode output is trimmed to the true length,
    and trailing code frames from the pad are dropped. With the causal
    flagship config the retained frames are prefix-stable; only the last
    few frames (mel reflect-pad span) can differ from the unpadded forward.
  * BOUNDED MEMORY. Inputs past --stream-threshold-seconds run through the
    exact stateful streaming session (codes bit-identical, O(chunk)
    activations) instead of a whole-utterance program.
  * WARM START. --warmup compiles the first bucket before the socket opens
    (flagship compiles take minutes; a cold server would eat that on the
    first request). Combined with the persistent compile cache
    (utils/cache.py) a restarted server is hot immediately.
  * One device queue: JAX dispatch is serialized with a lock — concurrent
    requests queue for the chip instead of interleaving host callbacks.
  * CROSS-REQUEST MICRO-BATCHING. Batch 1 underfills the chip (bench.py
    batch curve: 210x RTF at batch 1 vs 490x at batch 16) — concurrent
    encode/reconstruct requests landing in the same length bucket within
    --batch-window-ms are stacked into ONE device call (batch dim padded to
    a power of two <= --max-batch, so the program inventory stays
    log2(max_batch) x n_buckets). Single sporadic requests pay at most the
    window (default 5 ms) in added latency.

Usage:
  python -m facodec_tpu serve --config-path configs/config.yml \
      --ckpt-path ckpt.bin --port 8080 [--redecoder-config ... \
      --redecoder-ckpt ...] [--precision hybrid]
"""

from __future__ import annotations

import base64
import collections
import dataclasses
import io
import json
import threading
import time
from typing import Optional

import numpy as np

SR = 24000
HOP = 300
MAX_BODY_BYTES = 64 * 1024 * 1024  # untrusted uploads (wav / .fac / JSON)


class _TooLarge(ValueError):
    """Request body over the serving cap (HTTP 413)."""


# ----------------------------------------------------------------- wav bytes


def read_wav_bytes(blob: bytes, sr: int = SR) -> np.ndarray:
    """WAV bytes -> mono float32 at `sr` (linear-resampled if needed)."""
    from scipy.io import wavfile

    file_sr, data = wavfile.read(io.BytesIO(blob))
    if data.dtype.kind == "i":
        data = data.astype(np.float32) / np.iinfo(data.dtype).max
    elif data.dtype.kind == "u":
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim > 1:
        data = data.mean(axis=1)
    if file_sr != sr:
        t = np.linspace(0.0, len(data) / file_sr,
                        int(len(data) * sr / file_sr), endpoint=False)
        data = np.interp(t, np.arange(len(data)) / file_sr, data).astype(np.float32)
    return data


def write_wav_bytes(wave: np.ndarray, sr: int = SR) -> bytes:
    from scipy.io import wavfile

    wave = np.asarray(wave)
    if wave.ndim == 2:
        wave = wave[0]
    buf = io.BytesIO()
    wavfile.write(buf, sr, (np.clip(wave, -1.0, 1.0) * 32767.0).astype(np.int16))
    return buf.getvalue()


# ------------------------------------------------------------------- service


class _MicroBatcher:
    """Stacks concurrent same-key submissions into one call to `run_batch`.

    `submit(key, payload)` blocks the calling (HTTP handler) thread until a
    single worker thread has collected up to `max_batch` payloads sharing
    `key` (waiting `window_s` for a burst to accumulate), executed
    `run_batch(key, payloads)`, and distributed the per-payload results."""

    def __init__(self, run_batch, window_s: float = 0.005, max_batch: int = 8):
        self._run = run_batch
        self.window_s = window_s
        self.max_batch = max_batch
        self._q = collections.defaultdict(collections.deque)
        self._cv = threading.Condition()
        self._stop = False
        self.calls = 0  # device calls issued
        self.max_seen = 0  # largest batch actually stacked
        self._worker = threading.Thread(
            target=self._loop, name="facodec-microbatch", daemon=True
        )
        self._worker.start()

    def submit(self, key, payload):
        item = {"payload": payload, "done": threading.Event(),
                "result": None, "error": None, "ts": time.monotonic()}
        with self._cv:
            if self._stop:
                raise RuntimeError("micro-batcher closed")
            self._q[key].append(item)
            self._cv.notify()
        item["done"].wait()
        if item["error"] is not None:
            raise item["error"]
        return item["result"]

    def _loop(self):
        while True:
            # dispatch order is FIFO by each queue's HEAD age (never "the
            # fullest queue" — that starves sparse buckets under sustained
            # load on a busy one), and an item only waits out whatever is
            # LEFT of its window, so multiple active buckets don't stack
            # whole windows of latency on each other
            with self._cv:
                while not self._stop and not any(self._q.values()):
                    self._cv.wait()
                if self._stop:
                    for q in self._q.values():
                        for it in q:
                            it["error"] = RuntimeError("micro-batcher closed")
                            it["done"].set()
                    self._q.clear()
                    return
                key = min(self._q, key=lambda k: self._q[k][0]["ts"])
                head_ts = self._q[key][0]["ts"]
                ready = len(self._q[key])
            if ready < self.max_batch:
                remaining = self.window_s - (time.monotonic() - head_ts)
                if remaining > 0:
                    time.sleep(remaining)
            with self._cv:
                q = self._q.get(key)
                if not q:
                    continue
                items = [q.popleft() for _ in range(min(self.max_batch, len(q)))]
                if not q:
                    del self._q[key]
            try:
                results = self._run(key, [it["payload"] for it in items])
                for it, r in zip(items, results):
                    it["result"] = r
            except Exception as e:  # noqa: BLE001 — propagate to every waiter
                for it in items:
                    it["error"] = e
            self.calls += 1
            self.max_seen = max(self.max_seen, len(items))
            for it in items:
                it["done"].set()

    def close(self):
        """Stop the worker; queued-but-undispatched items fail with
        'micro-batcher closed' instead of hanging their submitters."""
        with self._cv:
            self._stop = True
            self._cv.notify_all()


class CodecService:
    """Bucketed, lock-serialized inference over a FACodec (+ optional
    FARedecoder). Independent of the HTTP layer for testability."""

    def __init__(
        self,
        codec,
        redecoder=None,
        bucket_seconds: float = 1.0,
        stream_threshold_seconds: float = 32.0,
        max_seconds: float = 120.0,
        max_batch: int = 8,
        batch_window_ms: float = 5.0,
    ):
        self.codec = codec
        self.redecoder = redecoder
        self.bucket_frames = max(1, int(bucket_seconds * SR) // HOP)
        self.stream_threshold_frames = int(stream_threshold_seconds * SR) // HOP
        self.max_frames = int(max_seconds * SR) // HOP
        # round down to a power of two: collected batches pad UP to a power
        # of two, which must not exceed the cap
        self.max_batch = 1 << (max(1, max_batch).bit_length() - 1)
        self.lock = threading.Lock()
        self.started = time.time()
        self.requests = 0
        self.stream_port = None  # set when a live-stream TCP server attaches
        self._stats_lock = threading.Lock()  # += from concurrent handlers
        self._lat = collections.defaultdict(
            lambda: collections.deque(maxlen=512)  # /metrics latency window
        )
        self._batcher = _MicroBatcher(
            self._run_batch, window_s=batch_window_ms / 1e3,
            max_batch=self.max_batch,
        )

        from facodec_tpu.ops.precision import policy

        enc, qt = codec.models["encoder"], codec.models["quantizer"]
        dec = codec.models["decoder"]
        n_c = codec.n_c
        if codec.precision == "hybrid":
            enc_prec, dec_prec = "float32", "bfloat16_act"
        else:
            enc_prec = dec_prec = codec.precision

        def encode_masked(params, wave, lens):
            # same trace as api.FACodec's encode, plus bucket-pad masking:
            # full_waves + wave_lens drive the masked timbre pooling
            with policy(enc_prec):
                z = enc.apply({"params": params["encoder"]}, wave[:, :, None])
                outs, _, _, _, timbre, codes = qt.apply(
                    {"params": params["quantizer"]}, z, wave, n_c=n_c,
                    full_waves=wave, wave_lens=lens, return_codes=True,
                )
                return outs, codes, timbre

        def decode_outs(params, outs):
            with policy(dec_prec):
                return dec.apply(
                    {"params": params["decoder"]}, outs
                )[:, :, 0].astype(np.float32)

        import jax

        self._enc = jax.jit(encode_masked)
        self._dec = jax.jit(decode_outs)


    def _count_request(self, op=None, t0=None):
        with self._stats_lock:
            self.requests += 1
            if op is not None:
                self._lat[op].append(time.perf_counter() - t0)

    # -- shape management ----------------------------------------------------

    def _bucketed(self, wave: np.ndarray):
        """(T,) float32 -> (padded row (Tb,) numpy, true T, true frames)."""
        T = min(len(wave), self.max_frames * HOP) // HOP * HOP
        frames = T // HOP
        if frames == 0:
            raise ValueError(f"input shorter than one hop ({HOP} samples)")
        bf = self.bucket_frames
        frames_b = -(-frames // bf) * bf
        padded = np.zeros(frames_b * HOP, np.float32)
        padded[:T] = wave[:T]
        return padded, T, frames

    def _run_batch(self, key, payloads):
        """ONE device call for up to max_batch same-bucket requests: stack
        the padded rows, pad the batch dim to a power of two (zero rows,
        full-bucket lens), run, split per request. When the codec was
        sharded (`shard_inference` / serve --shard-inference), the stacked
        batch is placed with the data-axis sharding so the one device call
        is an SPMD program over the mesh (rows are independent — identical
        per-row values, test_serve_sharded_inference)."""
        import jax.numpy as jnp

        op, Tb = key
        n = len(payloads)
        nb = 1 << (n - 1).bit_length()
        mesh = getattr(self.codec, "_mesh", None)
        if mesh is not None:  # batch dim must divide the data axis
            nd = int(mesh.shape["data"])
            nb = -(-nb // nd) * nd
        waves = np.zeros((nb, Tb), np.float32)
        lens = np.full(nb, Tb, np.int32)
        for i, (row, T) in enumerate(payloads):
            waves[i] = row
            lens[i] = T
        w, wl = jnp.asarray(waves), jnp.asarray(lens)
        if mesh is not None:
            import jax

            from facodec_tpu.parallel.mesh import batch_sharding

            w = jax.device_put(w, batch_sharding(mesh))
            wl = jax.device_put(wl, batch_sharding(mesh))
        with self.lock:
            outs, codes, timbre = self._enc(self.codec.params, w, wl)
            if op == "reconstruct":
                out = np.asarray(self._dec(self.codec.params, outs))
                return [out[i : i + 1] for i in range(n)]
        cp, cc, cr = (np.asarray(c) for c in codes)
        tm = np.asarray(timbre)
        return [
            (cp[i : i + 1], cc[i : i + 1], cr[i : i + 1], tm[i : i + 1])
            for i in range(n)
        ]

    # -- operations ----------------------------------------------------------

    def encode(self, wave: np.ndarray):
        """float wave -> FACodecFile (bucketed or exact-streaming)."""
        from facodec_tpu.codec_file import FACodecFile

        t0 = time.perf_counter()
        frames = len(wave) // HOP
        if frames > self.stream_threshold_frames:
            with self.lock:
                return self.codec.encode_streaming(wave[: self.max_frames * HOP])
        row, T, true_frames = self._bucketed(np.asarray(wave, np.float32))
        cp, cc, cr, timbre = self._batcher.submit(("encode", len(row)), (row, T))
        cp, cc, cr = (c[..., :true_frames] for c in (cp, cc, cr))
        self._count_request("encode", t0)
        return FACodecFile(
            codes_p=cp.astype(np.uint16), codes_c=cc.astype(np.uint16),
            codes_r=cr.astype(np.uint16), timbre=timbre,
            sample_rate=SR, hop_length=HOP,
            original_length=true_frames * HOP,
        )

    def decode(self, f, use_residual: bool = True) -> np.ndarray:
        t0 = time.perf_counter()
        frames = f.codes_p.shape[-1]
        if frames > self.max_frames:  # same --max-seconds cap as encode:
            # a crafted .fac must not buy unbounded decode compute/output
            f = dataclasses.replace(
                f,
                codes_p=f.codes_p[..., : self.max_frames],
                codes_c=f.codes_c[..., : self.max_frames],
                codes_r=(None if f.codes_r is None
                         else f.codes_r[..., : self.max_frames]),
                original_length=min(f.original_length or 0,
                                    self.max_frames * HOP) or 0,
            )
            frames = self.max_frames
        with self.lock:
            if frames > self.stream_threshold_frames:
                out = self.codec.decode_streaming(f, use_residual=use_residual)
            else:
                out = self.codec.decode(f, use_residual=use_residual)
        self._count_request("decode", t0)
        return out

    def reconstruct(self, wave: np.ndarray) -> np.ndarray:
        t0 = time.perf_counter()
        frames = len(wave) // HOP
        if frames > self.stream_threshold_frames:
            return self.decode(self.encode(wave))
        row, T, true_frames = self._bucketed(np.asarray(wave, np.float32))
        out = self._batcher.submit(("reconstruct", len(row)), (row, T))
        self._count_request("reconstruct", t0)
        return out[:, : true_frames * HOP]

    def convert(self, source: np.ndarray, target: np.ndarray) -> np.ndarray:
        """Zero-shot VC (reference reconstruct_redecoder.py:110-128). The
        target timbre runs through the bucketed masked encoder; the
        redecoder pass uses the source's true code length (its WN stack is
        non-causal, so code padding would perturb the interior — VC traces
        one program per distinct source length)."""
        if self.redecoder is None:
            raise RuntimeError("no redecoder configured (--redecoder-config)")
        t0 = time.perf_counter()
        f = self.encode(source)
        row, T, _ = self._bucketed(np.asarray(target, np.float32))
        _, _, _, timbre = self._batcher.submit(("encode", len(row)), (row, T))
        with self.lock:
            out = self.redecoder.resynthesize(f, timbre)
        self._count_request("convert", t0)
        return out

    def warmup(self) -> float:
        """Compile the first bucket (encode+decode); returns seconds taken."""
        t0 = time.time()
        self.reconstruct(np.zeros(self.bucket_frames * HOP, np.float32))
        return time.time() - t0

    def health(self) -> dict:
        import jax

        dev = jax.devices()[0]
        return {
            "status": "ok",
            "device": f"{dev.platform}:{getattr(dev, 'device_kind', '?')}",
            "precision": self.codec.precision,
            "bucket_frames": self.bucket_frames,
            "sample_rate": SR,
            "vc_available": self.redecoder is not None,
            "uptime_s": round(time.time() - self.started, 1),
            "requests": self.requests,
            "max_batch": self.max_batch,
            "device_calls": self._batcher.calls,
            "max_batch_seen": self._batcher.max_seen,
            "stream_port": self.stream_port,
        }


class ArtifactService:
    """Serve from an AOT export (utils/export.py) — no model source and no
    tracing at serving time: the artifact pins ONE (batch, seconds) program
    per function. Requests zero-pad to the artifact bucket (masked timbre
    pooling keeps the global vector exact) and micro-batch up to the
    artifact's batch — the batch dim is baked into the exported signature,
    so every device call runs at exactly that batch.

    Deliberately NOT supported without model source: exact streaming for
    long inputs (past-bucket requests get 400), residual-free decode, VC.
    Duck-types CodecService for the HTTP layer."""

    def __init__(self, artifact_dir: str, params, batch_window_ms: float = 5.0):
        from facodec_tpu.utils.export import ExportedCodec

        self.exported = ExportedCodec(artifact_dir)
        m = self.exported.meta
        if "encode_masked" not in m["functions"]:
            raise ValueError(
                "artifact lacks the masked serving functions — re-export "
                "with the current utils/export.py"
            )
        self.params = params
        self.frames = int(m["frames"])
        self.batch = int(m["batch"])
        self.precision = m.get("precision", "?")
        self.redecoder = None
        self.lock = threading.Lock()
        self.started = time.time()
        self.requests = 0
        self._stats_lock = threading.Lock()  # += from concurrent handlers
        self._lat = collections.defaultdict(
            lambda: collections.deque(maxlen=512)  # /metrics latency window
        )
        self._batcher = _MicroBatcher(
            self._run_batch, window_s=batch_window_ms / 1e3,
            max_batch=self.batch,
        )


    def _count_request(self, op=None, t0=None):
        with self._stats_lock:
            self.requests += 1
            if op is not None:
                self._lat[op].append(time.perf_counter() - t0)

    # -- shape management ----------------------------------------------------

    def _bucketed(self, wave: np.ndarray):
        T = len(wave) // HOP * HOP
        frames = T // HOP
        if frames == 0:
            raise ValueError(f"input shorter than one hop ({HOP} samples)")
        if frames > self.frames:
            raise ValueError(
                f"input ({frames} frames) exceeds the artifact bucket "
                f"({self.frames} frames); export a larger artifact"
            )
        row = np.zeros(self.frames * HOP, np.float32)
        row[:T] = wave[:T]
        return row, T, frames

    def _run_batch(self, key, payloads):
        import jax.numpy as jnp

        op = key[0]
        n = len(payloads)
        waves = np.zeros((self.batch, self.frames * HOP), np.float32)
        lens = np.full(self.batch, self.frames * HOP, np.int32)
        for i, (row, T) in enumerate(payloads):
            waves[i] = row
            lens[i] = T
        w, wl = jnp.asarray(waves), jnp.asarray(lens)
        with self.lock:
            if op == "reconstruct":
                out = np.asarray(
                    self.exported.reconstruct_masked(self.params, w, wl)
                )
                return [out[i : i + 1] for i in range(n)]
            cp, cc, cr, tm = self.exported.encode_masked(self.params, w, wl)
        cp, cc, cr, tm = (np.asarray(x) for x in (cp, cc, cr, tm))
        return [
            (cp[i : i + 1], cc[i : i + 1], cr[i : i + 1], tm[i : i + 1])
            for i in range(n)
        ]

    # -- operations ----------------------------------------------------------

    def encode(self, wave: np.ndarray):
        from facodec_tpu.codec_file import FACodecFile

        t0 = time.perf_counter()
        row, T, true_frames = self._bucketed(np.asarray(wave, np.float32))
        cp, cc, cr, timbre = self._batcher.submit(("encode",), (row, T))
        cp, cc, cr = (c[..., :true_frames] for c in (cp, cc, cr))
        self._count_request("encode", t0)
        return FACodecFile(
            codes_p=cp.astype(np.uint16), codes_c=cc.astype(np.uint16),
            codes_r=cr.astype(np.uint16), timbre=timbre,
            sample_rate=SR, hop_length=HOP,
            original_length=true_frames * HOP,
        )

    def decode(self, f, use_residual: bool = True) -> np.ndarray:
        import jax.numpy as jnp

        t0 = time.perf_counter()
        if not use_residual or f.codes_r is None:
            raise ValueError(
                "the exported decode signature requires residual codes"
            )
        B, frames = f.codes_p.shape[0], f.codes_p.shape[-1]
        if frames > self.frames or B > self.batch:
            raise ValueError(
                f"codes ({B}x{frames}) exceed the artifact signature "
                f"({self.batch}x{self.frames})"
            )

        def pad(c, n_books):
            full = np.zeros((self.batch, n_books, self.frames), np.int32)
            full[:B, :, :frames] = c.astype(np.int32)
            return jnp.asarray(full)

        tm = np.zeros((self.batch, f.timbre.shape[-1]), np.float32)
        tm[:B] = f.timbre
        with self.lock:
            wave = np.asarray(self.exported.decode(
                self.params, pad(f.codes_p, f.codes_p.shape[1]),
                pad(f.codes_c, f.codes_c.shape[1]),
                pad(f.codes_r, f.codes_r.shape[1]), jnp.asarray(tm),
            ))
        self._count_request("decode", t0)
        # causal decoder: the zero-padded tail frames cannot affect the
        # retained prefix
        return wave[:B, : (f.original_length or frames * HOP)]

    def reconstruct(self, wave: np.ndarray) -> np.ndarray:
        t0 = time.perf_counter()
        row, T, true_frames = self._bucketed(np.asarray(wave, np.float32))
        out = self._batcher.submit(("reconstruct",), (row, T))
        self._count_request("reconstruct", t0)
        return out[:, : true_frames * HOP]

    def convert(self, source, target):
        raise RuntimeError(
            "VC is not available when serving from an artifact "
            "(run with --config-path/--redecoder-config instead)"
        )

    def warmup(self) -> float:
        t0 = time.time()
        self.reconstruct(np.zeros(self.frames * HOP, np.float32))
        return time.time() - t0

    def health(self) -> dict:
        import jax

        dev = jax.devices()[0]
        return {
            "status": "ok",
            "device": f"{dev.platform}:{getattr(dev, 'device_kind', '?')}",
            "precision": self.precision,
            "artifact": True,
            "bucket_frames": self.frames,
            "sample_rate": SR,
            "vc_available": False,
            "uptime_s": round(time.time() - self.started, 1),
            "requests": self.requests,
            "max_batch": self.batch,
            "device_calls": self._batcher.calls,
            "max_batch_seen": self._batcher.max_seen,
        }


def render_metrics(service) -> str:
    """Prometheus text exposition: request/device-call counters + per-op
    latency quantiles over a 512-sample sliding window. Works for both
    CodecService and ArtifactService (same stats surface)."""
    h = service.health()
    lines = [
        "# TYPE facodec_requests_total counter",
        f"facodec_requests_total {h['requests']}",
        "# TYPE facodec_device_calls_total counter",
        f"facodec_device_calls_total {h['device_calls']}",
        "# TYPE facodec_max_batch_seen gauge",
        f"facodec_max_batch_seen {h['max_batch_seen']}",
        "# TYPE facodec_uptime_seconds gauge",
        f"facodec_uptime_seconds {h['uptime_s']}",
        "# TYPE facodec_request_latency_seconds summary",
    ]
    with service._stats_lock:
        snap = {op: list(d) for op, d in service._lat.items()}
    for op, xs in sorted(snap.items()):
        for q in (0.5, 0.9, 0.99):
            v = float(np.quantile(np.asarray(xs), q))
            lines.append(
                f'facodec_request_latency_seconds'
                f'{{op="{op}",quantile="{q}"}} {v:.6f}'
            )
        lines.append(
            f'facodec_request_latency_seconds_count{{op="{op}"}} {len(xs)}'
        )
    streaming = getattr(service, "streaming", None)
    if streaming is not None and streaming.group_stats():
        lines += [
            "# TYPE facodec_stream_ticks_total counter",
            "# TYPE facodec_stream_tick_max_stacked gauge",
            "# TYPE facodec_stream_active_slots gauge",
            "# TYPE facodec_stream_group_capacity gauge",
        ]
        for C, g in sorted(streaming.group_stats().items()):
            lab = f'{{chunk_frames="{C}"}}'
            lines += [
                f"facodec_stream_ticks_total{lab} {g['ticks']}",
                f"facodec_stream_tick_max_stacked{lab} {g['max_stacked']}",
                f"facodec_stream_active_slots{lab} {g['active_slots']}",
                f"facodec_stream_group_capacity{lab} {g['capacity']}",
            ]
    return "\n".join(lines) + "\n"


# ---------------------------------------------------------------------- http


def make_handler(service: CodecService):
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, code: int, obj):
            self._send(code, json.dumps(obj).encode(), "application/json")

        def _body(self) -> bytes:
            n = int(self.headers.get("Content-Length", 0))
            if n > MAX_BODY_BYTES:
                raise _TooLarge(
                    f"request body {n} bytes exceeds {MAX_BODY_BYTES}"
                )
            return self.rfile.read(n)

        def do_GET(self):
            path = self.path.split("?")[0]
            if path == "/health":
                return self._json(200, service.health())
            if path == "/metrics":
                return self._send(
                    200, render_metrics(service).encode(),
                    "text/plain; version=0.0.4",
                )
            return self._json(404, {"error": "unknown path"})

        def do_POST(self):
            path, _, query = self.path.partition("?")
            try:
                if path == "/reconstruct":
                    wave = read_wav_bytes(self._body())
                    out = service.reconstruct(wave)
                    return self._send(200, write_wav_bytes(out), "audio/wav")
                if path == "/encode":
                    wave = read_wav_bytes(self._body())
                    blob = service.encode(wave).to_bytes()
                    return self._send(200, blob, "application/octet-stream")
                if path == "/decode":
                    from facodec_tpu.codec_file import FACodecFile

                    f = FACodecFile.from_bytes(self._body())
                    use_r = "residual=0" not in query
                    out = service.decode(f, use_residual=use_r)
                    return self._send(200, write_wav_bytes(out), "audio/wav")
                if path == "/convert":
                    req = json.loads(self._body())
                    src = read_wav_bytes(base64.b64decode(req["source_wav"]))
                    tgt = read_wav_bytes(base64.b64decode(req["target_wav"]))
                    try:
                        out = service.convert(src, tgt)
                    except RuntimeError as e:
                        return self._json(503, {"error": str(e)})
                    return self._send(200, write_wav_bytes(out), "audio/wav")
                return self._json(404, {"error": "unknown path"})
            except _TooLarge as e:
                return self._json(413, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — serving boundary
                return self._json(400, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def make_server(service: CodecService, host: str = "127.0.0.1", port: int = 0):
    """Build (not start) the threading HTTP server; port 0 = ephemeral."""
    from http.server import ThreadingHTTPServer

    return ThreadingHTTPServer((host, port), make_handler(service))


# ----------------------------------------------------------------------- cli


def add_args(p):
    from facodec_tpu.cli._io import DEFAULT_CONFIG, DEFAULT_REDECODER_CONFIG

    p.add_argument("--config-path", default=DEFAULT_CONFIG)
    p.add_argument("--ckpt-path", default=None)
    p.add_argument("--artifact", default=None,
                   help="serve from an AOT export dir (python -m facodec_tpu "
                        "export) — no model source or tracing; requires "
                        "--ckpt-path for the params")
    p.add_argument("--redecoder-config", default=None,
                   help=f"enable /convert (e.g. {DEFAULT_REDECODER_CONFIG})")
    p.add_argument("--redecoder-ckpt", default=None)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--precision", default="hybrid",
                   choices=["float32", "hybrid", "bfloat16", "bfloat16_act"])
    p.add_argument("--bucket-seconds", type=float, default=1.0)
    p.add_argument("--stream-threshold-seconds", type=float, default=32.0)
    p.add_argument("--max-seconds", type=float, default=120.0)
    p.add_argument("--max-batch", type=int, default=8,
                   help="cross-request micro-batch cap (rounded down to a "
                        "power of two; 1 disables batching)")
    p.add_argument("--batch-window-ms", type=float, default=5.0,
                   help="how long a request waits for same-bucket peers")
    p.add_argument("--no-warmup", action="store_true")
    p.add_argument("--shard-inference", action="store_true",
                   help="data-parallel one-shot inference over ALL attached "
                        "devices (params replicated, request batches sharded "
                        "over the mesh's data axis — pod-slice serving); "
                        "streaming sessions stay single-device")
    p.add_argument("--stream-port", type=int, default=None,
                   help="also serve live duplex PCM streaming (real-time "
                        "reconstruction / VC) on this TCP port — see "
                        "cli/stream_serve.py for the framed protocol")
    p.add_argument("--stream-group-capacity", type=int, default=8,
                   help="continuous-batching slots per chunk size: concurrent "
                        "live streams advance in ONE masked device call per "
                        "tick (0 = every stream gets a dedicated batch-1 "
                        "session)")
    p.add_argument("--stream-group-window-ms", type=float, default=5.0,
                   help="how long a tick waits (from its oldest pending "
                        "chunk) for peer streams to stack")
    p.add_argument("--stream-idle-timeout", type=float, default=300.0,
                   help="drop live-stream connections silent this many "
                        "seconds (reclaims the handler thread and any "
                        "continuous-batching slot)")
    return p


def main(args) -> int:
    from facodec_tpu.api import FACodec, FARedecoder

    if args.artifact:
        if not args.ckpt_path:
            print("--artifact requires --ckpt-path (the params)")
            return 2
        from facodec_tpu.api import load_inference_params

        service = ArtifactService(
            args.artifact, load_inference_params(args.ckpt_path),
            batch_window_ms=args.batch_window_ms,
        )
        if not args.no_warmup:
            print(f"warmup: compiling the artifact program...")
            print(f"warmup done in {service.warmup():.1f}s")
        server = make_server(service, args.host, args.port)
        print(f"facodec_tpu serving artifact on "
              f"http://{args.host}:{server.server_address[1]}")
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            server.server_close()
        return 0

    codec = FACodec.from_config(
        args.config_path, args.ckpt_path, precision=args.precision
    )
    redecoder = (
        FARedecoder.from_config(args.redecoder_config, args.redecoder_ckpt)
        if args.redecoder_config else None
    )
    if args.shard_inference:
        import jax

        codec.shard_inference()
        if redecoder is not None:
            redecoder.shard_inference()
        print(f"sharded one-shot inference over {jax.device_count()} devices")
    service = CodecService(
        codec, redecoder,
        bucket_seconds=args.bucket_seconds,
        stream_threshold_seconds=args.stream_threshold_seconds,
        max_seconds=args.max_seconds,
        max_batch=args.max_batch,
        batch_window_ms=args.batch_window_ms,
    )
    if not args.no_warmup:
        print(f"warmup: compiling first bucket ({service.bucket_frames} frames)...")
        print(f"warmup done in {service.warmup():.1f}s")
    server = make_server(service, args.host, args.port)
    stream_server = None
    if args.stream_port is not None:
        from facodec_tpu.cli.stream_serve import StreamingService, make_stream_server

        stream_server = make_stream_server(
            StreamingService(
                service,
                group_capacity=args.stream_group_capacity,
                group_window_ms=args.stream_group_window_ms,
            ),
            args.host, args.stream_port,
            idle_timeout_s=args.stream_idle_timeout,
        )
        service.stream_port = stream_server.server_address[1]
        threading.Thread(
            target=stream_server.serve_forever, daemon=True,
            name="facodec-stream-serve",
        ).start()
        print(f"facodec_tpu live-streaming on tcp://{args.host}:{service.stream_port}")
    print(f"facodec_tpu serving on http://{args.host}:{server.server_address[1]}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
        if stream_server is not None:
            stream_server.server_close()
    return 0
