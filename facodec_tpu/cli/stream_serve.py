"""Live duplex streaming server: real-time voice conversion over a socket.

The reference advertises "fully causal ... can be used for real-time voice
conversion" (reference README.md:105-107) but ships no live transport — its
only serving surface is the file-based gradio demo (webui.py:54-81). This
module is the missing production piece: a TCP server that runs the EXACT
stateful streaming session (models/streaming.StreamingFACodec) per
connection, so a client can push microphone-sized PCM chunks and receive
reconstructed (or timbre-converted) audio with one-chunk latency.

Protocol (all little-endian, audio = float32 PCM mono at 24 kHz):

  client -> server   one JSON header line terminated by "\n":
                       {"chunk_frames": 4,            # latent frames/chunk
                        "timbre_wav": "<base64 WAV>", # optional VC target
                        "vc_mode": "redecoder"}       # optional: VC through
                                                      # the redecoder path
  server -> client   one JSON status line:
                       {"status": "ok", "chunk_frames": C,
                        "prime_samples": P, "sample_rate": 24000}
                     (or {"status": "error", "error": ...} then close)
  client -> server   frames: <u32 byte length><f32le PCM payload>;
                     a zero-length frame ends the stream
  server -> client   frames of output PCM as chunks are emitted (nothing
                     until the priming buffer fills), then the flush tail,
                     then a zero-length frame

Semantics:

  * With "timbre_wav": zero-shot VC — every chunk is decoded under the
    TARGET utterance's timbre vector (AdaIN injection, reference
    quantize.py:444-449; exactness vs the one-shot timbre-swap is
    tests/test_streaming.py::test_streaming_timbre_swap_vc_exact). The
    target vector is computed once per connection through the service's
    bucketed masked encoder.
  * Without it: the timbre is estimated causally from the stream's own
    priming prefix (the first prime_samples) — a live stream cannot pool
    the full utterance the way the one-shot forward does
    (quantize.py:375-382).
  * "vc_mode": "redecoder" (requires "timbre_wav" and a server started
    with --redecoder-config): VC runs through the REDECODER resynthesis
    path — the reference's actual VC route (reconstruct_redecoder.py:
    94-128) — source codes from the exact streaming encoder, re-chunked
    and fed to a StreamingRedecoder under the target timbre. Output
    equals one-shot `FARedecoder.resynthesize` on the one-shot codes.
  * Client frames may be any size; the server re-chunks internally. For
    input that is an exact multiple of the chunk size, the emitted audio is
    bit-identical to the interactive session loop; otherwise the tail is
    zero-padded to a chunk boundary and the output trimmed to the input's
    frame span — the retained samples are exact because every model in the
    path is causal.
  * Streams shorter than the priming requirement are zero-padded up to it
    (same causal-prefix argument), so arbitrarily short streams still
    produce output.

CONTINUOUS BATCHING: concurrent connections with the same chunk size do
NOT each pay a device call per chunk — they are admitted into slots of a
`models/stream_batch.BatchedStreamGroup`, and a tick dispatcher advances
every slot with a pending chunk in ONE masked batched call (batch 1
underfills the chip ~2.3x vs batch 16 — bench.py batch curve). Streams
beyond the group capacity fall back to a dedicated batch-1 session.
Grouped output matches a dedicated session to float tolerance (XLA may
tile batched reductions differently); solo-path output is bit-identical
to the interactive session loop. Device dispatch serializes on the owning
CodecService's lock, and per-chunk/tick latency lands in the service's
/metrics window under op="stream_chunk".
"""

from __future__ import annotations

import base64
import collections
import json
import socketserver
import struct
import threading
import time
from typing import Dict, Optional, Tuple

import numpy as np

SR = 24000
HOP = 300
MAX_HEADER_BYTES = 32 * 1024 * 1024  # base64 timbre wav rides in the header
MAX_FRAME_BYTES = 16 * 1024 * 1024
MAX_CHUNK_FRAMES = 64


# ---------------------------------------------------------------- framing


def read_exact(rfile, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        part = rfile.read(n - len(buf))
        if not part:
            raise ConnectionError("peer closed mid-frame")
        buf += part
    return buf


def read_frame(rfile) -> Optional[np.ndarray]:
    """One <u32 len><f32le PCM> frame; None = end-of-stream marker."""
    (n,) = struct.unpack("<I", read_exact(rfile, 4))
    if n == 0:
        return None
    if n > MAX_FRAME_BYTES or n % 4:
        raise ValueError(f"bad frame length {n}")
    return np.frombuffer(read_exact(rfile, n), np.float32)


def write_frame(wfile, wave: Optional[np.ndarray]) -> None:
    if wave is None:
        wfile.write(struct.pack("<I", 0))
        return
    payload = np.ascontiguousarray(wave, np.float32).tobytes()
    wfile.write(struct.pack("<I", len(payload)) + payload)


# ---------------------------------------------------------------- service


class _GroupDispatcher:
    """Tick scheduler over a BatchedStreamGroup: connection threads
    `submit(slot, chunk)` and block; a worker collects at most one pending
    chunk per slot (waiting `window_s` from the oldest for peers), advances
    the WHOLE group with one device call, and distributes the outputs.
    join/flush serialize with ticks on the group lock."""

    def __init__(self, svc, group, window_s: float = 0.005):
        self.svc = svc  # CodecService: device lock + /metrics stats
        self.group = group
        self.window_s = window_s
        self._glock = threading.Lock()  # group-state mutations
        self._cv = threading.Condition()
        self._pending: Dict[int, object] = {}  # slot -> deque of items
        self._stop = False
        self.ticks = 0
        self.max_stacked = 0  # most slots advanced by one tick
        threading.Thread(target=self._loop, name="facodec-stream-ticks",
                         daemon=True).start()

    def try_join(self, prime_wave, timbre):
        """(slot, first emission) or None when the group is full."""
        with self._glock:
            if self.group.free_slots() == 0:
                return None
            with self.svc.lock:
                slot, first, _ = self.group.join(prime_wave, timbre)
        return slot, first

    def submit(self, slot: int, chunk: np.ndarray) -> np.ndarray:
        item = {"chunk": chunk, "done": threading.Event(),
                "result": None, "error": None, "ts": time.monotonic()}
        with self._cv:
            if self._stop:
                raise RuntimeError("stream dispatcher closed")
            self._pending.setdefault(slot, collections.deque()).append(item)
            self._cv.notify()
        item["done"].wait()
        if item["error"] is not None:
            raise item["error"]
        return item["result"]

    def finish(self, slot: int) -> np.ndarray:
        """Flush the slot's final frame and free it."""
        with self._glock:
            with self.svc.lock:
                wave = self.group.flush(slot)
            self.group.leave(slot)
        return wave

    def release(self, slot: int) -> None:
        with self._glock:
            self.group.leave(slot)

    def _loop(self):
        while True:
            with self._cv:
                while not self._stop and not any(self._pending.values()):
                    self._cv.wait()
                if self._stop:
                    return
                oldest = min(q[0]["ts"] for q in self._pending.values() if q)
            remaining = self.window_s - (time.monotonic() - oldest)
            if remaining > 0:
                time.sleep(remaining)
            with self._cv:
                batch = {}
                for slot, q in list(self._pending.items()):
                    if q:
                        batch[slot] = q.popleft()
                    if not q:
                        del self._pending[slot]
            if not batch:
                continue
            t0 = time.perf_counter()
            try:
                with self._glock, self.svc.lock:
                    outs = self.group.tick(
                        {s: it["chunk"] for s, it in batch.items()}
                    )
                for slot, it in batch.items():
                    it["result"] = outs[slot]
            except Exception as e:  # noqa: BLE001 — propagate to every waiter
                for it in batch.values():
                    it["error"] = e
            dt = time.perf_counter() - t0
            with self.svc._stats_lock:
                self.svc._lat["stream_chunk"].append(dt)
            self.ticks += 1
            self.max_stacked = max(self.max_stacked, len(batch))
            for it in batch.values():
                it["done"].set()


class _ConnEngine:
    """Per-connection advance engine: buffers the priming span, then runs
    either in a group slot (one shared device call per tick) or, when the
    group is full/disabled, a dedicated batch-1 session."""

    def __init__(self, streaming: "StreamingService", chunk_frames: int):
        self.streaming = streaming
        self.sess = streaming.session(chunk_frames)
        self._buffered = []
        self.mode = None  # None (priming) | "group" | "solo"
        self._slot = None
        self._est = None
        self._dst = None

    @property
    def primed(self) -> bool:
        return self.mode is not None

    def feed(self, chunk: np.ndarray, timbre) -> Optional[np.ndarray]:
        """chunk: exactly chunk_frames*HOP samples. Returns an emitted wave
        row ((T,) np) or None while priming. `timbre` must be set by the
        time the priming span completes."""
        import jax.numpy as jnp

        sess, svc = self.sess, self.streaming.service
        if self.mode is None:
            self._buffered.append(chunk)
            if sum(len(c) for c in self._buffered) < sess.prime_frames * HOP:
                return None
            prime = jnp.asarray(np.concatenate(self._buffered))[None, :]
            self._buffered = []
            disp = self.streaming.dispatcher(sess.chunk_frames)
            if disp is not None:
                joined = disp.try_join(prime, timbre)
                if joined is not None:
                    self._slot, first = joined
                    self.mode = "group"
                    return np.asarray(first)[0]
            # group full or disabled: dedicated session
            self.mode = "solo"
            self._est = sess.init_encode_state(1)
            self._dst = sess.init_decode_state(1)
            t0 = time.perf_counter()
            with svc.lock:
                # fused single-dispatch roundtrip: per-chunk latency is
                # dispatch-bound, not device-bound (models/streaming.py)
                self._est, self._dst, wave, _ = sess.roundtrip_chunk(
                    self._est, self._dst, prime, timbre
                )
            self.streaming._record_chunk(time.perf_counter() - t0)
            return np.asarray(wave)[0]
        if self.mode == "group":
            return self.streaming.dispatcher(sess.chunk_frames).submit(
                self._slot, chunk
            )
        t0 = time.perf_counter()
        with svc.lock:
            self._est, self._dst, wave, _ = sess.roundtrip_chunk(
                self._est, self._dst, jnp.asarray(chunk)[None, :], timbre
            )
        self.streaming._record_chunk(time.perf_counter() - t0)
        return np.asarray(wave)[0]

    def finish(self, timbre) -> Optional[np.ndarray]:
        """The final right-reflect frame ((HOP,) np), or None if unprimed.
        Frees any group slot."""
        if self.mode == "group":
            wave = self.streaming.dispatcher(
                self.sess.chunk_frames
            ).finish(self._slot)
            self._slot = None
            self.mode = "done"
            return wave
        if self.mode == "solo":
            svc = self.streaming.service
            with svc.lock:
                outs_t, _ = self.sess.flush_encode(self._est, timbre)
                self._dst, wave_t = self.sess.decode_chunk(self._dst, outs_t)
            self.mode = "done"
            return np.asarray(wave_t)[0]
        return None

    def close(self) -> None:
        """Idempotent slot release (normal end after finish = no-op; peer
        vanished mid-stream = frees the group slot without flushing)."""
        if self.mode == "group" and self._slot is not None:
            self.streaming.dispatcher(self.sess.chunk_frames).release(
                self._slot
            )
            self._slot = None
        self.mode = "done"

    def needs_tail(self, emitted: int, target: int) -> bool:
        """Zero-chunk feeding continues until only the flush frame remains
        (codec emissions are frame-synchronous with input)."""
        return emitted + HOP < target


class _RedecoderVCEngine:
    """Live VC through the REDECODER path — the reference's actual VC
    resynthesis route (reference reconstruct_redecoder.py:94-128): source
    chunks -> streaming codec encoder (codes bit-exact vs one-shot) ->
    host-side code FIFO re-chunked to exact chunk_frames slices ->
    StreamingRedecoder (WN carries + decoder state) under the TARGET
    timbre. Both stages are individually exact vs their one-shot forms, so
    the retained output samples equal `FARedecoder.resynthesize` on the
    one-shot codes. Runs solo batch-1 (redecoder streams do not join the
    codec BatchedStreamGroup)."""

    def __init__(self, streaming: "StreamingService", chunk_frames: int,
                 use_p_code: bool = False):
        self.streaming = streaming
        self.sess = streaming.session(chunk_frames)  # encode side
        self.red = streaming.redecoder_session(chunk_frames, use_p_code)
        self._est = self.sess.init_encode_state(1)
        self._rst = self.red.init_state(1)
        self._cp: Optional[np.ndarray] = None  # pending (1, n_p, t) codes
        self._cc: Optional[np.ndarray] = None  # pending (1, n_cc, t) codes

    @property
    def primed(self) -> bool:
        return self._est.primed

    def needs_tail(self, emitted: int, target: int) -> bool:
        return False  # finish() drains everything still pending

    def _push(self, codes) -> None:
        cp = np.asarray(codes[0], np.int32)
        cc = np.asarray(codes[1], np.int32)
        self._cp = cp if self._cp is None else np.concatenate(
            [self._cp, cp], axis=-1)
        self._cc = cc if self._cc is None else np.concatenate(
            [self._cc, cc], axis=-1)

    def _vc_slice(self, cp, cc, timbre):
        import jax.numpy as jnp

        svc = self.streaming.service
        t0 = time.perf_counter()
        with svc.lock:
            self._rst, wave = self.red.vc_chunk(
                self._rst, jnp.asarray(cp), jnp.asarray(cc), timbre
            )
        if wave is not None:
            self.streaming._record_chunk(time.perf_counter() - t0)
        return wave

    def _drain(self, timbre) -> list:
        """Feed every whole chunk_frames code slice; list of emitted waves."""
        C = self.sess.chunk_frames
        parts = []
        while self._cp is not None and self._cp.shape[-1] >= C:
            cp, self._cp = self._cp[..., :C], self._cp[..., C:]
            cc, self._cc = self._cc[..., :C], self._cc[..., C:]
            wave = self._vc_slice(cp, cc, timbre)
            if wave is not None:
                parts.append(np.asarray(wave)[0])
        return parts

    def feed(self, chunk: np.ndarray, timbre) -> Optional[np.ndarray]:
        import jax.numpy as jnp

        svc = self.streaming.service
        t0 = time.perf_counter()
        with svc.lock:
            self._est, _, codes = self.sess.encode_chunk(
                self._est, jnp.asarray(chunk)[None, :], timbre
            )
        if codes is None:
            return None
        self.streaming._record_chunk(time.perf_counter() - t0)
        self._push(codes)
        parts = self._drain(timbre)
        return np.concatenate(parts) if parts else None

    def finish(self, timbre) -> Optional[np.ndarray]:
        """Flush the encoder's final frame, then pad the pending code FIFO
        to a chunk boundary (zero codes — causal, so padded frames cannot
        perturb retained samples; the caller trims) and keep feeding zero
        chunks until the redecoder session has primed and drained."""
        svc = self.streaming.service
        with svc.lock:
            _, codes_t = self.sess.flush_encode(self._est, timbre)
        self._push(codes_t)
        C = self.sess.chunk_frames
        n_pend = self._cp.shape[-1]
        pad = -n_pend % C
        if pad:
            self._cp = np.concatenate(
                [self._cp, np.zeros(self._cp.shape[:-1] + (pad,), np.int32)],
                axis=-1)
            self._cc = np.concatenate(
                [self._cc, np.zeros(self._cc.shape[:-1] + (pad,), np.int32)],
                axis=-1)
        parts = self._drain(timbre)
        guard = self.red.prime_frames // C + 2
        while not self._rst.primed and guard:  # ultra-short stream: prime
            guard -= 1
            wave = self._vc_slice(
                np.zeros((1, self._cp.shape[1], C), np.int32),
                np.zeros((1, self._cc.shape[1], C), np.int32), timbre)
            if wave is not None:
                parts.append(np.asarray(wave)[0])
        return np.concatenate(parts) if parts else None

    def close(self) -> None:
        pass  # solo sessions hold no shared slots


class StreamingService:
    """Session factory + timbre plumbing over a CodecService.

    Owns the cached StreamingFACodec step programs and (when group_capacity
    >= 1) one BatchedStreamGroup per chunk size, so CONCURRENT live streams
    advance with one shared device call per tick (batch 1 underfills the
    chip ~2.3x vs batch 16 — bench.py batch curve); reuses the
    CodecService's codec, device lock, micro-batched masked encoder (for
    timbre vectors), and /metrics stats surface."""

    def __init__(self, service, group_capacity: int = 8,
                 group_window_ms: float = 5.0):
        self.service = service
        self.group_capacity = group_capacity
        self.group_window_s = group_window_ms / 1e3
        self._sessions: Dict[int, object] = {}
        self._dispatchers: Dict[int, Optional[_GroupDispatcher]] = {}
        self._cache_lock = threading.Lock()
        service.streaming = self  # /metrics picks up group gauges

    def group_stats(self) -> Dict[int, dict]:
        """Per-chunk-size continuous-batching stats for /metrics."""
        with self._cache_lock:
            disps = dict(self._dispatchers)
        return {
            C: {
                "ticks": d.ticks,
                "max_stacked": d.max_stacked,
                "active_slots": d.group.capacity - d.group.free_slots(),
                "capacity": d.group.capacity,
            }
            for C, d in disps.items() if d is not None
        }

    def dispatcher(self, chunk_frames: int) -> Optional[_GroupDispatcher]:
        """The shared tick dispatcher for this chunk size (None when
        grouping is disabled)."""
        if self.group_capacity < 1:
            return None
        with self._cache_lock:
            disp = self._dispatchers.get(chunk_frames)
        if disp is None:
            from facodec_tpu.models.stream_batch import BatchedStreamGroup

            sess = self.session(chunk_frames)
            with self._cache_lock:
                disp = self._dispatchers.get(chunk_frames)
                if disp is None:
                    disp = _GroupDispatcher(
                        self.service,
                        BatchedStreamGroup(sess, self.group_capacity),
                        window_s=self.group_window_s,
                    )
                    self._dispatchers[chunk_frames] = disp
        return disp

    def session(self, chunk_frames: int):
        from facodec_tpu.models.streaming import StreamingFACodec

        with self._cache_lock:
            sess = self._sessions.get(chunk_frames)
            if sess is None:
                codec = self.service.codec
                sess = StreamingFACodec(
                    codec.models["encoder"],
                    codec.models["quantizer"],
                    codec.models["decoder"],
                    codec.params,
                    chunk_frames=chunk_frames,
                    n_c=codec.n_c,
                )
                self._sessions[chunk_frames] = sess
            return sess

    def redecoder_session(self, chunk_frames: int, use_p_code: bool = False):
        """Cached StreamingRedecoder over the service's FARedecoder (live
        VC through the reference's actual resynthesis route). Raises when
        no redecoder is configured or its config is non-causal."""
        from facodec_tpu.models.streaming import StreamingRedecoder

        red = self.service.redecoder
        if red is None:
            raise ValueError(
                "redecoder VC requires --redecoder-config on the server")
        key = ("redecoder", chunk_frames, use_p_code)
        with self._cache_lock:
            sess = self._sessions.get(key)
            if sess is None:
                sess = StreamingRedecoder(
                    red.models["encoder"], red.models["decoder"], red.params,
                    chunk_frames=chunk_frames, use_p_code=use_p_code,
                    n_c=1,  # mirrors the one-shot /convert endpoint default
                )
                self._sessions[key] = sess
            return sess

    def timbre_from_wave(self, wave: np.ndarray) -> np.ndarray:
        """(1, d) timbre vector via the service's bucketed masked encoder
        (exact under bucket padding; micro-batches with regular traffic)."""
        return self.service.encode(wave).timbre

    def _record_chunk(self, dt: float) -> None:
        svc = self.service
        with svc._stats_lock:
            svc._lat["stream_chunk"].append(dt)

    # ------------------------------------------------------------ session run
    def run_connection(self, rfile, wfile) -> None:
        """Drive one full protocol exchange on an open socket pair."""
        import jax.numpy as jnp

        try:
            header = json.loads(rfile.readline(MAX_HEADER_BYTES))
            C = int(header.get("chunk_frames", 4))
            if not 1 <= C <= MAX_CHUNK_FRAMES:
                raise ValueError(f"chunk_frames must be in [1, {MAX_CHUNK_FRAMES}]")
            vc_mode = header.get("vc_mode")
            if vc_mode not in (None, "timbre_swap", "redecoder"):
                raise ValueError(f"unknown vc_mode {vc_mode!r}")
            timbre = None
            if header.get("timbre_wav"):
                from facodec_tpu.cli.serve import read_wav_bytes

                ref = read_wav_bytes(base64.b64decode(header["timbre_wav"]))
                timbre = jnp.asarray(self.timbre_from_wave(ref))
            sess = self.session(C)
            if vc_mode == "redecoder":
                if timbre is None:
                    raise ValueError("vc_mode=redecoder requires timbre_wav")
                engine = _RedecoderVCEngine(
                    self, C, use_p_code=bool(header.get("use_p_code", False))
                )
            else:
                engine = _ConnEngine(self, C)
        except Exception as e:  # noqa: BLE001 — protocol boundary
            wfile.write(json.dumps(
                {"status": "error", "error": f"{type(e).__name__}: {e}"}
            ).encode() + b"\n")
            return
        status = {
            "status": "ok",
            "chunk_frames": C,
            "prime_samples": sess.prime_frames * HOP,
            "sample_rate": SR,
            "vc": timbre is not None,
        }
        if vc_mode == "redecoder":
            status["vc_mode"] = "redecoder"
            status["redecoder_prime_frames"] = engine.red.prime_frames
        wfile.write(json.dumps(status).encode() + b"\n")
        wfile.flush()

        step = C * HOP
        max_samples = self.service.max_frames * HOP
        buf = np.zeros(0, np.float32)
        prefix_fed = []  # chunks fed pre-timbre (self-timbre mode)
        accepted = 0  # samples accepted into the stream (capped)

        def target_out() -> int:
            return accepted // HOP * HOP

        emitted = 0  # samples written back

        def emit(wave) -> None:
            nonlocal emitted
            if wave is None:
                return
            chunk = np.asarray(wave).reshape(-1)
            take = min(len(chunk), target_out() - emitted)
            if take > 0:
                write_frame(wfile, chunk[:take])
                wfile.flush()
                emitted += take

        def process(chunk_np: np.ndarray) -> None:
            nonlocal timbre
            if timbre is None:
                # causal self-timbre: estimate from the stream prefix the
                # moment the priming buffer completes (one-shot pooling over
                # the whole utterance, quantize.py:375-382, is impossible
                # live)
                prefix_fed.append(chunk_np)
                if sum(len(p) for p in prefix_fed) >= sess.prime_frames * HOP:
                    timbre = jnp.asarray(
                        self.timbre_from_wave(np.concatenate(prefix_fed))
                    )
                    prefix_fed.clear()
            emit(engine.feed(chunk_np, timbre))

        try:
            # live phase: re-chunk client frames into exact steps
            while True:
                frame = read_frame(rfile)
                if frame is None:
                    break
                room = max(0, max_samples - accepted)
                if room:
                    buf = np.concatenate([buf, frame[:room]])
                    accepted += min(len(frame), room)
                while len(buf) >= step:
                    process(buf[:step])
                    buf = buf[step:]

            # tail phase: zero-pad any partial chunk (and, for streams
            # shorter than the priming requirement, whole zero chunks) until
            # every retained frame has been emitted — causality keeps the
            # retained samples exact; only the final frame's mel window sees
            # the pad
            guard = sess.prime_frames // C + 2
            while emitted < target_out() and (
                len(buf) > 0 or not engine.primed
                or engine.needs_tail(emitted, target_out())
            ):
                if guard == 0:
                    break
                guard -= 1
                pad = np.zeros(step - len(buf), np.float32)
                process(np.concatenate([buf, pad]))
                buf = buf[:0]

            # flush: the one-shot-exact final right-reflect frame — reached
            # exactly when the input was a whole number of chunks
            if engine.primed and emitted < target_out():
                emit(engine.finish(timbre))
            write_frame(wfile, None)
            wfile.flush()
            self.service._count_request()  # one request per stream session
        finally:
            engine.close()  # idempotent; frees the group slot on any exit


def make_stream_server(streaming: StreamingService, host: str = "127.0.0.1",
                       port: int = 0, idle_timeout_s: float = 300.0):
    """Build (not start) the threaded TCP server; port 0 = ephemeral.
    A connection silent for idle_timeout_s is dropped (its handler thread
    and any continuous-batching slot are reclaimed — engine.close() runs
    on every exit path)."""

    class Handler(socketserver.StreamRequestHandler):
        timeout = idle_timeout_s  # socketserver applies it to the socket

        def handle(self):
            try:
                streaming.run_connection(self.rfile, self.wfile)
            except (ConnectionError, BrokenPipeError, ValueError, OSError):
                pass  # peer vanished/stalled mid-stream; state dies with us

    class Server(socketserver.ThreadingTCPServer):
        daemon_threads = True
        allow_reuse_address = True

    return Server((host, port), Handler)


# ----------------------------------------------------------------- client


def stream_wav(host: str, port: int, wave: np.ndarray,
               chunk_frames: int = 4, send_samples: Optional[int] = None,
               timbre_wav_bytes: Optional[bytes] = None,
               vc_mode: Optional[str] = None,
               ) -> Tuple[np.ndarray, dict]:
    """Reference client: stream `wave` to a live server in `send_samples`-
    sized frames (default one chunk), collect the full output. Returns
    (output wave, server status header). vc_mode="redecoder" routes through
    the redecoder resynthesis path (requires timbre_wav_bytes)."""
    import socket

    header: dict = {"chunk_frames": chunk_frames}
    if timbre_wav_bytes is not None:
        header["timbre_wav"] = base64.b64encode(timbre_wav_bytes).decode()
    if vc_mode is not None:
        header["vc_mode"] = vc_mode
    step = send_samples or chunk_frames * HOP
    wave = np.asarray(wave, np.float32).reshape(-1)

    with socket.create_connection((host, port)) as sock:
        rfile = sock.makefile("rb")
        wfile = sock.makefile("wb")
        wfile.write(json.dumps(header).encode() + b"\n")
        wfile.flush()
        status = json.loads(rfile.readline(MAX_HEADER_BYTES))
        if status.get("status") != "ok":
            raise RuntimeError(f"server rejected stream: {status}")

        out_parts = []
        recv_done = threading.Event()

        def reader():
            # drain concurrently so neither side blocks on full TCP buffers
            try:
                while True:
                    frame = read_frame(rfile)
                    if frame is None:
                        break
                    out_parts.append(frame)
            finally:
                recv_done.set()

        t = threading.Thread(target=reader, daemon=True)
        t.start()
        for i in range(0, len(wave), step):
            write_frame(wfile, wave[i : i + step])
        write_frame(wfile, None)
        wfile.flush()
        recv_done.wait()
        t.join()
    out = np.concatenate(out_parts) if out_parts else np.zeros(0, np.float32)
    return out, status
