"""HTTP inference server: the production serving front-end over the codec.

The reference's only serving surface is the gradio demo (webui.py:54-81);
this is the deployable equivalent — a dependency-free HTTP daemon (stdlib
`http.server`) exposing the same operations as bytes-in/bytes-out endpoints:

  GET  /health            liveness + device + compiled-bucket inventory
  POST /reconstruct       WAV body        -> WAV   (codec round trip)
  POST /encode            WAV body        -> .fac  (factorized codes)
  POST /decode            .fac body       -> WAV   (?residual=0 drops r-codes)
  POST /convert           JSON {source_wav, target_wav} (base64 WAV)
                                          -> WAV   (zero-shot VC; 503 until
                                                    a redecoder is configured)

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

Usage:
  python -m facodec_tpu serve --config-path configs/config.yml \
      --ckpt-path ckpt.bin --port 8080 [--redecoder-config ... \
      --redecoder-ckpt ...] [--precision hybrid]
"""

from __future__ import annotations

import base64
import io
import json
import threading
import time
from typing import Optional

import numpy as np

SR = 24000
HOP = 300


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
    ):
        self.codec = codec
        self.redecoder = redecoder
        self.bucket_frames = max(1, int(bucket_seconds * SR) // HOP)
        self.stream_threshold_frames = int(stream_threshold_seconds * SR) // HOP
        self.max_frames = int(max_seconds * SR) // HOP
        self.lock = threading.Lock()
        self.started = time.time()
        self.requests = 0

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

    # -- shape management ----------------------------------------------------

    def _bucketed(self, wave: np.ndarray):
        """(T,) float32 -> (padded (1, Tb) jnp wave, lens (1,), true frames)."""
        import jax.numpy as jnp

        T = min(len(wave), self.max_frames * HOP) // HOP * HOP
        frames = T // HOP
        if frames == 0:
            raise ValueError(f"input shorter than one hop ({HOP} samples)")
        bf = self.bucket_frames
        frames_b = -(-frames // bf) * bf
        padded = np.zeros((1, frames_b * HOP), np.float32)
        padded[0, :T] = wave[:T]
        return jnp.asarray(padded), jnp.asarray([T], np.int32), frames

    # -- operations ----------------------------------------------------------

    def encode(self, wave: np.ndarray):
        """float wave -> FACodecFile (bucketed or exact-streaming)."""
        from facodec_tpu.codec_file import FACodecFile

        frames = len(wave) // HOP
        if frames > self.stream_threshold_frames:
            with self.lock:
                return self.codec.encode_streaming(wave[: self.max_frames * HOP])
        w, lens, true_frames = self._bucketed(np.asarray(wave, np.float32))
        with self.lock:
            _, codes, timbre = self._enc(self.codec.params, w, lens)
            cp, cc, cr = (np.asarray(c)[..., :true_frames] for c in codes)
        self.requests += 1
        return FACodecFile(
            codes_p=cp.astype(np.uint16), codes_c=cc.astype(np.uint16),
            codes_r=cr.astype(np.uint16), timbre=np.asarray(timbre),
            sample_rate=SR, hop_length=HOP,
            original_length=true_frames * HOP,
        )

    def decode(self, f, use_residual: bool = True) -> np.ndarray:
        frames = f.codes_p.shape[-1]
        with self.lock:
            self.requests += 1
            if frames > self.stream_threshold_frames:
                return self.codec.decode_streaming(f, use_residual=use_residual)
            return self.codec.decode(f, use_residual=use_residual)

    def reconstruct(self, wave: np.ndarray) -> np.ndarray:
        frames = len(wave) // HOP
        if frames > self.stream_threshold_frames:
            return self.decode(self.encode(wave))
        w, lens, true_frames = self._bucketed(np.asarray(wave, np.float32))
        with self.lock:
            outs, _, _ = self._enc(self.codec.params, w, lens)
            out = np.asarray(self._dec(self.codec.params, outs))
        self.requests += 1
        return out[:, : true_frames * HOP]

    def convert(self, source: np.ndarray, target: np.ndarray) -> np.ndarray:
        """Zero-shot VC (reference reconstruct_redecoder.py:110-128). The
        target timbre runs through the bucketed masked encoder; the
        redecoder pass uses the source's true code length (its WN stack is
        non-causal, so code padding would perturb the interior — VC traces
        one program per distinct source length)."""
        if self.redecoder is None:
            raise RuntimeError("no redecoder configured (--redecoder-config)")
        f = self.encode(source)
        tw, tlens, _ = self._bucketed(np.asarray(target, np.float32))
        with self.lock:
            _, _, timbre = self._enc(self.codec.params, tw, tlens)
            return self.redecoder.resynthesize(f, np.asarray(timbre))

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
        }


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
            return self.rfile.read(n)

        def do_GET(self):
            if self.path.split("?")[0] == "/health":
                return self._json(200, service.health())
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
    p.add_argument("--no-warmup", action="store_true")
    return p


def main(args) -> int:
    from facodec_tpu.api import FACodec, FARedecoder

    codec = FACodec.from_config(
        args.config_path, args.ckpt_path, precision=args.precision
    )
    redecoder = (
        FARedecoder.from_config(args.redecoder_config, args.redecoder_ckpt)
        if args.redecoder_config else None
    )
    service = CodecService(
        codec, redecoder,
        bucket_seconds=args.bucket_seconds,
        stream_threshold_seconds=args.stream_threshold_seconds,
        max_seconds=args.max_seconds,
    )
    if not args.no_warmup:
        print(f"warmup: compiling first bucket ({service.bucket_frames} frames)...")
        print(f"warmup done in {service.warmup():.1f}s")
    server = make_server(service, args.host, args.port)
    print(f"facodec_tpu serving on http://{args.host}:{server.server_address[1]}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
    return 0
