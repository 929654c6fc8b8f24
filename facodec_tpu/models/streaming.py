"""Chunked real-time streaming codec session.

Exact stateful streaming for the full FAcodec pipeline — wave chunks in,
factorized codes + resynthesized wave chunks out, IDENTICAL to the one-shot
forward (the flush supplies the end-reflect frames). The reference only
ships a windowed-recompute template (dac/model/base.py:125-233) and never
streams the FAcodec quantizer; this is a first-class capability here
(SURVEY.md §7 'Streaming' design decision).

Mechanics:
  * Encoder/decoder: conv left-context carries + transpose-conv overlap-add
    tails + LSTM (h, c) (models/dac.py).
  * Prosody mel branch: torchaudio's mel (n_fft 2048, win 1200, hop 300,
    center=True) has an effective +-600-sample support per frame (the hann
    window is zero-padded 424 each side, and |STFT| is shift-invariant), so
    the stream needs only a 900-sample wave tail and ONE frame of algorithmic
    latency — not the naive n_fft/2=1024 two-sided context.
  * Prosody WN: conv carries (models/wavenet.py); RVQs are frame-wise.
  * Timbre: a fixed per-stream vector (from a reference utterance — the
    zero-shot VC scenario — or a first-pass estimate).

Chunk size vs exactness (priming): the FIRST forward step must reproduce
the one-shot forward's left reflect-pads, which span up to 10 latent frames
at the flagship strides. Rather than forcing chunk_frames >= 11, the session
PRIMES: incoming chunks accumulate in a host-side buffer until
`prime_frames` (the smallest chunk multiple covering every reflect span) are
available, then the first compiled step runs once over the whole buffer.
Steady-state chunks can therefore be as small as ONE frame (12.5 ms);
chunk_frames=4 gives a 50 ms buffering latency. Priming only delays the
first emission (~137 ms at flagship) — exactly the signal-dependent warmup
any reflect-padded causal model needs.

Latency (steady state): chunk + 1 frame (12.5 ms) + device time. Chunk
length is static -> one compiled step reused for the whole stream.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from facodec_tpu.models.dac import (
    decoder_stream_state,
    encoder_stream_state,
    min_first_chunk_frames,
)
from facodec_tpu.models.wavenet import wn_stream_state
from facodec_tpu.ops.spectral import hann_window, mel_filterbank

HOP = 300
WIN = 1200
NFFT = 2048
CTX = WIN // 2  # 600: one-sided effective mel support
TAIL = WIN - HOP  # 900: carried wave samples


def min_prime_frames_encoder(strides: Tuple[int, ...]) -> int:
    """Smallest first-step length (latent frames) for exact encoder-side
    streaming: every reflect-pad (conv left pad at its stage's rate, mel
    front context) must be coverable by the first chunk itself.

    The conv-span arithmetic is shared with `models.dac.min_first_chunk_frames`
    (single source of truth); the quantizer's mel front adds its own CTX+1
    wave samples of reflect context on top."""
    hop = 1
    for st in strides:
        hop *= st
    return max(min_first_chunk_frames(strides), math.ceil((CTX + 1) / hop))


def min_first_frames_decoder(rates: Tuple[int, ...]) -> int:
    """Smallest first decoder input (latent frames) covering its reflect
    spans: model_0 k=7 at frame rate, dilation-9 resunits after each
    upsample stage."""
    worst = 7  # model_0 k=7 at frame rate
    rate = 1
    for r in rates:
        rate *= r
        worst = max(worst, math.ceil(55 / rate))
    return worst


def prime_frames_for(strides: Tuple[int, ...], rates: Tuple[int, ...],
                     chunk_frames: int) -> int:
    """Latent frames a `StreamingFACodec` session buffers before its first
    emission: the smallest chunk multiple covering every reflect span
    (encoder convs + mel front context, decoder's deepest span + 1, the
    prosody WN's k=5 span). Shared with `models.latency.codec_latency`."""
    need = max(
        min_prime_frames_encoder(strides),
        min_first_frames_decoder(rates) + 1,
        5 + 1,
    )
    return math.ceil(need / chunk_frames) * chunk_frames


def _mel_frames(wave_ctx: jnp.ndarray, n_frames: int, sample_rate: int,
                n_mels: int = 80) -> jnp.ndarray:
    """(B, n_frames*HOP + WIN - HOP) exact context -> (B, n_frames, n_mels)
    normalized log-mel; frame i window = ctx[i*HOP : i*HOP + WIN].
    Magnitude-identical to the centered torchaudio STFT (phase-only shift)."""
    win = hann_window(WIN, wave_ctx.dtype)
    idx = np.arange(n_frames)[:, None] * HOP + np.arange(WIN)[None, :]
    frames = wave_ctx[:, idx] * win[None, None, :]
    spec = jnp.square(jnp.abs(jnp.fft.rfft(frames, n=NFFT, axis=-1)))
    fb = mel_filterbank(NFFT // 2 + 1, n_mels, sample_rate).astype(spec.dtype)
    mel = spec @ fb
    return (jnp.log(1e-5 + mel) + 4.0) / 4.0


def _reflect_front(chunk: jnp.ndarray, pad: int) -> jnp.ndarray:
    """torch-style left reflect: out[j] = chunk[pad - j] for j in [0, pad)."""
    return chunk[:, pad:0:-1]


def _reflect_back(tail: jnp.ndarray, pad: int) -> jnp.ndarray:
    """torch-style right reflect of the stream end."""
    return tail[:, -2 : -2 - pad : -1]


@dataclass(frozen=True)
class EncodeState:
    """Session encode state: jitted core pytree + host-side priming buffer."""

    core: Tuple  # (enc_s, wn_s, tail, lat_buf)
    pending: Tuple[jnp.ndarray, ...] = ()
    n_pending: int = 0
    primed: bool = False


@dataclass
class StreamingFACodec:
    """Host-side streaming session over jitted chunk steps.

    encoder/quantizer/decoder are the flax modules (causal flagship config);
    params the matching pytrees. chunk_frames is the static steady-state
    chunk size in latent frames (300 samples / 12.5 ms each) — any size >= 1;
    small chunks are primed (see module docstring)."""

    encoder: Any
    quantizer: Any
    decoder: Any
    params: Dict[str, Any]
    chunk_frames: int = 16
    n_c: int = 1

    def __post_init__(self):
        C = self.chunk_frames
        assert C >= 1
        # first emission is prime_frames-1 frames; it must cover the
        # decoder's deepest reflect span AND the prosody WN's k=5 span
        self.prime_frames = prime_frames_for(
            self.encoder.strides, self.decoder.rates, C
        )
        enc, qt, dec = self.encoder, self.quantizer, self.decoder

        def encode_step(params, wave_chunk, timbre, state, first: bool):
            enc_s, wn_s, tail, lat_buf = state
            latent, enc_s = enc.apply(
                {"params": params["encoder"]}, wave_chunk[:, :, None], enc_s,
                first=first,
            )
            n_in = wave_chunk.shape[1] // HOP
            if first:
                ctx = jnp.concatenate([_reflect_front(wave_chunk, CTX), wave_chunk], 1)
                n_out = n_in - 1
                lat = latent[:, :n_out]
                lat_buf = latent[:, n_out:]
            else:
                ctx = jnp.concatenate([tail, wave_chunk], axis=1)
                n_out = n_in
                lat_cat = jnp.concatenate([lat_buf, latent], axis=1)
                lat = lat_cat[:, :n_out]
                lat_buf = lat_cat[:, n_out:]
            mel = _mel_frames(ctx, n_out, qt.sample_rate)[:, :, :20]
            outs, codes, wn_s = qt.apply(
                {"params": params["quantizer"]}, lat, mel, timbre, wn_s,
                n_c=self.n_c, first=first, method=qt.encode_streaming,
            )
            new_tail = ctx[:, -TAIL:]
            return outs, codes, (enc_s, wn_s, new_tail, lat_buf)

        def flush_step(params, timbre, state):
            enc_s, wn_s, tail, lat_buf = state
            ctx = jnp.concatenate([tail, _reflect_back(tail, HOP)], axis=1)
            mel = _mel_frames(ctx, 1, qt.sample_rate)[:, :, :20]
            outs, codes, wn_s = qt.apply(
                {"params": params["quantizer"]}, lat_buf, mel, timbre, wn_s,
                n_c=self.n_c, first=False, method=qt.encode_streaming,
            )
            return outs, codes

        def decode_step(params, outs, state, first: bool):
            wave, state = dec.apply(
                {"params": params["decoder"]}, outs, state, first=first
            )
            return wave[:, :, 0], state

        def roundtrip_step(params, wave_chunk, timbre, est, dst, first: bool):
            outs, codes, est = encode_step(params, wave_chunk, timbre, est, first)
            wave, dst = decode_step(params, outs, dst, first)
            return wave, codes, est, dst

        # Steady-state steps DONATE their stream-state argument: the session
        # API threads state linearly (each call consumes the previous call's
        # state), so the input buffers are dead after the call and XLA may
        # alias the updated carries (conv left-context, LSTM (h,c), wave
        # tail, latent ring buffer) in place instead of materializing copies
        # — these copy/slice ops were ~25% of the in-chunk device time in
        # the round-4 trace. First-call variants keep their state alive
        # (init states may be shared across sessions, e.g. A/B tests).
        # Backends without donation support (CPU) ignore it with a warning.
        self._encode_first = jax.jit(lambda p, w, t, s: encode_step(p, w, t, s, True))
        self._encode = jax.jit(lambda p, w, t, s: encode_step(p, w, t, s, False),
                               donate_argnums=(3,))
        self._flush = jax.jit(flush_step)
        self._decode_first = jax.jit(lambda p, o, s: decode_step(p, o, s, True))
        self._decode = jax.jit(lambda p, o, s: decode_step(p, o, s, False),
                               donate_argnums=(2,))
        # fused encode+decode: ONE device call per chunk. Per-call dispatch
        # dominates the steady-state chunk budget on remote/tunneled devices
        # (round-4 trace: 1.08 ms of device ops vs 3.89 ms measured with two
        # calls), and even attached TPUs save a launch + host sync point.
        self._roundtrip_first = jax.jit(
            lambda p, w, t, e, d: roundtrip_step(p, w, t, e, d, True))
        self._roundtrip = jax.jit(
            lambda p, w, t, e, d: roundtrip_step(p, w, t, e, d, False),
            donate_argnums=(3, 4))
        # unjitted steady-state closures for lax.scan composition (run_scan)
        self._encode_steady_raw = lambda p, w, t, s: encode_step(p, w, t, s, False)
        self._decode_steady_raw = lambda p, o, s: decode_step(p, o, s, False)
        self._flush_raw = flush_step

    # ------------------------------------------------------------- encode
    def init_encode_state(self, batch: int) -> EncodeState:
        enc_s = encoder_stream_state(self.encoder, batch)
        wn_s = wn_stream_state(_quantizer_wn(self.quantizer), batch)
        tail = jnp.zeros((batch, TAIL))
        lat_buf = jnp.zeros((batch, 1, self.quantizer.in_dim))
        return EncodeState(core=(enc_s, wn_s, tail, lat_buf))

    def encode_chunk(self, state: EncodeState, wave_chunk: jnp.ndarray,
                     timbre: jnp.ndarray):
        """wave_chunk (B, chunk_frames*300). Returns (state, outs, codes).
        While priming (accumulated input < prime_frames) outs/codes are None;
        the priming step emits prime_frames-1 frames, later calls
        chunk_frames. Total latency to first emission ~= prime duration."""
        if not state.primed:
            pending = state.pending + (wave_chunk,)
            n = state.n_pending + wave_chunk.shape[1] // HOP
            if n < self.prime_frames:
                return replace(state, pending=pending, n_pending=n), None, None
            wave0 = pending[0] if len(pending) == 1 else jnp.concatenate(pending, 1)
            outs, codes, core = self._encode_first(self.params, wave0, timbre,
                                                   state.core)
            return EncodeState(core=core, primed=True), outs, codes
        outs, codes, core = self._encode(self.params, wave_chunk, timbre, state.core)
        return EncodeState(core=core, primed=True), outs, codes

    def flush_encode(self, state: EncodeState, timbre: jnp.ndarray):
        """Emit the final (end-reflect) frame."""
        if not state.primed:
            raise ValueError(
                f"stream shorter than prime_frames={self.prime_frames} frames "
                f"({self.prime_frames * HOP} samples); use the one-shot forward"
            )
        return self._flush(self.params, timbre, state.core)

    # ------------------------------------------------------------- decode
    def init_decode_state(self, batch: int) -> Tuple:
        return (decoder_stream_state(self.decoder, batch), True)

    def decode_chunk(self, state, outs: Optional[jnp.ndarray]):
        """outs=None (encoder still priming) is a no-op."""
        if outs is None:
            return state, None
        core, first = state
        fn = self._decode_first if first else self._decode
        wave, core = fn(self.params, outs, core)
        return (core, False), wave

    # -------------------------------------------------------- fused chunk
    def roundtrip_chunk(self, est: EncodeState, dst, wave_chunk: jnp.ndarray,
                        timbre: jnp.ndarray):
        """Encode + decode one chunk in a SINGLE jitted device call — the
        low-latency path for live reconstruction (codes and wave from the
        same stream). Same priming semantics as encode_chunk; returns
        (est, dst, wave_or_None, codes_or_None). Composition is identical to
        encode_chunk + decode_chunk (shared step functions), fused into one
        XLA module so each steady-state chunk costs one dispatch."""
        if not est.primed:
            pending = est.pending + (wave_chunk,)
            n = est.n_pending + wave_chunk.shape[1] // HOP
            if n < self.prime_frames:
                return replace(est, pending=pending, n_pending=n), dst, None, None
            wave0 = pending[0] if len(pending) == 1 else jnp.concatenate(pending, 1)
            dcore, _ = dst
            wave, codes, ecore, dcore = self._roundtrip_first(
                self.params, wave0, timbre, est.core, dcore)
            return EncodeState(core=ecore, primed=True), (dcore, False), wave, codes
        dcore, first = dst
        assert not first, (
            "encoder primed but decoder not: prime both through "
            "roundtrip_chunk (or decode the priming outs first)"
        )
        wave, codes, ecore, dcore = self._roundtrip(
            self.params, wave_chunk, timbre, est.core, dcore)
        return EncodeState(core=ecore, primed=True), (dcore, False), wave, codes

    # ---------------------------------------------------------- scan mode
    def run_scan(self, wave: jnp.ndarray, timbre: jnp.ndarray,
                 flush: bool = True):
        """Process a whole (B, n_chunks*chunk_frames*300) wave through the
        chunked encode+decode pipeline as ONE `lax.scan` — a single device
        launch for the entire stream (no per-chunk host round trips), with
        identical per-chunk semantics to the interactive session.

        Note: at flagship size the fused program is large; remote-compile
        tunnels with request-size limits may reject it (HTTP 413) — use the
        interactive chunk API there (its steps chain by state, so executions
        pipeline on-device without host sync anyway).

        With flush=True (default) the end-reflect frame is emitted too, so
        recon has the input's full length and output == the one-shot forward.
        Returns (recon_wave (B, T), codes [p, c, r] each (B, n_cb, T//300))."""
        B, T = wave.shape
        C = self.chunk_frames
        step = C * HOP
        assert T % step == 0, "wave length must be a chunk multiple"
        n_chunks = T // step
        prime_chunks = self.prime_frames // C
        assert n_chunks >= prime_chunks, (
            f"need >= {prime_chunks} chunks ({self.prime_frames} frames) to prime"
        )
        chunks = wave.reshape(B, n_chunks, step).transpose(1, 0, 2)

        est = self.init_encode_state(B).core
        dst = self.init_decode_state(B)[0]

        # priming chunks (first=True static branch) outside the scan
        wave0 = chunks[:prime_chunks].transpose(1, 0, 2).reshape(B, -1)
        outs0, codes0, est = self._encode_first(self.params, wave0, timbre, est)
        wave_out0, dst = self._decode_first(self.params, outs0, dst)

        p = self.params

        def body(carry, chunk):
            est, dst = carry
            outs, codes, est = self._encode_steady_raw(p, chunk, timbre, est)
            w, dst = self._decode_steady_raw(p, outs, dst)
            return (est, dst), (w, codes)

        parts, code_parts = [wave_out0], [codes0]
        if n_chunks > prime_chunks:
            (est, dst), (waves, codes) = jax.lax.scan(
                body, (est, dst), chunks[prime_chunks:]
            )
            # (n, B, step) -> (B, n*step); codes (n, B, cb, C) -> (B, cb, n*C)
            parts.append(waves.transpose(1, 0, 2).reshape(B, -1))
            code_parts.append([
                c.transpose(1, 2, 0, 3).reshape(B, c.shape[2], -1) for c in codes
            ])
        if flush:
            outs_t, codes_t = self._flush_raw(p, timbre, est)
            w_t, dst = self._decode_steady_raw(p, outs_t, dst)
            parts.append(w_t)
            code_parts.append(codes_t)
        recon = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
        codes = [
            jnp.concatenate([cp[j] for cp in code_parts], axis=-1)
            for j in range(len(code_parts[0]))
        ]
        return recon, codes


@dataclass
class StreamingRedecoder:
    """Chunked real-time voice conversion through the REDECODER path — the
    reference's actual VC resynthesis route (reconstruct_redecoder.py:94-128:
    source codes -> Redecoder WN-16 conditioned on target timbre -> DAC
    decoder), streamed exactly.

    Code-embedding lookup and conv_out are frame-local; the WN carries each
    in_layer's conv left context (models/wavenet.py:98); the decoder carries
    its usual streaming state. Causal configs only (`decoder_causal: True` —
    the reference's flagship redecoder config is non-causal and can only be
    windowed-recomputed; real-time VC requires the causal variant, exactly as
    the codec's real-time claim does, reference README.md:105-107).

    Exactness: chunked output == one-shot `Redecoder.__call__` + decoder
    (tests/test_streaming.py::test_streaming_redecoder_vc_exact). The FIRST
    chunk must cover every left reflect-pad span: the WN's k=5 and the
    decoder's deepest dilated resunit (min_first_frames_decoder) — smaller
    steady-state chunks are primed host-side, like StreamingFACodec."""

    redecoder: Any
    decoder: Any
    params: Dict[str, Any]  # {"encoder": <redecoder>, "decoder": ...}
    chunk_frames: int = 16
    use_p_code: bool = False
    n_c: int = 1

    def __post_init__(self):
        assert self.redecoder.causal and self.decoder.causal, (
            "streaming VC requires the causal redecoder config "
            "(decoder_causal: True); non-causal models need future context"
        )
        C = self.chunk_frames
        assert C >= 1
        need = max(5, min_first_frames_decoder(self.decoder.rates))
        self.prime_frames = math.ceil(need / C) * C
        red, dec = self.redecoder, self.decoder

        def step(params, p_code, c_code, timbre, state, first: bool):
            wn_s, dec_s = state
            z, wn_s = red.apply(
                {"params": params["encoder"]}, p_code, c_code, timbre,
                use_p_code=self.use_p_code, n_c=self.n_c,
                stream=wn_s, first=first,
            )
            wave, dec_s = dec.apply(
                {"params": params["decoder"]}, z, dec_s, first=first
            )
            return wave[:, :, 0], (wn_s, dec_s)

        self._first = jax.jit(lambda p, a, b, t, s: step(p, a, b, t, s, True))
        self._step = jax.jit(lambda p, a, b, t, s: step(p, a, b, t, s, False))

    def init_state(self, batch: int) -> "RedecoderState":
        from facodec_tpu.models.redecoder import redecoder_stream_state

        core = (
            redecoder_stream_state(self.redecoder, batch),
            decoder_stream_state(self.decoder, batch),
        )
        return RedecoderState(core=core)

    def vc_chunk(self, state: "RedecoderState", p_code: jnp.ndarray,
                 c_code: jnp.ndarray, timbre: jnp.ndarray):
        """p_code (B, n_p, chunk_frames), c_code (B, n_c, chunk_frames) int;
        timbre (B, 1024) — the TARGET speaker's vector. Returns
        (state, wave_chunk (B, chunk_frames*300) or None while priming)."""
        if not state.primed:
            pending = state.pending + ((p_code, c_code),)
            n = state.n_pending + p_code.shape[-1]
            if n < self.prime_frames:
                return replace(state, pending=pending, n_pending=n), None
            ps = jnp.concatenate([p for p, _ in pending], axis=-1)
            cs = jnp.concatenate([c for _, c in pending], axis=-1)
            wave, core = self._first(self.params, ps, cs, timbre, state.core)
            return RedecoderState(core=core, primed=True), wave
        wave, core = self._step(self.params, p_code, c_code, timbre, state.core)
        return RedecoderState(core=core, primed=True), wave


@dataclass(frozen=True)
class RedecoderState:
    """Streaming-VC session state: (wn carries, decoder carries) + priming."""

    core: Tuple
    pending: Tuple = ()
    n_pending: int = 0
    primed: bool = False


def _quantizer_wn(quantizer) -> Any:
    """The prosody WN submodule definition (for state sizing)."""
    from facodec_tpu.models.wavenet import WN

    return WN(
        hidden_channels=quantizer.prosody_hidden_dim, kernel_size=5,
        dilation_rate=1, n_layers=8, gin_channels=0, p_dropout=0.2,
        causal=quantizer.causal,
    )
