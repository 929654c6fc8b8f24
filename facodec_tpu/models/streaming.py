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

Latency: chunk + 1 frame (12.5 ms) + device time. Chunk length is static ->
one compiled step reused for the whole stream.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from facodec_tpu.models.dac import decoder_stream_state, encoder_stream_state
from facodec_tpu.models.wavenet import wn_stream_state
from facodec_tpu.ops.spectral import hann_window, mel_filterbank

HOP = 300
WIN = 1200
NFFT = 2048
CTX = WIN // 2  # 600: one-sided effective mel support
TAIL = WIN - HOP  # 900: carried wave samples


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


@dataclass
class StreamingFACodec:
    """Host-side streaming session over jitted chunk steps.

    encoder/quantizer/decoder are the flax modules (causal flagship config);
    params the matching pytrees. chunk_frames is the static chunk size in
    latent frames (>= 10 for exact first-chunk reflect coverage at the
    flagship strides; 8 kHz of audio per 300-sample hop).
    """

    encoder: Any
    quantizer: Any
    decoder: Any
    params: Dict[str, Any]
    chunk_frames: int = 16
    n_c: int = 1

    def __post_init__(self):
        C = self.chunk_frames
        # the first emission is C-1 frames and must cover the decoder's
        # deepest reflect-pad span (10 frames at the flagship rates)
        assert C >= 11, "chunk_frames must be >= 11 for exact streaming"
        enc, qt, dec = self.encoder, self.quantizer, self.decoder

        def encode_step(params, wave_chunk, timbre, state, first: bool):
            enc_s, wn_s, tail, lat_buf = state
            latent, enc_s = enc.apply(
                {"params": params["encoder"]}, wave_chunk[:, :, None], enc_s,
                first=first,
            )
            if first:
                ctx = jnp.concatenate([_reflect_front(wave_chunk, CTX), wave_chunk], 1)
                n_out = C - 1
                lat = latent[:, :n_out]
                lat_buf = latent[:, n_out:]
            else:
                ctx = jnp.concatenate([tail, wave_chunk], axis=1)
                n_out = C
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

        self._encode_first = jax.jit(lambda p, w, t, s: encode_step(p, w, t, s, True))
        self._encode = jax.jit(lambda p, w, t, s: encode_step(p, w, t, s, False))
        self._flush = jax.jit(flush_step)
        self._decode_first = jax.jit(lambda p, o, s: decode_step(p, o, s, True))
        self._decode = jax.jit(lambda p, o, s: decode_step(p, o, s, False))
        # unjitted steady-state closures for lax.scan composition (run_scan)
        self._encode_steady_raw = lambda p, w, t, s: encode_step(p, w, t, s, False)
        self._decode_steady_raw = lambda p, o, s: decode_step(p, o, s, False)

    # ------------------------------------------------------------- encode
    def init_encode_state(self, batch: int) -> Tuple:
        enc_s = encoder_stream_state(self.encoder, batch)
        wn_s = wn_stream_state(_quantizer_wn(self.quantizer), batch)
        tail = jnp.zeros((batch, TAIL))
        lat_buf = jnp.zeros((batch, 1, self.quantizer.in_dim))
        return (enc_s, wn_s, tail, lat_buf, True)

    def encode_chunk(self, state, wave_chunk: jnp.ndarray, timbre: jnp.ndarray):
        """wave_chunk (B, chunk_frames*300). Returns (state, outs, codes);
        first call emits chunk_frames-1 frames, later calls chunk_frames."""
        *core, first = state
        fn = self._encode_first if first else self._encode
        outs, codes, core = fn(self.params, wave_chunk, timbre, tuple(core))
        return (*core, False), outs, codes

    def flush_encode(self, state, timbre: jnp.ndarray):
        """Emit the final (end-reflect) frame."""
        *core, first = state
        return self._flush(self.params, timbre, tuple(core))

    # ------------------------------------------------------------- decode
    def init_decode_state(self, batch: int) -> Tuple:
        return (decoder_stream_state(self.decoder, batch), True)

    def decode_chunk(self, state, outs: jnp.ndarray):
        core, first = state
        fn = self._decode_first if first else self._decode
        wave, core = fn(self.params, outs, core)
        return (core, False), wave

    # ---------------------------------------------------------- scan mode
    def run_scan(self, wave: jnp.ndarray, timbre: jnp.ndarray):
        """Process a whole (B, n_chunks*chunk_frames*300) wave through the
        chunked encode+decode pipeline as ONE `lax.scan` — a single device
        launch for the entire stream (no per-chunk host round trips), with
        identical per-chunk semantics to the interactive session.

        Note: at flagship size the fused program is large; remote-compile
        tunnels with request-size limits may reject it (HTTP 413) — use the
        interactive chunk API there (its steps chain by state, so executions
        pipeline on-device without host sync anyway).

        Returns (recon_wave (B, T - 300), codes) — the first chunk emits
        C-1 frames and no flush is applied, so output trails input by one
        frame; use flush_encode for the tail when exactness to the one-shot
        forward is needed."""
        B, T = wave.shape
        C = self.chunk_frames
        step = C * HOP
        assert T % step == 0, "wave length must be a chunk multiple"
        n_chunks = T // step
        chunks = wave.reshape(B, n_chunks, step).transpose(1, 0, 2)

        est = tuple(self.init_encode_state(B))[:-1]
        dst = self.init_decode_state(B)[0]

        # chunk 0 (first=True static branch) outside the scan
        outs0, codes0, est = self._encode_first(self.params, chunks[0], timbre, est)
        wave0, dst = self._decode_first(self.params, outs0, dst)

        p = self.params

        def body(carry, chunk):
            est, dst = carry
            outs, codes, est = self._encode_steady_raw(p, chunk, timbre, est)
            w, dst = self._decode_steady_raw(p, outs, dst)
            return (est, dst), (w, codes)

        if n_chunks > 1:
            (_, _), (waves, codes) = jax.lax.scan(body, (est, dst), chunks[1:])
            # (n-1, B, step) -> (B, (n-1)*step)
            rest = waves.transpose(1, 0, 2).reshape(B, -1)
            recon = jnp.concatenate([wave0, rest], axis=1)
        else:
            recon = wave0
            codes = None
        return recon, (codes0, codes)


def _quantizer_wn(quantizer) -> Any:
    """The prosody WN submodule definition (for state sizing)."""
    from facodec_tpu.models.wavenet import WN

    return WN(
        hidden_channels=quantizer.prosody_hidden_dim, kernel_size=5,
        dilation_rate=1, n_layers=8, gin_channels=0, p_dropout=0.2,
        causal=quantizer.causal,
    )
