"""High-level user API: load a codec, encode/decode/reconstruct/convert.

The TPU-native equivalent of the reference's inference surface
(reconstruct.py:19-65, reconstruct_redecoder.py:45-128, webui.py:54-81),
wrapped in one object. Accepts BOTH checkpoint formats:
  * the reference's torch `pytorch_model.bin` (one state_dict per module) —
    converted on load via utils/checkpoint.py;
  * this framework's Orbax training checkpoints.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from facodec_tpu.codec_file import FACodecFile
from facodec_tpu.models.builder import build_model, init_params
from facodec_tpu.utils.config import load_config

SR = 24000
HOP = 300


def _shard_batch_args(mesh, arrays):
    """Pad each array's leading (batch) dim to a multiple of the mesh's data
    axis and place it batch-sharded; returns (placed_arrays, original_B).
    The SPMD partitioner then runs each entry point data-parallel with NO
    hand-written communication — rows are independent, so the only
    collective is the final gather on host read-back."""
    from facodec_tpu.parallel.mesh import DATA_AXIS, batch_sharding

    B = next(a.shape[0] for a in arrays if a is not None)
    pad = (-B) % mesh.shape[DATA_AXIS]
    s = batch_sharding(mesh)
    out = []
    for a in arrays:
        if a is None:
            out.append(None)
            continue
        if pad:
            a = jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
            )
        out.append(jax.device_put(a, s))
    return out, B


def load_inference_params(
    ckpt_path: str, keys=("encoder", "quantizer", "decoder"), templates=None,
) -> Dict[str, Any]:
    """Load inference params from EITHER checkpoint format: a torch
    `pytorch_model.bin` (key-rewrite conversion; validated against
    `templates` when given) or an Orbax training checkpoint directory
    (restored without a template — training checkpoints carry all five
    modules, inference needs a subset). Also the loader behind artifact
    serving (cli/serve.py), where no model source exists to build
    templates from."""
    if ckpt_path.endswith((".bin", ".pth", ".pt")):
        from facodec_tpu.utils.checkpoint import load_torch_checkpoint_file

        converted = load_torch_checkpoint_file(ckpt_path, templates)
        return {k: converted[k] for k in keys if k in converted}
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(ckpt_path))
    saved = restored["params"]
    return {k: saved[k] for k in keys}


def _load_params(ckpt_path: str, models: Dict[str, Any], templates) -> Dict[str, Any]:
    return load_inference_params(ckpt_path, tuple(models), templates)


@dataclass
class FACodec:
    """The codec: encoder + factorized quantizer + decoder."""

    models: Dict[str, Any]
    params: Dict[str, Any]
    n_c: int = 2
    # matmul/conv precision (ops/precision.py):
    #   "float32"  reference-exact everywhere
    #   "bfloat16" MXU-native everywhere; ~95% identical codes at flagship
    #              scale (encoder rounding flips argmin near Voronoi edges)
    #   "hybrid"   f32 encode (codes BIT-EXACT by construction) +
    #              bf16-activations decode (where ~2/3 of the round-trip
    #              FLOPs are; activations stay bf16 between layers, halving
    #              decode-side HBM traffic — 487x vs 434x f32 on v5e)
    precision: str = "float32"

    # jitted lazily per (batch, length) signature
    _enc: Any = field(default=None, repr=False)
    _dec: Any = field(default=None, repr=False)
    # set by shard_inference(): batch-parallel SPMD over this mesh
    _mesh: Any = field(default=None, repr=False)

    @classmethod
    def from_config(
        cls, config_path: str, ckpt_path: Optional[str] = None,
        rng_seed: int = 0, n_c: int = 2, precision: str = "float32",
    ) -> "FACodec":
        cfg = load_config(config_path)
        models = build_model(cfg.model_params, stage="codec")
        models = {k: models[k] for k in ("encoder", "quantizer", "decoder")}
        templates = init_params(models, jax.random.PRNGKey(rng_seed))
        params = _load_params(ckpt_path, models, templates) if ckpt_path else templates
        return cls(models=models, params=params, n_c=n_c, precision=precision)

    def __post_init__(self):
        from facodec_tpu.ops.precision import policy

        enc, qt, dec = (self.models[k] for k in ("encoder", "quantizer", "decoder"))
        n_c = self.n_c
        if self.precision == "hybrid":
            enc_prec, dec_prec = "float32", "bfloat16_act"
        elif self.precision == "hybrid_int8":
            # f32 encode (bit-exact codes) + W8A8 dynamic-int8 decode on the
            # int8 MXU (ops/precision.py). Offline/batch throughput mode:
            # dynamic activation scales pool per batch row, so use the
            # one-shot entry points, not streaming sessions.
            enc_prec, dec_prec = "float32", "int8"
        else:
            enc_prec = dec_prec = self.precision

        # the policy context wraps each closure BODY so every trace (first
        # call and shape-driven retraces) sees this instance's precision
        def encode(params, wave):
            with policy(enc_prec):
                z = enc.apply({"params": params["encoder"]}, wave[:, :, None])
                outs, quantized, commit, cb, timbre, codes = qt.apply(
                    {"params": params["quantizer"]}, z, wave, n_c=n_c,
                    return_codes=True,
                )
                return outs, codes, timbre

        def decode_codes(params, codes_p, codes_c, codes_r, timbre):
            with policy(dec_prec):
                outs = qt.apply(
                    {"params": params["quantizer"]}, codes_p, codes_c, codes_r,
                    timbre, method=qt.decode_from_codes_v2,
                )
                return dec.apply(
                    {"params": params["decoder"]}, outs
                )[:, :, 0].astype(jnp.float32)

        def decode_outs(params, outs):
            with policy(dec_prec):
                return dec.apply(
                    {"params": params["decoder"]}, outs
                )[:, :, 0].astype(jnp.float32)

        self._enc = jax.jit(encode)
        self._dec_codes = jax.jit(decode_codes)
        self._dec_outs = jax.jit(decode_outs)

    def shard_inference(self, mesh=None) -> "FACodec":
        """Enable data-parallel batch inference over a device mesh (beyond
        the reference — its DDP is training-only, train.py:110-122).
        Parameters are replicated; every one-shot entry point
        (encode / decode / decode_subset / reconstruct / timbre_of) pads the
        batch to a multiple of the mesh's data axis, shards it, and trims
        outputs — bulk offline transcoding scales linearly over ICI.
        Streaming sessions stay single-device (they are latency-, not
        throughput-bound). Default mesh: all devices on the data axis."""
        from facodec_tpu.parallel.mesh import make_mesh, replicate

        if mesh is None:
            mesh = make_mesh()
        self.params = replicate(mesh, self.params)
        self._mesh = mesh
        return self

    # ------------------------------------------------------------- numpy API
    def _prep(self, wave: np.ndarray) -> jnp.ndarray:
        wave = np.asarray(wave, np.float32)
        if wave.ndim == 1:
            wave = wave[None]
        T = wave.shape[-1] // HOP * HOP
        return jnp.asarray(wave[:, :T])

    def encode(self, wave: np.ndarray) -> FACodecFile:
        """wave (T,) or (B, T) float 24 kHz -> FACodecFile."""
        w = self._prep(wave)
        B0 = w.shape[0]
        if self._mesh is not None:
            (w,), B0 = _shard_batch_args(self._mesh, [w])
        _, codes, timbre = self._enc(self.params, w)
        codes_p, codes_c, codes_r = (np.asarray(c)[:B0] for c in codes)
        timbre = np.asarray(timbre)[:B0]
        return FACodecFile(
            codes_p=codes_p.astype(np.uint16),
            codes_c=codes_c.astype(np.uint16),
            codes_r=codes_r.astype(np.uint16),
            timbre=timbre,
            sample_rate=SR, hop_length=HOP, original_length=int(w.shape[-1]),
        )

    def encode_streaming(
        self, wave: np.ndarray, chunk_frames: int = 80,
        timbre_seconds: float = 10.0,
    ) -> FACodecFile:
        """Bounded-memory encode for arbitrarily long inputs.

        Runs the EXACT stateful streaming session chunk by chunk (codes are
        bit-identical to the one-shot encoder — test_streaming.py), so a
        10-minute file costs one compiled ~1 s chunk program and O(chunk)
        activations instead of a fresh whole-utterance XLA program. The
        reference handles long files by windowed recompute at fixed memory
        (dac/model/base.py:188-216); this is the stronger equivalent.

        Timbre is a global utterance vector in forward_v2 (reference
        modules/quantize.py:375-382) — for long inputs it is estimated from
        the first `timbre_seconds` (timbre is speaker-stationary; the
        StyleEncoder's attention is quadratic in frames, so capping is also
        what keeps memory bounded)."""
        from facodec_tpu.models.streaming import StreamingFACodec

        w = self._prep(wave)
        B, T = w.shape
        n_frames = T // HOP
        sess = StreamingFACodec(
            self.models["encoder"], self.models["quantizer"],
            self.models["decoder"], self.params, chunk_frames=chunk_frames,
            n_c=self.n_c,
        )
        # One-shot fallback when the session could never prime (it needs
        # prime_frames of input before the first emission — with small
        # chunk_frames that exceeds 2*chunk_frames) or when the input is
        # short enough that one-shot is simply cheaper.
        if n_frames < max(2 * chunk_frames, sess.prime_frames + 1):
            return self.encode(wave)

        twin = min(T, max(HOP, int(timbre_seconds * SR) // HOP * HOP))
        _, _, timbre = self._enc(self.params, w[:, :twin])
        est = sess.init_encode_state(B)
        step = chunk_frames * HOP
        parts: List[Any] = []
        for i in range(0, n_frames * HOP, step):
            chunk = w[:, i : i + step]  # tail chunk may be shorter (own jit)
            est, _, codes = sess.encode_chunk(est, chunk, timbre)
            if codes is not None:
                parts.append(codes)
        _, codes_t = sess.flush_encode(est, timbre)
        parts.append(codes_t)
        cp, cc, cr = (
            np.concatenate([np.asarray(p[j]) for p in parts], axis=-1)
            for j in range(3)
        )
        return FACodecFile(
            codes_p=cp.astype(np.uint16), codes_c=cc.astype(np.uint16),
            codes_r=cr.astype(np.uint16), timbre=np.asarray(timbre),
            sample_rate=SR, hop_length=HOP, original_length=int(T),
        )

    def decode_streaming(
        self, f: FACodecFile, use_residual: bool = True, chunk_frames: int = 80
    ) -> np.ndarray:
        """Bounded-memory decode: frame-local `decode_from_codes_v2` + the
        stateful streaming decoder, chunk by chunk (exact — identical to the
        one-shot decode; the decoder's causal convs carry left context)."""
        from facodec_tpu.models.dac import decoder_stream_state
        from facodec_tpu.models.streaming import min_first_frames_decoder

        qt, dec = self.models["quantizer"], self.models["decoder"]
        assert chunk_frames >= min_first_frames_decoder(dec.rates)

        def step(params, cp, cc, cr, timbre, state, first):
            outs = qt.apply(
                {"params": params["quantizer"]}, cp, cc, cr, timbre,
                method=qt.decode_from_codes_v2,
            )
            wave, state = dec.apply(
                {"params": params["decoder"]}, outs, state, first=first
            )
            return wave[:, :, 0], state

        jit_first = jax.jit(lambda p, a, b, c, t, s: step(p, a, b, c, t, s, True))
        jit_step = jax.jit(lambda p, a, b, c, t, s: step(p, a, b, c, t, s, False))

        cp = jnp.asarray(f.codes_p.astype(np.int32))
        cc = jnp.asarray(f.codes_c.astype(np.int32))
        cr = (jnp.asarray(f.codes_r.astype(np.int32))
              if (use_residual and f.codes_r is not None) else None)
        timbre = jnp.asarray(f.timbre)
        state = decoder_stream_state(dec, cp.shape[0])
        T = cp.shape[-1]
        parts = []
        for i in range(0, T, chunk_frames):
            sl = slice(i, i + chunk_frames)
            fn = jit_first if i == 0 else jit_step
            wave, state = fn(self.params, cp[..., sl], cc[..., sl],
                             None if cr is None else cr[..., sl], timbre, state)
            parts.append(np.asarray(wave))
        out = np.concatenate(parts, axis=1)
        if f.original_length:
            out = out[:, : f.original_length]
        return out

    def decode(self, f: FACodecFile, use_residual: bool = True) -> np.ndarray:
        """FACodecFile -> wave (B, T) float numpy."""
        args = [
            jnp.asarray(f.codes_p.astype(np.int32)),
            jnp.asarray(f.codes_c.astype(np.int32)),
            jnp.asarray(f.codes_r.astype(np.int32)) if (
                use_residual and f.codes_r is not None) else None,
            jnp.asarray(f.timbre),
        ]
        B0 = args[0].shape[0]
        if self._mesh is not None:
            args, B0 = _shard_batch_args(self._mesh, args)
        wave = self._dec_codes(self.params, *args)
        out = np.asarray(wave)[:B0]
        if f.original_length:
            out = out[:, : f.original_length]
        return out

    def decode_subset(
        self, f: FACodecFile, use_prosody: bool = True, use_content: bool = True,
        use_residual: bool = True,
    ) -> np.ndarray:
        """Decode an arbitrary stream subset (factorization probe; reference
        train.py:428-466). E.g. prosody-only decode carries the F0 contour
        but no phonetic content if the factorization holds."""
        qt, dec = self.models["quantizer"], self.models["decoder"]
        key = (use_prosody, use_content, use_residual)
        cache = getattr(self, "_subset_jits", None)
        if cache is None:
            cache = self._subset_jits = {}
        if key not in cache:
            def fn(params, cp, cc, cr, timbre):
                outs = qt.apply(
                    {"params": params["quantizer"]}, cp, cc, cr, timbre,
                    use_p=use_prosody, use_c=use_content, use_r=use_residual,
                    method=qt.decode_streams_v2,
                )
                return dec.apply({"params": params["decoder"]}, outs)[:, :, 0]

            cache[key] = jax.jit(fn)
        args = [
            jnp.asarray(f.codes_p.astype(np.int32)),
            jnp.asarray(f.codes_c.astype(np.int32)),
            jnp.asarray(f.codes_r.astype(np.int32)) if f.codes_r is not None else None,
            jnp.asarray(f.timbre),
        ]
        B0 = args[0].shape[0]
        if self._mesh is not None:
            args, B0 = _shard_batch_args(self._mesh, args)
        wave = cache[key](self.params, *args)
        out = np.asarray(wave)[:B0]
        if f.original_length:
            out = out[:, : f.original_length]
        return out

    def reconstruct(self, wave: np.ndarray) -> np.ndarray:
        """Round-trip through the quantized latent (reconstruct.py:56-61)."""
        w = self._prep(wave)
        B0 = w.shape[0]
        if self._mesh is not None:
            (w,), B0 = _shard_batch_args(self._mesh, [w])
        outs, _, _ = self._enc(self.params, w)
        return np.asarray(self._dec_outs(self.params, outs))[:B0]

    def timbre_of(self, wave: np.ndarray) -> np.ndarray:
        """Global timbre vector of an utterance."""
        w = self._prep(wave)
        B0 = w.shape[0]
        if self._mesh is not None:
            (w,), B0 = _shard_batch_args(self._mesh, [w])
        _, _, timbre = self._enc(self.params, w)
        return np.asarray(timbre)[:B0]

    def latency(self, chunk_frames: Optional[int] = None,
                sample_rate: int = 24000):
        """Analytic delay/latency report for this config (reference
        get_delay/get_output_length, dac/model/base.py:82-123): algorithmic
        latency, lookahead (0 for the causal flagship), conv receptive
        fields, and — given `chunk_frames` — the exact-streaming session's
        chunk buffering and first-emission (priming) requirement."""
        from facodec_tpu.models.latency import codec_latency

        enc, dec = self.models["encoder"], self.models["decoder"]
        return codec_latency(
            tuple(enc.strides), tuple(dec.rates), causal=enc.causal,
            sample_rate=sample_rate, chunk_frames=chunk_frames,
        )


@dataclass
class FARedecoder:
    """The stage-2 voice-conversion model (redecoder + its decoder)."""

    models: Dict[str, Any]
    params: Dict[str, Any]
    _mesh: Any = field(default=None, repr=False)

    @classmethod
    def from_config(
        cls, config_path: str, ckpt_path: Optional[str] = None, rng_seed: int = 0
    ) -> "FARedecoder":
        cfg = load_config(config_path)
        models = build_model(cfg.model_params, stage="redecoder")
        models = {k: models[k] for k in ("encoder", "decoder")}
        templates = init_params(models, jax.random.PRNGKey(rng_seed))
        params = _load_params(ckpt_path, models, templates) if ckpt_path else templates
        return cls(models=models, params=params)

    def __post_init__(self):
        red, dec = self.models["encoder"], self.models["decoder"]

        def vc(params, p_code, c_code, timbre, use_p_code, n_c):
            z = red.apply({"params": params["encoder"]}, p_code, c_code, timbre,
                          use_p_code=use_p_code, n_c=n_c)
            return dec.apply({"params": params["decoder"]}, z)[:, :, 0]

        self._vc = jax.jit(vc, static_argnums=(4, 5))

    def shard_inference(self, mesh=None) -> "FARedecoder":
        """Data-parallel batch VC over a device mesh (see
        FACodec.shard_inference); applies to `resynthesize`."""
        from facodec_tpu.parallel.mesh import make_mesh, replicate

        if mesh is None:
            mesh = make_mesh()
        self.params = replicate(mesh, self.params)
        self._mesh = mesh
        return self

    def resynthesize(
        self,
        codes: FACodecFile,
        target_timbre: np.ndarray,
        use_p_code: bool = False,
        n_c: int = 1,
    ) -> np.ndarray:
        """Voice conversion: source codes + target timbre -> wave
        (reference reconstruct_redecoder.py:110-128)."""
        args = [
            jnp.asarray(codes.codes_p.astype(np.int32)),
            jnp.asarray(codes.codes_c.astype(np.int32)),
            jnp.asarray(np.asarray(target_timbre, np.float32)),
        ]
        B0 = args[0].shape[0]
        if self._mesh is not None:
            args, B0 = _shard_batch_args(self._mesh, args)
        wave = self._vc(self.params, *args, use_p_code, n_c)
        out = np.asarray(wave)[:B0]
        if codes.original_length:
            out = out[:, : codes.original_length]
        return out

    def resynthesize_streaming(
        self,
        codes: FACodecFile,
        target_timbre: np.ndarray,
        chunk_frames: int = 16,
        use_p_code: bool = False,
        n_c: int = 1,
    ) -> np.ndarray:
        """Chunked real-time VC through the redecoder (exact — identical to
        `resynthesize`; causal configs only). Bounded memory for arbitrarily
        long sources: one compiled chunk step + O(chunk) activations.

        The reference's real-time-VC story runs exactly this path one-shot
        (reconstruct_redecoder.py:94-128); here it streams."""
        from facodec_tpu.models.streaming import StreamingRedecoder

        sess = StreamingRedecoder(
            self.models["encoder"], self.models["decoder"], self.params,
            chunk_frames=chunk_frames, use_p_code=use_p_code, n_c=n_c,
        )
        cp = jnp.asarray(codes.codes_p.astype(np.int32))
        cc = jnp.asarray(codes.codes_c.astype(np.int32))
        timbre = jnp.asarray(np.asarray(target_timbre, np.float32))
        T = cp.shape[-1]
        if T < sess.prime_frames:  # too short to prime: one-shot
            return self.resynthesize(codes, target_timbre,
                                     use_p_code=use_p_code, n_c=n_c)
        state = sess.init_state(cp.shape[0])
        parts = []
        for i in range(0, T, chunk_frames):
            sl = slice(i, i + chunk_frames)
            state, wave = sess.vc_chunk(state, cp[..., sl], cc[..., sl], timbre)
            if wave is not None:
                parts.append(np.asarray(wave))
        out = np.concatenate(parts, axis=1)
        if codes.original_length:
            out = out[:, : codes.original_length]
        return out


def convert_voice(
    codec: FACodec, redecoder: FARedecoder,
    source_wave: np.ndarray, target_wave: np.ndarray,
) -> np.ndarray:
    """Zero-shot VC: source content/prosody + target timbre."""
    codes = codec.encode(source_wave)
    timbre = codec.timbre_of(target_wave)
    return redecoder.resynthesize(codes, timbre, use_p_code=False, n_c=1)
