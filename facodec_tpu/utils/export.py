"""AOT model-artifact export/load via `jax.export` (StableHLO).

Deployment story: the flagship round trip takes minutes of host-side XLA
compile on first trace (BASELINE.md). An exported artifact pins the traced
program — Python model code, config parsing, and tracing are not needed at
serving time, versions are frozen at export time, and loading + compiling a
serialized program hits the persistent compile cache like any other module.
The reference has no equivalent (its deploy unit is a torch state_dict +
the full model source, reconstruct.py:19-39).

Artifact = a directory:
    meta.json           function table, arg specs, jax version, platforms
    <name>.stablehlo    one serialized jax.export artifact per function

Parameters stay an INPUT of every exported function (not baked constants),
so one artifact serves any checkpoint with the same architecture; ship the
params alongside via utils/checkpoint (torch .bin or Orbax both load).

Exported functions (export_codec):
    encode        (params, wave (B, T) f32)        -> (codes_p, codes_c, codes_r, timbre)
    decode        (params, cp, cc, cr, timbre)     -> wave (B, T) f32
    reconstruct   (params, wave)                   -> wave
    encode_masked / reconstruct_masked add a lens (B,) i32 arg — the
    bucketed-serving variants (zero-padded request, timbre pooling masked
    to the true length) that `serve --artifact` runs.
Shapes are static per artifact (bucketed serving semantics — cli/serve.py);
export one artifact per (batch, seconds) signature you deploy.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

SR = 24000
HOP = 300

META_NAME = "meta.json"


def _codec_fns(codec) -> Dict[str, Any]:
    """The jittable closures of api.FACodec, re-wrapped to positional-only
    signatures with flat outputs (stable across jax pytree conventions)."""
    from facodec_tpu.ops.precision import policy

    enc, qt = codec.models["encoder"], codec.models["quantizer"]
    dec = codec.models["decoder"]
    n_c = codec.n_c
    if codec.precision == "hybrid":
        enc_prec, dec_prec = "float32", "bfloat16_act"
    else:
        enc_prec = dec_prec = codec.precision

    def encode(params, wave):
        with policy(enc_prec):
            z = enc.apply({"params": params["encoder"]}, wave[:, :, None])
            _, _, _, _, timbre, codes = qt.apply(
                {"params": params["quantizer"]}, z, wave, n_c=n_c,
                return_codes=True,
            )
            return codes[0], codes[1], codes[2], timbre

    def decode(params, cp, cc, cr, timbre):
        with policy(dec_prec):
            outs = qt.apply(
                {"params": params["quantizer"]}, cp, cc, cr, timbre,
                method=qt.decode_from_codes_v2,
            )
            return dec.apply({"params": params["decoder"]}, outs)[
                :, :, 0
            ].astype(jnp.float32)

    def reconstruct(params, wave):
        with policy(enc_prec):
            z = enc.apply({"params": params["encoder"]}, wave[:, :, None])
            outs, *_ = qt.apply(
                {"params": params["quantizer"]}, z, wave, n_c=n_c,
                return_codes=True,
            )
        with policy(dec_prec):
            return dec.apply({"params": params["decoder"]}, outs)[
                :, :, 0
            ].astype(jnp.float32)

    def encode_masked(params, wave, lens):
        # bucketed-serving variant (cli/serve.py semantics): the request is
        # zero-padded to the artifact length; timbre pooling is masked to
        # the true length so padding doesn't dilute the global vector
        # (reference modules/quantize.py:375-382 pools the full utterance)
        with policy(enc_prec):
            z = enc.apply({"params": params["encoder"]}, wave[:, :, None])
            _, _, _, _, timbre, codes = qt.apply(
                {"params": params["quantizer"]}, z, wave, n_c=n_c,
                full_waves=wave, wave_lens=lens, return_codes=True,
            )
            return codes[0], codes[1], codes[2], timbre

    def reconstruct_masked(params, wave, lens):
        with policy(enc_prec):
            z = enc.apply({"params": params["encoder"]}, wave[:, :, None])
            outs, *_ = qt.apply(
                {"params": params["quantizer"]}, z, wave, n_c=n_c,
                full_waves=wave, wave_lens=lens, return_codes=True,
            )
        with policy(dec_prec):
            return dec.apply({"params": params["decoder"]}, outs)[
                :, :, 0
            ].astype(jnp.float32)

    return {
        "encode": encode, "decode": decode, "reconstruct": reconstruct,
        "encode_masked": encode_masked, "reconstruct_masked": reconstruct_masked,
    }


def _spec(tree):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)), tree
    )


def export_codec(
    codec,
    out_dir: str,
    batch: int = 1,
    seconds: float = 10.0,
    platforms: Optional[Sequence[str]] = None,
    n_quantizer_groups: Sequence[int] = (1, 2, 3),
) -> Dict[str, int]:
    """Export the codec's inference functions for one (batch, seconds)
    signature; returns {name: serialized bytes}. `platforms` defaults to the
    current backend (pass e.g. ("tpu",) to cross-export from a CPU host)."""
    from jax import export as jex

    frames = int(seconds * SR) // HOP
    T = frames * HOP
    wave = jax.ShapeDtypeStruct((batch, T), jnp.float32)
    n_p, n_c, n_r = n_quantizer_groups
    cp = jax.ShapeDtypeStruct((batch, n_p, frames), jnp.int32)
    cc = jax.ShapeDtypeStruct((batch, n_c, frames), jnp.int32)
    cr = jax.ShapeDtypeStruct((batch, n_r, frames), jnp.int32)
    timbre_dim = codec.params["quantizer"]["timbre_linear"]["weight"].shape[1]
    timbre = jax.ShapeDtypeStruct((batch, timbre_dim), jnp.float32)
    pspec = _spec(codec.params)

    lens = jax.ShapeDtypeStruct((batch,), jnp.int32)
    fns = _codec_fns(codec)
    args = {
        "encode": (pspec, wave),
        "decode": (pspec, cp, cc, cr, timbre),
        "reconstruct": (pspec, wave),
        "encode_masked": (pspec, wave, lens),
        "reconstruct_masked": (pspec, wave, lens),
    }
    kw = {"platforms": tuple(platforms)} if platforms else {}

    os.makedirs(out_dir, exist_ok=True)
    sizes: Dict[str, int] = {}
    meta: Dict[str, Any] = {
        "format": "facodec-tpu-export",
        "version": 1,
        "jax_version": jax.__version__,
        "precision": codec.precision,
        "n_c": codec.n_c,
        "batch": batch,
        "seconds": seconds,
        "frames": frames,
        "sample_rate": SR,
        "hop_length": HOP,
        "functions": {},
    }
    for name, fn in fns.items():
        exp = jex.export(jax.jit(fn), **kw)(*args[name])
        blob = exp.serialize()
        fname = f"{name}.stablehlo"
        with open(os.path.join(out_dir, fname), "wb") as f:
            f.write(blob)
        sizes[name] = len(blob)
        meta["functions"][name] = {
            "file": fname,
            "platforms": list(exp.platforms),
            "in_avals": [str(a) for a in exp.in_avals],
        }
    with open(os.path.join(out_dir, META_NAME), "w") as f:
        json.dump(meta, f, indent=1)
    return sizes


class ExportedCodec:
    """Loads an export_codec artifact; callables under `.encode` /
    `.decode` / `.reconstruct` with the exported signatures. No model
    source or config needed — just this artifact + a params pytree."""

    def __init__(self, artifact_dir: str):
        from jax import export as jex

        with open(os.path.join(artifact_dir, META_NAME)) as f:
            self.meta = json.load(f)
        if self.meta.get("format") != "facodec-tpu-export":
            raise ValueError(f"{artifact_dir} is not a facodec-tpu export")
        self._fns = {}
        for name, info in self.meta["functions"].items():
            with open(os.path.join(artifact_dir, info["file"]), "rb") as f:
                exp = jex.deserialize(f.read())
            self._fns[name] = exp.call

    def __getattr__(self, name):
        try:
            return self._fns[name]
        except KeyError:
            raise AttributeError(name) from None
