"""Training-time behavioral probes (reference train.py:423-466): the
factorization audit — decode every stream subset (prosody / content /
residual / combinations) and a timbre-swap voice-conversion probe — logged
as TensorBoard audio so disentanglement can be judged by ear, exactly like
the reference's TB artifacts."""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp

SUBSETS = {
    "prosody": (True, False, False),
    "content": (False, True, False),
    "residual": (False, False, True),
    "prosody+content": (True, True, False),
    "prosody+residual": (True, False, True),
    "full": (True, True, True),
}


def make_probe_fn(models: Mapping[str, Any]):
    """Returns jitted `probe(params, batch) -> {name: wave (B, T)}`."""
    encoder, quantizer, decoder = (
        models["encoder"], models["quantizer"], models["decoder"]
    )

    @jax.jit
    def probe(params, batch) -> Dict[str, jnp.ndarray]:
        wave = batch["wave_seg"][:, :, None]
        z = encoder.apply({"params": params["encoder"]}, wave)
        outs, quantized, _, _, timbre = quantizer.apply(
            {"params": params["quantizer"]}, z, batch["wave_seg"], n_c=2,
            full_waves=batch["full_waves"], wave_lens=batch["wave_lens"],
        )
        z_p, z_c, z_r = quantized

        def decode(streams_sum, tvec):
            cond = quantizer.apply(
                {"params": params["quantizer"]}, streams_sum, tvec,
                method=quantizer._timbre_condition,
            )
            return decoder.apply({"params": params["decoder"]}, cond)[:, :, 0]

        out = {}
        for name, (use_p, use_c, use_r) in SUBSETS.items():
            s = jnp.zeros_like(z_p)
            if use_p:
                s = s + z_p
            if use_c:
                s = s + z_c
            if use_r:
                s = s + z_r
            out[f"probe/{name}"] = decode(s, timbre)
        # timbre swap: each sample resynthesized with the next sample's timbre
        out["probe/timbre_swap"] = decode(z_p + z_c + z_r, jnp.roll(timbre, 1, axis=0))
        out["probe/ground_truth"] = batch["wave_seg"]
        return out

    return probe


def log_probe_audio(log_writer, audio: Dict[str, jnp.ndarray], step: int,
                    sample_rate: int = 24000, max_items: int = 1) -> None:
    import numpy as np

    for name, wave in audio.items():
        w = np.asarray(wave)
        for b in range(min(max_items, w.shape[0])):
            log_writer.add_audio(f"{name}/{b}", np.clip(w[b], -1, 1)[:, None],
                                 step, sample_rate=sample_rate)
