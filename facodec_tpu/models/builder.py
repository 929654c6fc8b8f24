"""Model factory: config -> dict of flax module definitions.

Mirrors the reference factory `build_model(args, stage)` at
/root/reference/modules/commons.py:283-443 ('codec', 'redecoder', 'encoder'
stages; 'beta_vae' references a module absent from the reference repo and is
non-functional there, so it is intentionally not rebuilt).

In JAX the factory returns *module definitions* (pure pytrees of
hyperparameters); parameters live in separate pytrees created by
`init_params` and are stored/loaded via utils/checkpoint.py.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from facodec_tpu.models.dac import Decoder, Encoder
from facodec_tpu.models.discriminator import Discriminator
from facodec_tpu.models.fa_quantizer import FApredictors, FAquantizer
from facodec_tpu.models.redecoder import Redecoder

BANDS = ((0.0, 0.1), (0.1, 0.25), (0.25, 0.5), (0.5, 0.75), (0.75, 1.0))


def build_model(args: Any, stage: str = "codec") -> Dict[str, Any]:
    """args is the `model_params` AttrDict from the reference config.yml.

    Optional extension keys (absent from reference configs; defaults keep the
    reference architecture exactly): latent_dim, style_hidden_dim,
    prosody_hidden_dim, n_phone_classes, n_speakers, codebook_size — used by
    scaled-down test configs."""
    D = args.get("latent_dim", 1024)
    cbs = args.get("codebook_size", 1024)
    extra_q = dict(
        style_hidden_dim=args.get("style_hidden_dim", 512),
        prosody_hidden_dim=args.get("prosody_hidden_dim", 256),
    )
    extra_p = dict(
        n_phone_classes=args.get("n_phone_classes", 1024),
        n_speakers=args.get("n_speakers", 20000),
    )
    if stage == "codec":
        encoder = Encoder(
            d_model=args.DAC.encoder_dim,
            strides=tuple(args.DAC.encoder_rates),
            d_latent=D,
            causal=args.causal,
            lstm=args.lstm,
        )
        quantizer = FAquantizer(
            in_dim=D,
            n_p_codebooks=1,
            n_c_codebooks=args.n_c_codebooks,
            n_t_codebooks=2,
            n_r_codebooks=3,
            codebook_size=cbs,
            codebook_dim=8,
            quantizer_dropout=0.5,
            causal=args.causal,
            separate_prosody_encoder=args.separate_prosody_encoder,
            timbre_norm=args.timbre_norm,
            sample_rate=args.DAC.sr,
            **extra_q,
        )
        fa_predictors = FApredictors(
            in_dim=D,
            use_gr_content_f0=args.use_gr_content_f0,
            use_gr_prosody_phone=args.use_gr_prosody_phone,
            use_gr_residual_f0=True,
            use_gr_residual_phone=True,
            use_gr_timbre_content=True,
            use_gr_timbre_prosody=args.use_gr_timbre_prosody,
            use_gr_x_timbre=True,
            norm_f0=args.norm_f0,
            timbre_norm=args.timbre_norm,
            use_gr_content_global_f0=args.use_gr_content_global_f0,
            **extra_p,
        )
        decoder = Decoder(
            input_channel=D,
            channels=args.DAC.decoder_dim,
            rates=tuple(args.DAC.decoder_rates),
            causal=args.causal,
            lstm=args.lstm,
        )
        discriminator = Discriminator(
            rates=(),
            periods=(2, 3, 5, 7, 11),
            fft_sizes=(2048, 1024, 512),
            sample_rate=args.DAC.sr,
            bands=BANDS,
        )
        return dict(
            encoder=encoder,
            quantizer=quantizer,
            decoder=decoder,
            discriminator=discriminator,
            fa_predictors=fa_predictors,
        )
    if stage == "redecoder":
        encoder = Redecoder(
            n_p_codebooks=args.n_p_codebooks,
            n_c_codebooks=args.n_c_codebooks,
            codebook_size=cbs,
            embed_dim=args.wavenet_embed_dim,
            n_layers=16,
            causal=args.decoder_causal,
            p_dropout=0.2,
            gin_channels=D,
            out_dim=D,
        )
        decoder = Decoder(
            input_channel=D,
            channels=args.DAC.decoder_dim,
            rates=tuple(args.DAC.decoder_rates),
            causal=args.decoder_causal,
            lstm=args.decoder_lstm,
        )
        discriminator = Discriminator(
            rates=(),
            periods=(2, 3, 5, 7, 11),
            fft_sizes=(2048, 1024, 512),
            sample_rate=args.DAC.sr,
            bands=BANDS,
        )
        return dict(encoder=encoder, decoder=decoder, discriminator=discriminator)
    if stage == "encoder":
        encoder = Encoder(
            d_model=args.DAC.encoder_dim,
            strides=tuple(args.DAC.encoder_rates),
            d_latent=D,
            causal=args.encoder_causal,
            lstm=args.encoder_lstm,
        )
        quantizer = FAquantizer(
            in_dim=D,
            n_p_codebooks=1,
            n_c_codebooks=args.n_c_codebooks,
            n_t_codebooks=2,
            n_r_codebooks=3,
            codebook_size=cbs,
            codebook_dim=8,
            quantizer_dropout=0.5,
            causal=args.encoder_causal,
            separate_prosody_encoder=args.separate_prosody_encoder,
            timbre_norm=args.timbre_norm,
            sample_rate=args.DAC.sr,
            **extra_q,
        )
        return dict(encoder=encoder, quantizer=quantizer)
    raise ValueError(f"Unknown stage: {stage}")


def init_params(
    models: Dict[str, Any],
    rng: jax.Array,
    sample_rate: int = 24000,
    hop_length: int = 300,
    seg_frames: int = 8,
    batch: int = 1,
) -> Dict[str, Any]:
    """Initialize parameter pytrees for a `build_model` output with tiny
    dummy inputs (shapes do not affect parameter shapes)."""
    T = seg_frames * hop_length
    wave = jnp.zeros((batch, T, 1), jnp.float32)
    wave_flat = wave[:, :, 0]
    params: Dict[str, Any] = {}
    keys = jax.random.split(rng, len(models))
    # jit each init: one trace + compile instead of per-op eager dispatch.
    jinit = lambda mod: jax.jit(mod.init)
    for key, (name, mod) in zip(keys, models.items()):
        rngs = {"params": key, "dropout": key}
        if name == "encoder" and isinstance(mod, Encoder):
            params[name] = jinit(mod)(rngs, wave)["params"]
        elif name == "encoder" and isinstance(mod, Redecoder):
            p_code = jnp.zeros((batch, mod.n_p_codebooks, seg_frames), jnp.int32)
            c_code = jnp.zeros((batch, mod.n_c_codebooks, seg_frames), jnp.int32)
            timbre = jnp.zeros((batch, mod.gin_channels), jnp.float32)
            params[name] = jinit(mod)(rngs, p_code, c_code, timbre)["params"]
        elif name == "quantizer":
            z = jnp.zeros((batch, seg_frames, mod.in_dim), jnp.float32)
            # trace with every content codebook active so ALL stage params
            # are created (forward_v2 defaults to n_c=1 which would skip
            # content_quantizer stages >= 1)
            nc = mod.n_c_codebooks  # static under jit
            init_fn = jax.jit(lambda r, z_, w_: mod.init(r, z_, w_, n_c=nc))
            params[name] = init_fn(rngs, z, wave_flat)["params"]
        elif name == "decoder":
            z = jnp.zeros((batch, seg_frames, mod.input_channel), jnp.float32)
            params[name] = jinit(mod)(rngs, z)["params"]
        elif name == "discriminator":
            params[name] = jinit(mod)(rngs, wave)["params"]
        elif name == "fa_predictors":
            n_streams = 3 if mod.timbre_norm else 4
            q = [jnp.zeros((batch, seg_frames, mod.in_dim), jnp.float32)] * n_streams
            timbre = jnp.zeros((batch, mod.in_dim), jnp.float32)
            params[name] = jinit(mod)(rngs, q, timbre)["params"]
        else:
            raise ValueError(f"Unknown model key: {name}")
    return params
