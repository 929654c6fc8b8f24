"""Stage-2 (redecoder) GAN training step.

Functional rebuild of /root/reference/train_redecoder.py:195-330 (wavenet
variant): a FROZEN codec encoder+quantizer produces (prosody codes, content
codes, timbre) for each segment; the redecoder + decoder are trained with
mel*15 + feature-matching + adversarial losses only (no predictors or
teachers). Same single-generator-forward vjp structure as the codec step.

Note: the reference's call into the frozen quantizer passes two boolean
tensors into the `n_c`/`n_t` positions of forward_v2 (train_redecoder.py:
220-227) — a bit-rotted call that would TypeError; the evident intent
(forward_v2 eval, n_c=2, return_codes=True) is implemented here.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import jax
import jax.numpy as jnp
import optax

from facodec_tpu.losses import (
    discriminator_loss,
    generator_adv_losses,
    l1_loss,
    mel_spectrogram_loss,
    multi_scale_stft_loss,
)
from facodec_tpu.train.step import TrainState

REDECODER_GEN_KEYS = ("encoder", "decoder")
LAMBDA_MEL = 15.0


def _make_redecoder_parts(
    codec_models: Mapping[str, Any],
    codec_params: Mapping[str, Any],
    models: Mapping[str, Any],
):
    """Shared closures for the fused and split redecoder steps."""
    c_enc, c_qt = codec_models["encoder"], codec_models["quantizer"]
    redecoder, decoder = models["encoder"], models["decoder"]
    discriminator = models["discriminator"]

    def frozen_encode(batch):
        wave = batch["wave_seg"][:, :, None]
        z = c_enc.apply({"params": codec_params["encoder"]}, wave)
        _, _, _, _, timbre, codes = c_qt.apply(
            {"params": codec_params["quantizer"]}, z, batch["wave_seg"],
            n_c=2, full_waves=batch["full_waves"], wave_lens=batch["wave_lens"],
            return_codes=True,
        )
        return codes, timbre

    def gen_forward(gen_params, codes, timbre, rng):
        z = redecoder.apply(
            {"params": gen_params["encoder"]}, codes[0], codes[1], timbre,
            train=True, rngs={"dropout": rng},
        )
        # f32 at the loss boundary (FFT losses need f32; see train/step.py)
        return decoder.apply(
            {"params": gen_params["decoder"]}, z).astype(jnp.float32)

    def disc_loss_fn(disc_params, pred_wave, real_wave):
        d_fake = discriminator.apply({"params": disc_params}, pred_wave)
        d_real = discriminator.apply({"params": disc_params}, real_wave)
        return discriminator_loss(d_fake, d_real)

    def gen_loss_fn(pred_wave, disc_params, batch):
        real_wave = batch["wave_seg"][:, :, None]
        pw, rw = pred_wave[:, :, 0], real_wave[:, :, 0]
        mel_l = mel_spectrogram_loss(pw, rw)
        stft_l = multi_scale_stft_loss(pw, rw)
        wav_l = l1_loss(pw, rw)
        d_fake = discriminator.apply({"params": disc_params}, pred_wave)
        d_real = discriminator.apply({"params": disc_params}, real_wave)
        adv_l, feat_l = generator_adv_losses(d_fake, d_real)
        loss = mel_l * LAMBDA_MEL + feat_l + adv_l
        return loss, {
            "loss/gen_all": loss, "loss/mel": mel_l, "loss/stft": stft_l,
            "loss/wav_l1": wav_l, "loss/adv_g": adv_l, "loss/feature": feat_l,
        }

    return dict(frozen_encode=frozen_encode, gen_forward=gen_forward,
                disc_loss_fn=disc_loss_fn, gen_loss_fn=gen_loss_fn)


def make_redecoder_train_step(
    codec_models: Mapping[str, Any],
    codec_params: Mapping[str, Any],
    models: Mapping[str, Any],
    optimizers: Mapping[str, Any],
):
    """codec_models/params: frozen 'encoder' + 'quantizer' (stage='encoder');
    models: 'encoder' (Redecoder), 'decoder', 'discriminator'.

    batch: wave_seg (B, Tw), full_waves (B, Tmax), wave_lens (B,)."""
    parts = _make_redecoder_parts(codec_models, codec_params, models)
    frozen_encode = parts["frozen_encode"]
    gen_forward = parts["gen_forward"]
    disc_loss_fn = parts["disc_loss_fn"]
    gen_loss_fn = parts["gen_loss_fn"]

    def train_step(state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
        params, opt_states = dict(state.params), dict(state.opt_states)
        codes, timbre = frozen_encode(batch)
        codes = jax.lax.stop_gradient(codes)
        timbre = jax.lax.stop_gradient(timbre)

        gen_params = {k: params[k] for k in REDECODER_GEN_KEYS}
        pred_wave, gen_vjp = jax.vjp(
            lambda gp: gen_forward(gp, codes, timbre, rng), gen_params
        )
        real_wave = batch["wave_seg"][:, :, None]

        d_loss, d_grads = jax.value_and_grad(disc_loss_fn)(
            params["discriminator"], jax.lax.stop_gradient(pred_wave), real_wave
        )
        d_updates, opt_states["discriminator"] = optimizers["discriminator"].update(
            d_grads, state.opt_states["discriminator"], params["discriminator"]
        )
        params["discriminator"] = optax.apply_updates(params["discriminator"], d_updates)

        (g_loss, metrics), wave_ct = jax.value_and_grad(gen_loss_fn, has_aux=True)(
            pred_wave, params["discriminator"], batch
        )
        gen_grads = gen_vjp(wave_ct)[0]
        for key in REDECODER_GEN_KEYS:
            updates, opt_states[key] = optimizers[key].update(
                gen_grads[key], state.opt_states[key], params[key]
            )
            params[key] = optax.apply_updates(params[key], updates)

        metrics["loss/disc"] = d_loss
        return TrainState(params, opt_states, state.step + 1), metrics

    return train_step


def make_redecoder_train_step_split(
    codec_models: Mapping[str, Any],
    codec_params: Mapping[str, Any],
    models: Mapping[str, Any],
    optimizers: Mapping[str, Any],
    donate: bool = False,
):
    """The redecoder step compiled as THREE separate XLA modules (frozen
    codec encode / disc phase / gen phase) — same remedy, semantics and
    caveats as `make_codec_train_step_split` (train/step.py:337): the fused
    module at medium+ widths (frozen codec encode + 16-layer WN + decoder +
    full 5-period/3-fft discriminator fwd+bwd, 51.9 MB MLIR observed)
    reproducibly SIGKILLs this environment's memory-capped remote compile
    helper — and so did a two-way split that kept the codec encode inside
    each phase, hence the third module. Costs one extra no-grad generator
    forward in phase D (but encodes each batch once, not twice); the two
    phases' fakes are rng-identical but not bit-identical across the module
    boundary. Phase G's adversarial term runs against the UPDATED
    discriminator (reference train_redecoder.py ordering, like the codec
    step). Do NOT wrap the returned fn in jax.jit."""
    parts = _make_redecoder_parts(codec_models, codec_params, models)
    gen_forward = parts["gen_forward"]
    disc_loss_fn = parts["disc_loss_fn"]
    gen_loss_fn = parts["gen_loss_fn"]

    # the frozen codec encode is its OWN module: keeping the codec
    # encoder+quantizer out of both phase graphs is what actually shrinks
    # them below the compile helper's cap (a two-way split still SIGKILLed
    # at medium widths), and it encodes each batch once instead of twice
    encode_jit = jax.jit(
        lambda batch: jax.lax.stop_gradient(parts["frozen_encode"](batch))
    )

    def disc_phase(disc_params, disc_opt_state, gen_params, codes, timbre,
                   batch, rng):
        pred_wave = jax.lax.stop_gradient(
            gen_forward(gen_params, codes, timbre, rng)
        )
        real_wave = batch["wave_seg"][:, :, None]
        d_loss, d_grads = jax.value_and_grad(disc_loss_fn)(
            disc_params, pred_wave, real_wave
        )
        d_updates, new_opt = optimizers["discriminator"].update(
            d_grads, disc_opt_state, disc_params
        )
        return optax.apply_updates(disc_params, d_updates), new_opt, d_loss

    def gen_phase(gen_params, gen_opt_states, disc_params, codes, timbre,
                  batch, rng):
        def loss_fn(gp):
            pred_wave = gen_forward(gp, codes, timbre, rng)
            return gen_loss_fn(pred_wave, disc_params, batch)

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            gen_params
        )
        new_params, new_opts = {}, {}
        for key in REDECODER_GEN_KEYS:
            updates, new_opts[key] = optimizers[key].update(
                grads[key], gen_opt_states[key], gen_params[key]
            )
            new_params[key] = optax.apply_updates(gen_params[key], updates)
        return new_params, new_opts, metrics

    dkw = dict(donate_argnums=(0, 1)) if donate else {}
    disc_jit = jax.jit(disc_phase, **dkw)
    gen_jit = jax.jit(gen_phase, **dkw)

    def train_step(state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
        params, opt_states = dict(state.params), dict(state.opt_states)
        gen_params = {k: params[k] for k in REDECODER_GEN_KEYS}
        codes, timbre = encode_jit(batch)
        new_d, new_do, d_loss = disc_jit(
            params["discriminator"], opt_states["discriminator"],
            gen_params, codes, timbre, batch, rng,
        )
        params["discriminator"], opt_states["discriminator"] = new_d, new_do
        new_gp, new_go, metrics = gen_jit(
            gen_params, {k: opt_states[k] for k in REDECODER_GEN_KEYS},
            new_d, codes, timbre, batch, rng,
        )
        for key in REDECODER_GEN_KEYS:
            params[key], opt_states[key] = new_gp[key], new_go[key]
        metrics["loss/disc"] = d_loss
        return TrainState(params, opt_states, state.step + 1), metrics

    train_step.encode_jit = encode_jit
    train_step.disc_jit = disc_jit
    train_step.gen_jit = gen_jit
    return train_step
