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


def make_redecoder_train_step(
    codec_models: Mapping[str, Any],
    codec_params: Mapping[str, Any],
    models: Mapping[str, Any],
    optimizers: Mapping[str, Any],
):
    """codec_models/params: frozen 'encoder' + 'quantizer' (stage='encoder');
    models: 'encoder' (Redecoder), 'decoder', 'discriminator'.

    batch: wave_seg (B, Tw), full_waves (B, Tmax), wave_lens (B,)."""
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
