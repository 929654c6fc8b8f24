"""The jitted codec GAN training step.

Functional re-design of the reference's two-phase loop body
(/root/reference/train.py:171-380):

  phase D: d(stop_grad(pred)), d(real) -> LS-GAN loss -> update discriminator
  phase G: spectral + adversarial (vs the *updated* discriminator, matching
           the reference's step ordering) + predictor + VQ losses -> update
           encoder / quantizer / decoder / fa_predictors

TPU-native structure: the generator forward runs ONCE per step via `jax.vjp`
— the pullback is held across the discriminator update and then invoked with
the generator-loss cotangents. (The reference gets this for free from
torch's retained autograd graph; a naive JAX port would re-run the
generator.) Both phases live in one jitted function, so XLA fuses the whole
step; under pjit the same function is the multi-chip data-parallel step with
gradient all-reduce inserted by the SPMD partitioner.

Teacher supervision (w2v CTC phonemes, speaker labels, raw F0) enters
through the batch — extracted offline by the data pipeline (or a JAX JDC) —
instead of hosting torch teacher models inside the loop (train.py:181-186,
340 does it inline, which is the reference's main throughput wart).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Mapping, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from facodec_tpu.losses import (
    discriminator_loss,
    focal_loss,
    generator_adv_losses,
    l1_loss,
    log_norm,
    mel_spectrogram_loss,
    multi_scale_stft_loss,
    smooth_l1_loss,
)
from facodec_tpu.losses.supervision import cross_entropy
from facodec_tpu.train.optimizers import GEN_KEYS
from facodec_tpu.train.targets import normalize_f0

# loss weights hard-coded by the reference (train.py:357-358)
LAMBDA_MEL = 15.0
LAMBDA_FEAT = 1.0
LAMBDA_ADV = 1.0
LAMBDA_COMMIT = 0.25
LAMBDA_CODEBOOK = 1.0
LAMBDA_F0 = 1.0
LAMBDA_UV = 1.0
LAMBDA_CONTENT = 5.0
LAMBDA_SPK = 1.0


class TrainState(NamedTuple):
    params: Dict[str, Any]
    opt_states: Dict[str, Any]
    step: jnp.ndarray


def make_codec_train_step(
    models: Mapping[str, Any],
    optimizers: Mapping[str, Any],
    remat: bool = False,
    precision: str = "float32",
    f0_teacher: Optional[Tuple[Any, Any]] = None,
):
    """Returns `train_step(state, batch, rng) -> (state, metrics)` ready for
    jax.jit / pjit.

    f0_teacher=(jdc_module, jdc_params) extracts F0 targets INLINE from the
    mel segment, fused into the jitted step — the reference's semantics
    (train.py:214-216 runs pitch_extractor per step under no_grad), viable
    here because the JDC teacher is a JAX model (models/jdc.py) rather than
    a torch module bounced through the host. When None, targets come
    pre-extracted through `batch["f0"]` (cli/extract_targets.py).

    remat=True wraps the generator forward in `jax.checkpoint`: activations
    are recomputed in the backward pass instead of stored — HBM for FLOPs,
    enabling longer segments / larger per-chip batches (the reference has no
    equivalent; torch would use checkpoint_sequential).

    precision="bfloat16" runs every matmul/conv (forward AND backward, both
    phases) with bf16 operands and f32 accumulation; params, optimizer state,
    losses and the VQ code path stay f32 (ops/precision.py). The int8
    policies are inference-only (round() has zero gradient) and rejected
    here.

    batch dict (all fixed-shape, segment cropping happens in the pipeline):
      wave_seg   (B, Tw)   24 kHz segment, Tw = frames * 300
      mel_seg    (B, F, 80) normalized log-mel of the segment
      f0         (B, F)    raw F0 Hz from the pitch teacher
      phone_ids  (B, F)    frame phoneme ids from the CTC teacher
      spk_labels (B,)      utterance speaker ids from the speaker teacher
      full_waves (B, Tmax) zero-padded full utterances (timbre encoder)
      wave_lens  (B,)      valid lengths of full_waves
    """
    parts = _make_parts(models, remat=remat, precision=precision,
                        f0_teacher=f0_teacher, paired_g=False)
    gen_forward = parts["gen_forward"]
    disc_loss_fn = parts["disc_loss_fn"]
    gen_loss_from_outputs = parts["gen_loss_from_outputs"]

    def train_step(state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
        from facodec_tpu.ops.precision import policy

        with policy(precision):
            return _train_step(state, batch, rng)

    def _train_step(state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
        params, opt_states = dict(state.params), dict(state.opt_states)

        gen_params = {k: params[k] for k in GEN_KEYS}
        gen_outs, gen_vjp = jax.vjp(
            lambda gp: gen_forward(gp, batch, rng), gen_params
        )
        pred_wave = gen_outs[0]
        real_wave = batch["wave_seg"][:, :, None]

        # -------- phase D
        d_loss, d_grads = jax.value_and_grad(disc_loss_fn)(
            params["discriminator"], jax.lax.stop_gradient(pred_wave), real_wave
        )
        d_updates, opt_states["discriminator"] = optimizers["discriminator"].update(
            d_grads, state.opt_states["discriminator"], params["discriminator"]
        )
        params["discriminator"] = optax.apply_updates(
            params["discriminator"], d_updates
        )

        # -------- phase G (adv term sees the updated discriminator)
        g_loss_fn = jax.checkpoint(gen_loss_from_outputs) if remat else gen_loss_from_outputs
        (g_loss, metrics), outs_ct = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(gen_outs, params["discriminator"], batch)
        gen_grads = gen_vjp(outs_ct)[0]

        for key in GEN_KEYS:
            updates, opt_states[key] = optimizers[key].update(
                gen_grads[key], state.opt_states[key], params[key]
            )
            params[key] = optax.apply_updates(params[key], updates)

        metrics["loss/disc"] = d_loss
        for key in GEN_KEYS:
            metrics[f"grad_norm/{key}"] = optax.global_norm(gen_grads[key])
        metrics["grad_norm/discriminator"] = optax.global_norm(d_grads)

        return TrainState(params, opt_states, state.step + 1), metrics

    return train_step


def _make_parts(
    models: Mapping[str, Any],
    remat: bool,
    precision: str,
    f0_teacher: Optional[Tuple[Any, Any]],
    paired_g: bool,
):
    """Shared closures of the fused and split step variants: the generator
    forward, the discriminator loss, and the generator loss-from-outputs.
    `paired_g=True` runs phase G's two discriminator calls as ONE pass over
    concat(fake, real) — same math (per-sample ops never mix batch rows),
    measured ~3 ms faster at batch 4, but it grows the traced module (see
    make_codec_train_step_split)."""
    if "int8" in str(precision):
        raise ValueError(
            f"precision={precision!r} is inference-only: the W8A8 round() "
            "has zero gradient, so training under it would silently stop "
            "updating the quantized convs. Use float32/bfloat16/bfloat16_act."
        )
    encoder, quantizer = models["encoder"], models["quantizer"]
    decoder, discriminator = models["decoder"], models["discriminator"]
    fa_predictors = models["fa_predictors"]

    def gen_forward(gen_params, batch, rng):
        r1, r2, r3 = jax.random.split(rng, 3)
        wave = batch["wave_seg"][:, :, None]
        z = encoder.apply({"params": gen_params["encoder"]}, wave)
        outs, quantized, commit, cb, timbre = quantizer.apply(
            {"params": gen_params["quantizer"]},
            z,
            batch["wave_seg"],
            n_c=2,
            full_waves=batch["full_waves"],
            wave_lens=batch["wave_lens"],
            train=True,
            rngs={"dropout": r1},
        )
        preds, rev_preds = fa_predictors.apply(
            {"params": gen_params["fa_predictors"]}, quantized, timbre,
            rngs={"dropout": r2},
        )
        pred_wave = decoder.apply({"params": gen_params["decoder"]}, outs)
        # f32 at the loss/discriminator boundary: the FFT losses require f32
        # input, and under bfloat16_act the memory win lives in the STORED
        # INTERNAL activations, not this (B, T, 1) output / the tiny heads
        f32 = lambda x: x.astype(jnp.float32) if (
            x is not None and jnp.issubdtype(x.dtype, jnp.floating)) else x
        return (f32(pred_wave), commit, cb,
                jax.tree.map(f32, preds), jax.tree.map(f32, rev_preds))

    if remat:
        gen_forward = jax.checkpoint(gen_forward)

    def disc_apply_pair(disc_params, fake_wave, real_wave):
        """One discriminator pass over concat(fake, real) split back into
        per-input fmap lists. Per-sample math (preprocess normalization, MPD
        reflect-pad, MRD STFT) never mixes batch rows, so this equals two
        separate calls — but MEASURED (scripts/bench_disc.py) one ensemble
        fwd+bwd at 2B costs 11.2 ms vs 20.3 ms for two at B=4: the training
        batch alone underfills the chip."""
        both = discriminator.apply(
            {"params": disc_params},
            jnp.concatenate([fake_wave, real_wave], axis=0),
        )
        B = fake_wave.shape[0]
        d_fake = [[f[:B] for f in fmaps] for fmaps in both]
        d_real = [[f[B:] for f in fmaps] for fmaps in both]
        return d_fake, d_real

    def disc_loss_fn(disc_params, pred_wave, real_wave):
        d_fake, d_real = disc_apply_pair(disc_params, pred_wave, real_wave)
        return discriminator_loss(d_fake, d_real)

    if remat:
        # the discriminator fmaps (period-folded 2D convs over raw 24 kHz
        # waves) dominate training memory; recompute them in backward too
        disc_loss_fn = jax.checkpoint(disc_loss_fn)

    def gen_loss_from_outputs(gen_outs, disc_params, batch):
        pred_wave, commit, cb, preds, rev_preds = gen_outs
        real_wave = batch["wave_seg"][:, :, None]

        # ---- spectral
        pw = pred_wave[:, :, 0]
        rw = real_wave[:, :, 0]
        mel_l = mel_spectrogram_loss(pw, rw)
        stft_l = multi_scale_stft_loss(pw, rw)
        wav_l = l1_loss(pw, rw)

        # ---- adversarial vs the UPDATED discriminator. In the FUSED step
        # phase G keeps TWO discriminator calls: pairing here as well is a
        # further ~3 ms (measured alone: 197.1 vs 200.5 ms), but pairing BOTH
        # phases in one module reproducibly OOM-kills the TPU compile helper
        # (3/3 SIGKILL) — phase D is where the win lives (169.5 ms), so the
        # fused G stays unpaired. The SPLIT step compiles phase G as its own
        # module, where the paired call fits.
        if paired_g:
            d_fake, d_real = disc_apply_pair(disc_params, pred_wave, real_wave)
        else:
            d_fake = discriminator.apply({"params": disc_params}, pred_wave)
            d_real = discriminator.apply({"params": disc_params}, real_wave)
        adv_l, feat_l = generator_adv_losses(d_fake, d_real)

        # ---- predictor supervision (+ gradient-reversal branches)
        if f0_teacher is not None:
            jdc_mod, jdc_params = f0_teacher
            f0_hz, _ = jdc_mod.apply({"params": jdc_params}, batch["mel_seg"])
            f0_hz = jax.lax.stop_gradient(f0_hz)  # teacher, never trained
        else:
            f0_hz = batch["f0"]
        f0_targets = normalize_f0(f0_hz)
        real_norm = log_norm(batch["mel_seg"])  # (B, F)

        T = min(preds["f0"].shape[1], f0_targets.shape[-1])
        f0_t = f0_targets[:, :T]
        uv_t = real_norm[:, :T]
        f0_l = smooth_l1_loss(preds["f0"][:, :T, 0], f0_t)
        uv_l = smooth_l1_loss(preds["uv"][:, :T, 0], uv_t)
        rev_f0_l = (
            smooth_l1_loss(rev_preds["rev_f0"][:, :T, 0], f0_t)
            if rev_preds["rev_f0"] is not None else 0.0
        )
        rev_uv_l = (
            smooth_l1_loss(rev_preds["rev_uv"][:, :T, 0], uv_t)
            if rev_preds["rev_uv"] is not None else 0.0
        )

        phone_t = batch["phone_ids"][:, :T]
        content_l = focal_loss(preds["content"][:, :T], phone_t)
        rev_content_l = (
            focal_loss(rev_preds["rev_content"][:, :T], phone_t)
            if rev_preds["rev_content"] is not None else 0.0
        )

        spk_l = cross_entropy(preds["timbre"], batch["spk_labels"])
        x_spk_l = (
            cross_entropy(rev_preds["x_timbre"], batch["spk_labels"])
            if rev_preds["x_timbre"] is not None else 0.0
        )

        loss = (
            mel_l * LAMBDA_MEL
            + feat_l * LAMBDA_FEAT
            + adv_l * LAMBDA_ADV
            + commit * LAMBDA_COMMIT
            + cb * LAMBDA_CODEBOOK
            + (f0_l + rev_f0_l) * LAMBDA_F0
            + (uv_l + rev_uv_l) * LAMBDA_UV
            + (content_l + rev_content_l) * LAMBDA_CONTENT
            + (spk_l + x_spk_l) * LAMBDA_SPK
        )
        metrics = {
            "loss/gen_all": loss,
            "loss/mel": mel_l,
            "loss/stft": stft_l,
            "loss/wav_l1": wav_l,
            "loss/adv_g": adv_l,
            "loss/feature": feat_l,
            "loss/commitment": commit,
            "loss/codebook": cb,
            "loss/f0": f0_l,
            "loss/uv": uv_l,
            "loss/rev_f0": rev_f0_l,
            "loss/rev_uv": rev_uv_l,
            "loss/content": content_l,
            "loss/rev_content": rev_content_l,
            "loss/spk": spk_l,
            "loss/rev_spk": x_spk_l,
        }
        return loss, metrics

    return dict(
        gen_forward=gen_forward,
        disc_loss_fn=disc_loss_fn,
        gen_loss_from_outputs=gen_loss_from_outputs,
    )


def make_codec_train_step_split(
    models: Mapping[str, Any],
    optimizers: Mapping[str, Any],
    remat: bool = False,
    precision: str = "float32",
    f0_teacher: Optional[Tuple[Any, Any]] = None,
    paired_g: bool = True,
    donate: bool = False,
):
    """The two-phase step compiled as TWO separate XLA modules.

    Same semantics as `make_codec_train_step` (phase D on the old
    discriminator, phase G's adversarial term against the UPDATED one —
    reference train.py:280-380 ordering), but each phase is its own
    `jax.jit`, at the cost of one extra no-grad generator forward in phase D
    (the fused step reuses a held `jax.vjp` pullback across both phases;
    a pullback cannot cross a jit boundary). The fake used by phase D is
    rng-identical to phase G's (same quantizer/predictor dropout masks), but
    only numerically equal up to XLA fusion differences — the two phases
    compile as separate modules, so the floats are not bit-identical.

    Why it exists: this environment's remote TPU compile helper is
    memory-capped — the FUSED module at batch >= 8, or with phase G's paired
    discriminator call, is reproducibly SIGKILLed at compile time
    (BASELINE.md round 3). Halving the traced module unblocks both: split
    mode compiles batch 8+ AND enables `paired_g` (one concat(fake, real)
    discriminator pass in phase G — measured ~3 ms at batch 4). Prefer the
    fused step when it compiles (one dispatch, whole-step fusion); use this
    for large per-chip batches.

    Returns `train_step(state, batch, rng) -> (state, metrics)`. Do NOT wrap
    it in jax.jit — it manages its own two jits (an outer jit would inline
    them back into one module, defeating the point).
    """
    from facodec_tpu.ops.precision import policy

    parts = _make_parts(models, remat=remat, precision=precision,
                        f0_teacher=f0_teacher, paired_g=paired_g)
    gen_forward = parts["gen_forward"]
    disc_loss_fn = parts["disc_loss_fn"]
    gen_loss_from_outputs = parts["gen_loss_from_outputs"]

    def disc_phase(disc_params, disc_opt_state, gen_params, batch, rng):
        with policy(precision):
            # full gen forward, but only pred_wave is used — XLA dead-code
            # eliminates the predictor heads from this module
            pred_wave = jax.lax.stop_gradient(
                gen_forward(gen_params, batch, rng)[0]
            )
            real_wave = batch["wave_seg"][:, :, None]
            d_loss, d_grads = jax.value_and_grad(disc_loss_fn)(
                disc_params, pred_wave, real_wave
            )
            d_updates, new_opt = optimizers["discriminator"].update(
                d_grads, disc_opt_state, disc_params
            )
            new_params = optax.apply_updates(disc_params, d_updates)
            return new_params, new_opt, d_loss, optax.global_norm(d_grads)

    def gen_phase(gen_params, gen_opt_states, disc_params, batch, rng):
        with policy(precision):
            def loss_fn(gp):
                outs = gen_forward(gp, batch, rng)
                g_fn = (jax.checkpoint(gen_loss_from_outputs) if remat
                        else gen_loss_from_outputs)
                return g_fn(outs, disc_params, batch)

            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(gen_params)
            new_params, new_opts = {}, {}
            for key in GEN_KEYS:
                updates, new_opts[key] = optimizers[key].update(
                    grads[key], gen_opt_states[key], gen_params[key]
                )
                new_params[key] = optax.apply_updates(gen_params[key], updates)
                metrics[f"grad_norm/{key}"] = optax.global_norm(grads[key])
            return new_params, new_opts, metrics

    # donate=True aliases each phase's params + opt-state inputs to its
    # outputs: without it, batch 16 holds BOTH copies of the generator's
    # ~3.4 GiB params+opt across the gen phase and OOMs the 16 GiB chip
    # (AOT: gen temp 5.1 GiB + args 3.61 + un-aliased out 3.43, measured
    # scripts/memory_budget_split.py). Off by default because donation
    # invalidates the caller's pre-step TrainState — parity tests reuse it.
    dkw = dict(donate_argnums=(0, 1)) if donate else {}
    disc_jit = jax.jit(disc_phase, **dkw)
    gen_jit = jax.jit(gen_phase, **dkw)

    def train_step(state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
        params, opt_states = dict(state.params), dict(state.opt_states)
        gen_params = {k: params[k] for k in GEN_KEYS}
        new_d, new_do, d_loss, d_gnorm = disc_jit(
            params["discriminator"], opt_states["discriminator"],
            gen_params, batch, rng,
        )
        params["discriminator"], opt_states["discriminator"] = new_d, new_do
        new_gp, new_go, metrics = gen_jit(
            gen_params, {k: opt_states[k] for k in GEN_KEYS}, new_d, batch, rng
        )
        for key in GEN_KEYS:
            params[key], opt_states[key] = new_gp[key], new_go[key]
        metrics["loss/disc"] = d_loss
        metrics["grad_norm/discriminator"] = d_gnorm
        return TrainState(params, opt_states, state.step + 1), metrics

    # expose the per-phase jits for AOT diagnostics
    # (scripts/memory_budget_split.py lowers each with .memory_analysis())
    train_step.disc_jit = disc_jit
    train_step.gen_jit = gen_jit
    return train_step
