"""Redecoder (stage-2) training at codec-loop test depth (VERDICT r2 weak
#7): overfit on a fixed batch, seed determinism, Orbax save/resume — the
three properties test_train_step.py / test_train_loop.py pin for the codec
loop, mirrored for train/redecoder_step.py + train/redecoder_loop.py
(reference /root/reference/train_redecoder.py:43-449).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from facodec_tpu.models.builder import init_params
from facodec_tpu.models.dac import Decoder, Encoder
from facodec_tpu.models.discriminator import Discriminator
from facodec_tpu.models.fa_quantizer import FAquantizer
from facodec_tpu.models.redecoder import Redecoder
from facodec_tpu.train.optimizers import build_optimizers, init_opt_states
from facodec_tpu.train.redecoder_step import make_redecoder_train_step
from facodec_tpu.train.step import TrainState

FRAMES = 4
HOP = 300
B = 2


def tiny_codec():
    """Frozen stage-'encoder' pair (codec encoder + quantizer)."""
    return dict(
        encoder=Encoder(d_model=8, strides=(15, 20), d_latent=64, causal=True,
                        lstm=1),
        quantizer=FAquantizer(
            in_dim=64, n_p_codebooks=1, n_c_codebooks=2, n_t_codebooks=2,
            n_r_codebooks=3, codebook_size=32, codebook_dim=4,
            quantizer_dropout=0.5, causal=True, separate_prosody_encoder=True,
            timbre_norm=True, style_hidden_dim=32, prosody_hidden_dim=16,
        ),
    )


def tiny_redecoder_models():
    return dict(
        encoder=Redecoder(n_p_codebooks=1, n_c_codebooks=2, codebook_size=32,
                          embed_dim=16, n_layers=2, causal=True, p_dropout=0.2,
                          gin_channels=64, out_dim=64),
        decoder=Decoder(input_channel=64, channels=16, rates=(20, 15),
                        causal=True, lstm=1),
        discriminator=Discriminator(rates=(), periods=(2,), fft_sizes=(512,),
                                    sample_rate=24000),
    )


def make_batch(rng, batch=B):
    tw = FRAMES * HOP
    return dict(
        wave_seg=jnp.asarray(rng.standard_normal((batch, tw)) * 0.3, jnp.float32),
        full_waves=jnp.asarray(rng.standard_normal((batch, 2 * tw)) * 0.3,
                               jnp.float32),
        wave_lens=jnp.asarray([2 * tw] * batch, jnp.int32),
    )


@pytest.fixture(scope="module")
def setup():
    codec_models = tiny_codec()
    codec_params = init_params(codec_models, jax.random.PRNGKey(1),
                               seg_frames=FRAMES, batch=B)
    models = tiny_redecoder_models()
    params = init_params(models, jax.random.PRNGKey(0), seg_frames=FRAMES,
                         batch=B)
    return codec_models, codec_params, models, params


@pytest.mark.slow
def test_redecoder_overfit_single_batch(setup):
    """30 steps on one fixed batch with a raised LR: the mel loss must drop
    substantially — stage-2 training learns, not just runs."""
    codec_models, codec_params, models, params = setup
    optimizers = build_optimizers(models.keys(), base_lr=5e-4)
    opt_states = init_opt_states(optimizers, params)
    step_fn = jax.jit(make_redecoder_train_step(
        codec_models, codec_params, models, optimizers))

    batch = make_batch(np.random.default_rng(7))
    state = TrainState(params, opt_states, jnp.zeros((), jnp.int32))
    key = jax.random.PRNGKey(3)
    first = last = None
    for i in range(30):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, batch, sub)
        mel = float(metrics["loss/mel"])
        if i == 0:
            first = mel
        last = mel
    assert np.isfinite(last)
    assert last < 0.7 * first, f"mel loss did not drop: {first:.3f} -> {last:.3f}"
    # both phases updated their modules
    for k in ("encoder", "decoder", "discriminator"):
        before = jax.tree.leaves(params[k])
        after = jax.tree.leaves(state.params[k])
        assert any(not np.allclose(np.asarray(a), np.asarray(b))
                   for a, b in zip(after, before)), k


@pytest.mark.slow
def test_redecoder_training_deterministic(setup, tmp_path):
    """Same seed, same data -> bit-identical params across two loop runs
    (explicit jax.random keys end to end; no hidden global RNG)."""
    from facodec_tpu.train.data import PseudoDataset
    from facodec_tpu.train.redecoder_loop import run_redecoder_training

    codec_models, codec_params, models, _ = setup
    tiny = str(__import__("pathlib").Path(__file__).parent / "tiny_config.yml")

    def run(tag):
        ds = PseudoDataset(length=4, seed=3, min_s=1.0, max_s=1.3,
                           n_phones=32, n_speakers=16)
        return run_redecoder_training(
            tiny, dataset=ds, max_steps=2,
            codec_models=codec_models, codec_params=codec_params,
            models=models, log_dir=str(tmp_path / tag),
        )

    s1 = run("a")
    s2 = run("b")
    for x, y in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_redecoder_loop_save_resume(setup, tmp_path):
    """Checkpoint round-trip + glob-resume, like the codec loop's
    (reference crash-and-restart pattern, train_redecoder.py resume)."""
    from facodec_tpu.train.data import PseudoDataset
    from facodec_tpu.train.loop import (latest_checkpoint, load_checkpoint,
                                        save_checkpoint)
    from facodec_tpu.train.redecoder_loop import run_redecoder_training

    codec_models, codec_params, models, _ = setup
    tiny = str(__import__("pathlib").Path(__file__).parent / "tiny_config.yml")
    log_dir = str(tmp_path / "red")
    ds = PseudoDataset(length=4, seed=0, min_s=1.0, max_s=1.4,
                       n_phones=32, n_speakers=16)

    state = run_redecoder_training(
        tiny, dataset=ds, max_steps=2,
        codec_models=codec_models, codec_params=codec_params, models=models,
        log_dir=log_dir,
    )
    assert int(state.step) == 2

    path = save_checkpoint(log_dir, state, epoch=0)
    assert latest_checkpoint(log_dir) == path
    restored, _ = load_checkpoint(path, state)
    assert int(restored.step) == 2
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resume: the loop picks up the newest checkpoint and continues
    state2 = run_redecoder_training(
        tiny, dataset=ds, max_steps=4,
        codec_models=codec_models, codec_params=codec_params, models=models,
        log_dir=log_dir,
    )
    assert int(state2.step) == 4


@pytest.mark.slow
def test_redecoder_split_step_matches_fused(setup):
    """make_redecoder_train_step_split (two jitted phases, extra no-grad
    generator forward) produces the same update as the fused step — same
    tolerance rationale as the codec's test_split_step_matches_fused:
    metrics tight, params within 2x the step-1 AdamW move (sign flips on
    noise-level grads across different XLA modules)."""
    from facodec_tpu.train.redecoder_step import make_redecoder_train_step_split

    codec_models, codec_params, models, params = setup
    optimizers = build_optimizers(models.keys(), base_lr=1e-4)
    opt_states = init_opt_states(optimizers, params)
    batch = make_batch(np.random.default_rng(11))
    rng = jax.random.PRNGKey(5)
    s0 = TrainState(params, opt_states, jnp.zeros((), jnp.int32))

    fused = jax.jit(make_redecoder_train_step(
        codec_models, codec_params, models, optimizers))
    s_a, m_a = fused(s0, batch, rng)
    split = make_redecoder_train_step_split(
        codec_models, codec_params, models, optimizers)
    s_b, m_b = split(s0, batch, rng)

    assert int(s_b.step) == 1
    for k in m_a:
        np.testing.assert_allclose(
            float(m_b[k]), float(m_a[k]), rtol=2e-4, atol=1e-5,
            err_msg=f"metric {k}",
        )
    lr_atol = 2.5e-4  # 2.5 x base_lr
    for mod in s_a.params:
        for x, y in zip(jax.tree.leaves(s_a.params[mod]),
                        jax.tree.leaves(s_b.params[mod])):
            np.testing.assert_allclose(
                np.asarray(y), np.asarray(x), rtol=2e-4, atol=lr_atol,
                err_msg=f"params {mod}",
            )
