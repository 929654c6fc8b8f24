"""SPMD tests on the 8-virtual-device CPU mesh: DP batch sharding, dp x tp
(model-axis) parameter sharding of the wide heads, and agreement between the
sharded and single-device train steps."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from test_train_step import FRAMES, HOP, make_batch, tiny_models

from facodec_tpu.models.builder import init_params
from facodec_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from facodec_tpu.parallel.sharding import (
    apply_shardings,
    describe_shardings,
    tp_param_shardings,
)
from facodec_tpu.train.optimizers import build_optimizers, init_opt_states
from facodec_tpu.train.step import TrainState, make_codec_train_step


def _setup():
    models = tiny_models()
    params = init_params(models, jax.random.PRNGKey(0), seg_frames=FRAMES, batch=2)
    optimizers = build_optimizers(models.keys(), base_lr=1e-4)
    opt_states = init_opt_states(optimizers, params)
    step_fn = jax.jit(make_codec_train_step(models, optimizers))
    return models, params, opt_states, step_fn


def test_tp_rules_pick_wide_heads():
    models = tiny_models()
    params = init_params(models, jax.random.PRNGKey(0), seg_frames=FRAMES, batch=1)
    mesh = make_mesh(n_data=4, n_model=2)
    shardings = tp_param_shardings(params, mesh, min_elems=1024)
    desc = describe_shardings(shardings)
    # the speaker/phone heads and timbre projection are sharded over 'model'
    assert any("timbre_predictor" in k for k in desc), desc
    assert all(v == "PartitionSpec('model',%s)" % " None" for v in desc.values()) or all(
        "model" in v for v in desc.values()
    )
    # codebooks stay replicated
    assert not any("codebook" in k for k in desc)


def test_dp_inference_matches_single_device():
    """FACodec.shard_inference: batch encode/decode/VC sharded over the
    8-virtual-device data axis equals the single-device result. Batch 3
    exercises the pad-to-multiple-of-8 path (rows are independent, so the
    SPMD program computes identical per-row values)."""
    import os

    from facodec_tpu.api import FACodec, FARedecoder

    TINY = os.path.join(os.path.dirname(__file__), "tiny_config.yml")
    codec = FACodec.from_config(TINY, n_c=1)
    rng = np.random.default_rng(3)
    t = np.arange(24 * 300) / 24000.0
    wave = (0.3 * np.sin(2 * np.pi * np.array([[180.0], [220.0], [300.0]]) * t)
            + 0.01 * rng.standard_normal((3, len(t)))).astype(np.float32)

    f_ref = codec.encode(wave)
    y_ref = codec.decode(f_ref)
    r_ref = codec.reconstruct(wave)

    codec.shard_inference()  # default mesh: all 8 devices on the data axis
    f_dp = codec.encode(wave)
    for name in ("codes_p", "codes_c", "codes_r"):
        np.testing.assert_array_equal(getattr(f_dp, name), getattr(f_ref, name))
    np.testing.assert_allclose(f_dp.timbre, f_ref.timbre, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(codec.decode(f_dp), y_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(codec.reconstruct(wave), r_ref, rtol=1e-5, atol=1e-5)

    red = FARedecoder.from_config(TINY)
    timbre = f_ref.timbre
    v_ref = red.resynthesize(f_ref, timbre)
    red.shard_inference()
    np.testing.assert_allclose(
        red.resynthesize(f_ref, timbre), v_ref, rtol=1e-5, atol=1e-5
    )


@pytest.mark.slow
def test_dp_tp_step_matches_single_device():
    """One train step on a (4 data x 2 model) mesh == single-device step."""
    models, params, opt_states, step_fn = _setup()
    batch = make_batch(np.random.default_rng(0), batch=4)
    rng = jax.random.PRNGKey(1)

    # single-device reference
    state0 = TrainState(params, opt_states, jnp.zeros((), jnp.int32))
    ref_state, ref_metrics = step_fn(state0, batch, rng)

    # dp x tp
    mesh = make_mesh(n_data=4, n_model=2)
    shardings = tp_param_shardings(params, mesh, min_elems=1024)
    p2 = apply_shardings(params, shardings)
    o2 = replicate(mesh, opt_states)
    b2 = shard_batch(mesh, batch)
    with mesh:
        state1 = TrainState(p2, o2, jnp.zeros((), jnp.int32))
        got_state, got_metrics = step_fn(state1, b2, rng)
        jax.block_until_ready(got_metrics)

    for k in ref_metrics:
        np.testing.assert_allclose(
            float(got_metrics[k]), float(ref_metrics[k]), rtol=2e-3, atol=2e-4,
        )
    # spot-check a sharded param updated identically
    a = np.asarray(got_state.params["fa_predictors"]["timbre_predictor"]["weight"])
    b = np.asarray(ref_state.params["fa_predictors"]["timbre_predictor"]["weight"])
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-4)
