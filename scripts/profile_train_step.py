"""Op-level profile of the flagship GAN train step on the attached TPU.

Same workflow as profile_roundtrip.py, pointed at the training step: trace a
few already-compiled executions of `make_codec_train_step` (both phases) at
the reference training config (batch 4 x 1 s segments, train.py:171-380),
aggregate device time by op/fusion name, print the top sinks.

Usage:  [FACODEC_TRAIN_PRECISION=...] python scripts/profile_train_step.py
        [batch] [seg_frames]
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from facodec_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

from facodec_tpu.utils.profiling import aggregate_device_trace, trace  # noqa: E402

HOP = 300


def main(batch=4, seg_frames=80):
    from facodec_tpu.models.builder import build_model, init_params
    from facodec_tpu.train.optimizers import build_optimizers, init_opt_states
    from facodec_tpu.train.step import TrainState, make_codec_train_step
    from facodec_tpu.utils.config import load_config

    cfg = load_config("/root/reference/configs/config.yml")
    models = build_model(cfg.model_params, "codec")
    params = init_params(models, jax.random.PRNGKey(0), seg_frames=8)
    optimizers = build_optimizers(models.keys(), base_lr=1e-4)
    opt_states = init_opt_states(optimizers, params)
    prec = os.environ.get("FACODEC_TRAIN_PRECISION", "float32")
    remat = os.environ.get("FACODEC_TRAIN_REMAT", "0") == "1"
    step_fn = jax.jit(make_codec_train_step(models, optimizers,
                                            precision=prec, remat=remat))

    tw = seg_frames * HOP
    rng = np.random.default_rng(0)
    batch_data = dict(
        wave_seg=jnp.asarray(rng.standard_normal((batch, tw)) * 0.1, jnp.float32),
        mel_seg=jnp.asarray(rng.standard_normal((batch, seg_frames, 80)) * 0.5,
                            jnp.float32),
        f0=jnp.asarray(np.abs(rng.standard_normal((batch, seg_frames))) * 200,
                       jnp.float32),
        phone_ids=jnp.asarray(rng.integers(0, 1024, (batch, seg_frames)), jnp.int32),
        spk_labels=jnp.asarray(rng.integers(0, 20000, (batch,)), jnp.int32),
        full_waves=jnp.asarray(rng.standard_normal((batch, 2 * tw)) * 0.1,
                               jnp.float32),
        wave_lens=jnp.asarray([2 * tw] * batch, jnp.int32),
    )
    state = TrainState(params, opt_states, jnp.zeros((), jnp.int32))

    st, metrics = step_fn(state, batch_data, jax.random.PRNGKey(1))
    print("warm, gen_all:", float(metrics["loss/gen_all"]))

    with trace("/tmp/facodec_prof_train"):
        key = jax.random.PRNGKey(2)
        st = state
        for _ in range(3):
            key, sub = jax.random.split(key)
            st, metrics = step_fn(st, batch_data, sub)
        print("traced, gen_all:", float(metrics["loss/gen_all"]))
    aggregate_device_trace("/tmp/facodec_prof_train")


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 80
    main(b, s)
