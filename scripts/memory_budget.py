"""Written memory budget for the flagship GAN train step (VERDICT r2 weak
#2): AOT-compile the step for the attached TPU under each precision/remat
config and print XLA's memory analysis WITHOUT executing — so configs that
would RESOURCE_EXHAUST at runtime are diagnosed, not just observed crashing.

    python scripts/memory_budget.py [batch] [seg_frames]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from facodec_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

SR, HOP = 24000, 300


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

    tw = seg_frames * HOP
    rng = np.random.default_rng(0)
    batch_data = dict(
        wave_seg=jnp.zeros((batch, tw), jnp.float32),
        mel_seg=jnp.zeros((batch, seg_frames, 80), jnp.float32),
        f0=jnp.zeros((batch, seg_frames), jnp.float32),
        phone_ids=jnp.zeros((batch, seg_frames), jnp.int32),
        spk_labels=jnp.zeros((batch,), jnp.int32),
        full_waves=jnp.zeros((batch, 2 * tw), jnp.float32),
        wave_lens=jnp.asarray([2 * tw] * batch, jnp.int32),
    )
    state = TrainState(params, opt_states, jnp.zeros((), jnp.int32))
    key = jax.random.PRNGKey(1)

    print(f"batch={batch} seg_frames={seg_frames} "
          f"(reference training config: train.py:189, config.yml:9)")
    for prec in ("float32", "bfloat16", "bfloat16_act"):
        for remat in (False, True):
            step = make_codec_train_step(models, optimizers,
                                         precision=prec, remat=remat)
            tag = f"{prec:13s} remat={int(remat)}"
            try:
                compiled = jax.jit(step).lower(state, batch_data, key).compile()
                ma = compiled.memory_analysis()
                gb = 1 / 2**30
                print(f"{tag}: temp {ma.temp_size_in_bytes*gb:6.2f} GiB | "
                      f"args {ma.argument_size_in_bytes*gb:6.2f} | "
                      f"out {ma.output_size_in_bytes*gb:6.2f} | "
                      f"code {ma.generated_code_size_in_bytes/2**20:5.1f} MiB")
            except Exception as e:
                msg = str(e).replace("\n", " ")[:160]
                print(f"{tag}: COMPILE FAILED {type(e).__name__}: {msg}")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
