"""AOT memory analysis of the SPLIT GAN step's two phases (memory_budget.py
covers the fused step, which the remote compile helper cannot compile at
batch >= 8). Diagnoses which phase exceeds HBM at large per-chip batch and
by how much, without executing.

    python scripts/memory_budget_split.py [batch] [seg_frames]
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

SR, HOP = 24000, 300


def main(batch=16, seg_frames=80):
    from facodec_tpu.models.builder import build_model, init_params
    from facodec_tpu.train.optimizers import build_optimizers, init_opt_states
    from facodec_tpu.train.step import make_codec_train_step_split
    from facodec_tpu.utils.config import load_config

    cfg = load_config("/root/reference/configs/config.yml")
    models = build_model(cfg.model_params, "codec")
    params = init_params(models, jax.random.PRNGKey(0), seg_frames=8)
    optimizers = build_optimizers(models.keys(), base_lr=1e-4)
    opt_states = init_opt_states(optimizers, params)

    tw = seg_frames * HOP
    batch_data = dict(
        wave_seg=jnp.zeros((batch, tw), jnp.float32),
        mel_seg=jnp.zeros((batch, seg_frames, 80), jnp.float32),
        f0=jnp.zeros((batch, seg_frames), jnp.float32),
        phone_ids=jnp.zeros((batch, seg_frames), jnp.int32),
        spk_labels=jnp.zeros((batch,), jnp.int32),
        full_waves=jnp.zeros((batch, 2 * tw), jnp.float32),
        wave_lens=jnp.asarray([2 * tw] * batch, jnp.int32),
    )
    key = jax.random.PRNGKey(1)
    gb = 1 / 2**30

    prec = os.environ.get("FACODEC_TRAIN_PRECISION", "bfloat16_act")
    for remat in (False, True):
        for paired_g in (True, False):
            step = make_codec_train_step_split(
                models, optimizers, precision=prec, remat=remat,
                paired_g=paired_g,
            )
            # reach inside: the two jitted phases hang off the closure
            from facodec_tpu.train.step import GEN_KEYS

            gen_params = {k: params[k] for k in GEN_KEYS}
            gen_opts = {k: opt_states[k] for k in GEN_KEYS}
            disc_params = params["discriminator"]
            disc_opt = opt_states["discriminator"]
            tag = f"{prec} remat={int(remat)} paired_g={int(paired_g)}"
            for name, jitted, args in (
                ("disc", step.disc_jit,
                 (disc_params, disc_opt, gen_params, batch_data, key)),
                ("gen", step.gen_jit,
                 (gen_params, gen_opts, disc_params, batch_data, key)),
            ):
                try:
                    ma = jitted.lower(*args).compile().memory_analysis()
                    print(f"{tag} [{name:4s}]: temp "
                          f"{ma.temp_size_in_bytes * gb:6.2f} GiB | args "
                          f"{ma.argument_size_in_bytes * gb:5.2f} | out "
                          f"{ma.output_size_in_bytes * gb:5.2f} | code "
                          f"{ma.generated_code_size_in_bytes / 2**20:5.1f} MiB",
                          flush=True)
                except Exception as e:
                    msg = str(e).replace("\n", " ")[:140]
                    print(f"{tag} [{name:4s}]: FAILED {type(e).__name__}: "
                          f"{msg}", flush=True)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
