"""Training-step benchmark: full flagship GAN step (both phases, all five
modules, teachers offline) on one chip.

Prints one JSON line:
  {"metric": "train_step_ms", "value": N, "unit": "ms", "batch": B,
   "seg_frames": F, "audio_s_per_s": R}

audio_s_per_s = seconds of training audio consumed per wall-clock second —
the single-chip training throughput figure. Timing uses the chained-scan
methodology (see bench.py)."""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

SR, HOP = 24000, 300
ITERS = 4


def _cache():
    try:
        from facodec_tpu.utils.cache import enable_compile_cache

        enable_compile_cache()
    except Exception:
        pass


def main(batch: int = 4, seg_frames: int = 80):
    from facodec_tpu.models.builder import build_model, init_params
    from facodec_tpu.train.optimizers import build_optimizers, init_opt_states
    from facodec_tpu.train.step import TrainState, make_codec_train_step
    from facodec_tpu.utils.config import load_config

    cfg = load_config("/root/reference/configs/config.yml")
    models = build_model(cfg.model_params, "codec")
    params = init_params(models, jax.random.PRNGKey(0), seg_frames=8)
    optimizers = build_optimizers(models.keys(), base_lr=1e-4)
    opt_states = init_opt_states(optimizers, params)
    # FACODEC_TRAIN_PRECISION: float32 (default, reference-exact) |
    # bfloat16 | bfloat16_act (bf16 activations, f32 loss boundary —
    # loss-parity-tested in tests/test_precision.py). All precision x remat
    # configs fit one v5e (scripts/memory_budget.py, AOT memory_analysis);
    # measured round 3: 164.8 ms f32 / 165.4 ms bf16 — equal because
    # XLA's TPU default precision already runs 'f32' convs with bf16
    # operands (see BASELINE.md).
    prec = os.environ.get("FACODEC_TRAIN_PRECISION", "float32")
    remat = os.environ.get("FACODEC_TRAIN_REMAT", "0") == "1"
    # FACODEC_TRAIN_SPLIT=1|0: compile the two GAN phases as separate XLA
    # modules (train/step.py make_codec_train_step_split). Default: auto —
    # split at batch >= 8, the measured point where the fused module's
    # compile is SIGKILLed by this env's memory-capped remote compile helper
    # (BASELINE.md round 3); batches 5-7 keep whole-step fusion.
    split_env = os.environ.get("FACODEC_TRAIN_SPLIT", "")
    split = split_env == "1" if split_env else batch >= 8
    # FACODEC_TRAIN_PAIRED_G=0: phase G's two discriminator calls stay
    # separate B-sized passes instead of one concat(fake, real) 2B pass —
    # ~3 ms slower at batch 4 but halves phase G's discriminator activation
    # peak, the difference between fitting and OOM at large per-chip batch.
    paired_g = os.environ.get("FACODEC_TRAIN_PAIRED_G", "1") != "0"
    if split:
        from facodec_tpu.train.step import make_codec_train_step_split

        # donate=True is what makes batch 16 fit: it aliases each phase's
        # params+opt inputs to outputs instead of holding both copies
        # (~3.4 GiB) across the gen phase (see train/step.py).
        step_fn = make_codec_train_step_split(
            models, optimizers, precision=prec, remat=remat,
            paired_g=paired_g, donate=True,
        )
        jit_step = step_fn  # manages its own two jits — must NOT be re-jitted
    else:
        step_fn = make_codec_train_step(
            models, optimizers, precision=prec, remat=remat
        )
        jit_step = jax.jit(step_fn)

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
        full_waves=jnp.asarray(rng.standard_normal((batch, 2 * tw)) * 0.1, jnp.float32),
        wave_lens=jnp.asarray([2 * tw] * batch, jnp.int32),
    )
    state = TrainState(params, opt_states, jnp.zeros((), jnp.int32))

    # steps chain through the optimizer state, so dispatching ITERS steps and
    # forcing only the final metrics measures all of them + one tunnel RTT
    # (a lax.scan fusion would exceed the remote-compile size limit here).
    # The split step donates params+opt buffers, so `state` is dead after the
    # first call — every window chains from the running `st`.
    st, metrics = jit_step(state, batch_data, jax.random.PRNGKey(1))
    del state
    float(metrics["loss/gen_all"])  # warmup / compile

    key = jax.random.PRNGKey(2)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            key, sub = jax.random.split(key)
            st, metrics = jit_step(st, batch_data, sub)
        float(metrics["loss/gen_all"])
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / ITERS

    # ---- with the real input pipeline (host mel + segment crop + H2D),
    # prefetch-overlapped: steps/s should match the step-only figure (±10%)
    from facodec_tpu.train.data import (PseudoDataset, prefetch, segment_batch,
                                        shard_iterator)

    n_pipe = 3 * ITERS
    dur = 2 * tw / SR  # full_waves == 2*tw -> reuses the compiled program
    ds = PseudoDataset(length=(n_pipe + 2) * batch, seed=1, min_s=dur, max_s=dur)
    seg_rng = np.random.default_rng(0)

    def _prepare(b):
        s = segment_batch(b, max_frames=seg_frames, rng=seg_rng)
        return {k: jax.device_put(jnp.asarray(v)) for k, v in s.items()
                if k in batch_data}

    it = prefetch(shard_iterator(ds, batch, shuffle=False), _prepare, depth=2)
    first = next(it)  # shape warmup outside the timed window
    st, metrics = jit_step(st, first, jax.random.PRNGKey(3))
    float(metrics["loss/gen_all"])
    t0 = time.perf_counter()
    n_done = 0
    for seg in it:
        key, sub = jax.random.split(key)
        st, metrics = jit_step(st, seg, sub)
        n_done += 1
        if n_done >= n_pipe:
            break
    float(metrics["loss/gen_all"])
    dt_pipe = (time.perf_counter() - t0) / n_done

    audio_per_step = batch * seg_frames * HOP / SR
    print(json.dumps({
        "metric": "train_step_ms",
        "value": round(dt * 1e3, 1),
        "unit": "ms",
        "precision": prec,
        "remat": remat,
        "split": split,
        "paired_g": paired_g,
        "batch": batch,
        "seg_frames": seg_frames,
        "audio_s_per_s": round(audio_per_step / dt, 2),
        "pipeline_step_ms": round(dt_pipe * 1e3, 1),
        "pipeline_overhead_pct": round((dt_pipe / dt - 1) * 100, 1),
    }))


if __name__ == "__main__":
    import sys

    _cache()
    main(batch=int(sys.argv[1]) if len(sys.argv) > 1 else 4,
         seg_frames=int(sys.argv[2]) if len(sys.argv) > 2 else 80)
