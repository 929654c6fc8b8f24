"""Codec training loop: the TPU-native `train.py main()` equivalent
(/root/reference/train.py:42-488).

Differences by design (SURVEY.md §7):
  * teachers run OFFLINE (targets ship with the data; cli/extract_targets.py)
    instead of per-step torch inference;
  * the two-phase GAN update is one jitted function (train/step.py);
  * data parallelism is an SPMD mesh, not DDP (parallel/mesh.py);
  * checkpoints are Orbax pytrees with rotation ≤5 + glob auto-resume,
    mirroring the reference's FAcodec_epoch_*_step_*.pth pattern
    (train.py:124-151, 467-486);
  * TensorBoard scalars keep the reference's channel names so curves are
    directly comparable.
"""

from __future__ import annotations

import glob
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from facodec_tpu.models.builder import build_model, init_params
from facodec_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from facodec_tpu.train.data import (MelConfig, PseudoDataset, prefetch,
                                    segment_batch, shard_iterator)
from facodec_tpu.train.optimizers import build_optimizers, init_opt_states
from facodec_tpu.train.step import TrainState, make_codec_train_step
from facodec_tpu.utils.config import AttrDict, load_config


def save_checkpoint(ckpt_dir: str, state: TrainState, epoch: int, keep: int = 5) -> str:
    import orbax.checkpoint as ocp

    step = int(state.step)
    path = os.path.abspath(os.path.join(ckpt_dir, f"FAcodec_epoch_{epoch:05d}_step_{step:05d}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": state.params, "opt_states": state.opt_states,
                      "step": np.asarray(step), "epoch": np.asarray(epoch)})
    ckptr.wait_until_finished()
    # rotation: keep the newest `keep` (reference train.py:479-486)
    ckpts = sorted(glob.glob(os.path.join(ckpt_dir, "FAcodec_epoch_*_step_*")),
                   key=os.path.getmtime)
    for old in ckpts[:-keep]:
        import shutil

        shutil.rmtree(old, ignore_errors=True)
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    ckpts = sorted(glob.glob(os.path.join(ckpt_dir, "FAcodec_epoch_*_step_*")),
                   key=os.path.getmtime)
    return os.path.abspath(ckpts[-1]) if ckpts else None


def load_checkpoint(path: str, state: TrainState) -> tuple[TrainState, int]:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    template = {"params": state.params, "opt_states": state.opt_states,
                "step": np.asarray(0), "epoch": np.asarray(0)}
    restored = ckptr.restore(path, template)
    return (
        TrainState(restored["params"], restored["opt_states"],
                   jnp.asarray(restored["step"])),
        int(restored["epoch"]),
    )


def run_training(
    config_path: str,
    dataset=None,
    max_steps: Optional[int] = None,
    log_writer=None,
    models: Optional[Dict[str, Any]] = None,
    log_dir: Optional[str] = None,
) -> TrainState:
    """Train the codec per a reference-schema YAML config. `dataset` defaults
    to PseudoDataset (the reference's stand-in, meldataset.py:50-71);
    `models` overrides the factory (e.g. scaled-down configs in tests)."""
    cfg = load_config(config_path)
    log_dir = log_dir or cfg.get("log_dir", "runs/facodec_tpu")
    os.makedirs(log_dir, exist_ok=True)

    if models is None:
        models = build_model(cfg.model_params, stage="codec")
    params = init_params(models, jax.random.PRNGKey(cfg.get("seed", 0)))
    optimizers = build_optimizers(
        models.keys(), base_lr=cfg.loss_params.base_lr,
    )
    opt_states = init_opt_states(optimizers, params)
    state = TrainState(params, opt_states, jnp.zeros((), jnp.int32))

    start_epoch = 0
    resume = latest_checkpoint(log_dir)
    if resume:
        state, start_epoch = load_checkpoint(resume, state)
        print(f"resumed from {resume} (epoch {start_epoch}, step {int(state.step)})")

    batch_size = cfg.get("batch_size", 4)
    # the data axis must divide the global batch; use the largest compatible
    # device count (DDP's world_size constraint, meldataset.py:112-118).
    # `tensor_parallel: N` in the config additionally shards the wide heads
    # over a model axis (parallel/sharding.py) — a capability beyond the
    # reference's DDP-only strategy.
    import math as _math

    n_model = int(cfg.get("tensor_parallel", 1))
    n_data = _math.gcd(batch_size, jax.device_count() // n_model)
    mesh = make_mesh(n_data=n_data, n_model=n_model)
    if n_model > 1:
        from facodec_tpu.parallel.sharding import apply_shardings, tp_param_shardings

        p_shard = apply_shardings(state.params, tp_param_shardings(state.params, mesh))
    else:
        p_shard = replicate(mesh, state.params)
    state = TrainState(p_shard, replicate(mesh, state.opt_states), state.step)
    # inline F0 teacher (reference train.py:92, 214-216): when the config's
    # F0_path checkpoint exists, the JAX JDC runs inside the jitted step on
    # each mel segment — no offline pre-extraction needed for F0. Targets
    # from cli/extract_targets.py (batch["f0"]) are used otherwise.
    # `inline_f0: false` forces the offline path even when the blob exists —
    # ALSO the remedy if the grown step module trips the tunneled-TPU
    # compile helper's memory cap (HTTP 500 "subprocess exit signal
    # SIGKILL"; see CLAUDE.md: shrink/split the traced graph).
    f0_teacher = None
    f0_path = cfg.get("F0_path", "")
    if cfg.get("inline_f0", True) and f0_path and os.path.exists(f0_path):
        from facodec_tpu.models.jdc import JDCNet, load_jdc_checkpoint

        f0_teacher = (JDCNet(), load_jdc_checkpoint(f0_path))
        print(f"inline F0 teacher: {f0_path}")

    if cfg.get("split_step", False):
        # `split_step: true` — compile the two GAN phases as separate XLA
        # modules (one extra no-grad generator forward, paired-G disc call):
        # the remedy when the fused module exceeds a compile memory cap
        # (large per-chip batch, inline teachers) — see
        # train/step.py make_codec_train_step_split.
        from facodec_tpu.train.step import make_codec_train_step_split

        # donate: the loop discards the pre-step TrainState, so each phase's
        # params+opt buffers alias into the outputs — the ~3.4 GiB saving
        # that lets batch 16 fit one 16 GiB chip (see train/step.py). On
        # backends without donation (CPU) JAX ignores it with a warning.
        step_fn = make_codec_train_step_split(
            models, optimizers, remat=bool(cfg.get("remat", False)),
            f0_teacher=f0_teacher, donate=bool(cfg.get("donate_params", True)),
        )
    else:
        step_fn = jax.jit(
            make_codec_train_step(
                models, optimizers, remat=bool(cfg.get("remat", False)),
                f0_teacher=f0_teacher,
            )
        )

    if dataset is None:
        dataset = PseudoDataset(length=cfg.get("pseudo_dataset_len", 100))
    if log_writer is None:
        try:
            from tensorboardX import SummaryWriter

            log_writer = SummaryWriter(log_dir + "/tensorboard")
        except Exception:
            log_writer = None

    max_frames = cfg.get("max_len", 80)
    log_interval = cfg.get("log_interval", 10)
    save_interval = cfg.get("save_interval", 1000)
    # factorization audit cadence (reference train.py:428: 1000*log_interval)
    probe_interval = cfg.get("probe_interval", 1000 * log_interval)
    probe_fn = None
    rng = np.random.default_rng(cfg.get("seed", 0))
    key = jax.random.PRNGKey(cfg.get("seed", 0) + 1)

    n_hosts = jax.process_count()
    host = jax.process_index()
    done = False

    # host-side batch preparation (segment crop + device_put), run `prefetch`
    # batches ahead on a background thread so the device never waits for the
    # input pipeline (the reference's loop is fully synchronous,
    # train.py:177-212). bucket_frames quantizes padded shapes so jit
    # doesn't recompile per batch on real variable-length data.
    prefetch_depth = int(cfg.get("prefetch", 2))
    bucket_frames = int(cfg.get("bucket_frames", 80))  # 1 s buckets

    def _prepare(batch):
        seg = segment_batch(batch, max_frames=max_frames, rng=rng)
        seg = {
            "wave_seg": seg["wave_seg"], "mel_seg": seg["mel_seg"],
            "f0": seg["f0"], "phone_ids": seg["phone_ids"],
            "spk_labels": seg["spk_labels"],
            "full_waves": seg["full_waves"], "wave_lens": seg["wave_lens"],
        }
        return shard_batch(mesh, seg)

    with mesh:
        for epoch in range(start_epoch, cfg.get("epochs", 1000)):
            batches = shard_iterator(dataset, batch_size, rank=host,
                                     world_size=n_hosts, epoch=epoch,
                                     bucket_frames=bucket_frames)
            for seg in prefetch(batches, _prepare, depth=prefetch_depth):
                key, sub = jax.random.split(key)
                t0 = time.time()
                state, metrics = step_fn(state, seg, sub)
                step = int(state.step)
                if log_writer is not None and step % log_interval == 0:
                    jax.block_until_ready(metrics)
                    for k, v in metrics.items():
                        log_writer.add_scalar(f"train/{k}", float(v), step)
                    log_writer.add_scalar("train/time", time.time() - t0, step)
                if log_writer is not None and step % probe_interval == 0:
                    from facodec_tpu.train.probes import log_probe_audio, make_probe_fn

                    if probe_fn is None:
                        probe_fn = make_probe_fn(models)
                    audio = probe_fn(state.params, seg)
                    log_probe_audio(log_writer, audio, step)
                if step % save_interval == 0:
                    save_checkpoint(log_dir, state, epoch)
                if max_steps is not None and step >= max_steps:
                    done = True
                    break
            if done:
                break
            if (epoch + 1) % cfg.get("save_freq", 1) == 0:
                save_checkpoint(log_dir, state, epoch + 1)
    return state
