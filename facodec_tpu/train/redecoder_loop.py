"""Stage-2 redecoder training loop (reference train_redecoder.py:43-449).

Loads a frozen codec (stage='encoder') from `pretrained_encoder`, builds the
redecoder stage, and runs the mel+adv GAN loop. Shares the checkpoint /
logging / mesh infrastructure with the codec loop."""

from __future__ import annotations

import math
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from facodec_tpu.models.builder import build_model, init_params
from facodec_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from facodec_tpu.train.data import PseudoDataset, segment_batch, shard_iterator
from facodec_tpu.train.loop import latest_checkpoint, load_checkpoint, save_checkpoint
from facodec_tpu.train.optimizers import build_optimizers, init_opt_states
from facodec_tpu.train.redecoder_step import make_redecoder_train_step
from facodec_tpu.train.step import TrainState
from facodec_tpu.utils.config import load_config


def run_redecoder_training(
    config_path: str,
    dataset=None,
    max_steps: Optional[int] = None,
    codec_models: Optional[Dict[str, Any]] = None,
    codec_params: Optional[Dict[str, Any]] = None,
    models: Optional[Dict[str, Any]] = None,
    log_dir: Optional[str] = None,
    log_writer=None,
) -> TrainState:
    cfg = load_config(config_path)
    log_dir = log_dir or cfg.get("log_dir", "runs/facodec_redecoder")
    os.makedirs(log_dir, exist_ok=True)

    if codec_models is None:
        codec_models = build_model(cfg.model_params, stage="encoder")
    if codec_params is None:
        codec_params = init_params(codec_models, jax.random.PRNGKey(1))
        pretrained = cfg.get("pretrained_encoder", "")
        if pretrained and os.path.exists(pretrained):
            from facodec_tpu.api import _load_params

            codec_params = _load_params(pretrained, codec_models, codec_params)
    if models is None:
        models = build_model(cfg.model_params, stage="redecoder")

    params = init_params(models, jax.random.PRNGKey(cfg.get("seed", 0)))
    optimizers = build_optimizers(models.keys(), base_lr=cfg.loss_params.base_lr)
    opt_states = init_opt_states(optimizers, params)
    state = TrainState(params, opt_states, jnp.zeros((), jnp.int32))

    start_epoch = 0
    resume = latest_checkpoint(log_dir)
    if resume:
        state, start_epoch = load_checkpoint(resume, state)

    batch_size = cfg.get("batch_size", 4)
    n_data = math.gcd(batch_size, jax.device_count())
    mesh = make_mesh(n_data=n_data)
    state = TrainState(replicate(mesh, state.params),
                       replicate(mesh, state.opt_states), state.step)
    codec_params = replicate(mesh, codec_params)
    if cfg.get("split_step", False):
        # two XLA modules — the remedy when the fused module trips the
        # remote compile helper's memory cap (HTTP 500 SIGKILL at medium+
        # widths; see make_redecoder_train_step_split / CLAUDE.md)
        from facodec_tpu.train.redecoder_step import (
            make_redecoder_train_step_split,
        )

        step_fn = make_redecoder_train_step_split(
            codec_models, codec_params, models, optimizers,
            donate=bool(cfg.get("donate_params", True)),
        )
    else:
        step_fn = jax.jit(
            make_redecoder_train_step(codec_models, codec_params, models, optimizers)
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
    rng = np.random.default_rng(cfg.get("seed", 0))
    key = jax.random.PRNGKey(cfg.get("seed", 0) + 1)
    done = False
    with mesh:
        for epoch in range(start_epoch, cfg.get("epochs", 1000)):
            for batch in shard_iterator(dataset, batch_size,
                                        rank=jax.process_index(),
                                        world_size=jax.process_count(),
                                        epoch=epoch):
                seg = segment_batch(batch, max_frames=max_frames, rng=rng)
                seg = {k: seg[k] for k in ("wave_seg", "full_waves", "wave_lens")}
                seg = shard_batch(mesh, seg)
                key, sub = jax.random.split(key)
                t0 = time.time()
                state, metrics = step_fn(state, seg, sub)
                step = int(state.step)
                if log_writer is not None and step % log_interval == 0:
                    jax.block_until_ready(metrics)
                    for k, v in metrics.items():
                        log_writer.add_scalar(f"train/{k}", float(v), step)
                    log_writer.add_scalar("train/time", time.time() - t0, step)
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
