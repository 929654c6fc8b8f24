"""Training-loop smoke test: run a few steps end-to-end on PseudoDataset with
tiny models, save a checkpoint, resume from it, continue training."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_train_step import tiny_models  # reuse the scaled-down model set

from facodec_tpu.train.data import PseudoDataset
from facodec_tpu.train.loop import (
    latest_checkpoint,
    load_checkpoint,
    run_training,
    save_checkpoint,
)


@pytest.mark.slow
def test_loop_train_save_resume(tmp_path):
    log_dir = str(tmp_path / "run")
    ds = PseudoDataset(length=8, seed=0, min_s=1.0, max_s=1.5,
                       n_phones=32, n_speakers=16)

    state = run_training(
        "/root/reference/configs/config.yml",
        dataset=ds,
        max_steps=2,
        log_writer=False or None,
        models=tiny_models(),
        log_dir=log_dir,
    )
    assert int(state.step) == 2

    path = save_checkpoint(log_dir, state, epoch=0)
    assert latest_checkpoint(log_dir) == path

    restored, epoch = load_checkpoint(path, state)
    assert int(restored.step) == 2
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resume: run_training should pick up the checkpoint and continue
    state2 = run_training(
        "/root/reference/configs/config.yml",
        dataset=ds,
        max_steps=4,
        models=tiny_models(),
        log_dir=log_dir,
    )
    assert int(state2.step) == 4
