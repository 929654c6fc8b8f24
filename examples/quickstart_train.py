"""Quickstart: train the codec on your own data.

    # 1. build train/val manifests (filters by duration, 90/10 split)
    python -m facodec_tpu.cli.assemble_data --transcripts my_transcripts.txt

    # 2. extract teacher targets offline (JDC F0 / w2v phonemes / speaker)
    python -m facodec_tpu.cli.extract_targets --manifest data/train.txt \
        --jdc-ckpt modules/JDC/bst.t7

    # 3. train (reference config schema; add tensor_parallel / remat keys
    #    for multi-chip or memory-bound runs)
    python examples/quickstart_train.py --config configs/config.yml

This script is the programmatic equivalent of `python -m facodec_tpu train`.
With no manifest configured it falls back to PseudoDataset (random noise),
which exercises the full loop end-to-end like the reference's stand-in."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="/root/reference/configs/config.yml")
    p.add_argument("--max-steps", type=int, default=None)
    args = p.parse_args()

    from facodec_tpu.train.data import FileListDataset
    from facodec_tpu.train.loop import run_training
    from facodec_tpu.utils.config import load_config

    cfg = load_config(args.config)
    dataset = None
    train_manifest = cfg.get("data_params", {}).get("train_data", "")
    if train_manifest:
        import os

        if os.path.exists(train_manifest):
            dataset = FileListDataset(
                train_manifest, root=cfg.data_params.get("root_path", "")
            )
    state = run_training(args.config, dataset=dataset, max_steps=args.max_steps)
    print("finished at step", int(state.step))


if __name__ == "__main__":
    main()
