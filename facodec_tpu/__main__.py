"""Unified CLI dispatcher.

    python -m facodec_tpu <command> [args]

Commands mirror the reference's entry points (reconstruct.py,
reconstruct_redecoder.py, dac/__main__.py, train.py, train_redecoder.py):

  reconstruct   codec round-trip on a wav
  convert       zero-shot voice conversion (codec + redecoder)
  encode        wav -> .fac code file
  decode        .fac -> wav
  train         codec GAN training
  train-redecoder  stage-2 redecoder training
  bench         one-chip round-trip benchmark (same as bench.py)
  validate      pretrained-checkpoint parity gate vs the torch reference
  serve         HTTP inference server (bucketed static shapes, warm start)
  export        AOT deployment artifact (serialized StableHLO programs)
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    from facodec_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    parser = argparse.ArgumentParser(prog="facodec_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    from facodec_tpu.cli import codec as codec_cli
    from facodec_tpu.cli import convert as convert_cli
    from facodec_tpu.cli import reconstruct as reconstruct_cli
    from facodec_tpu.cli import stream as stream_cli
    from facodec_tpu.cli import validate as validate_cli

    reconstruct_cli.add_args(sub.add_parser("reconstruct"))
    convert_cli.add_args(sub.add_parser("convert"))
    codec_cli.add_encode_args(sub.add_parser("encode"))
    codec_cli.add_decode_args(sub.add_parser("decode"))
    stream_cli.add_args(sub.add_parser("stream"))
    validate_cli.add_args(sub.add_parser("validate"))

    from facodec_tpu.cli import export_model as export_cli
    from facodec_tpu.cli import serve as serve_cli

    serve_cli.add_args(sub.add_parser("serve"))
    export_cli.add_args(sub.add_parser("export"))

    p_train = sub.add_parser("train")
    p_train.add_argument("--config-path", type=str, required=True)
    p_train.add_argument("--max-steps", type=int, default=None)

    p_train_red = sub.add_parser("train-redecoder")
    p_train_red.add_argument("--config-path", type=str, required=True)
    p_train_red.add_argument("--max-steps", type=int, default=None)

    sub.add_parser("bench")

    args = parser.parse_args(argv)
    if args.command == "reconstruct":
        return reconstruct_cli.main(args)
    if args.command == "convert":
        return convert_cli.main(args)
    if args.command == "encode":
        return codec_cli.main_encode(args)
    if args.command == "decode":
        return codec_cli.main_decode(args)
    if args.command == "stream":
        return stream_cli.main(args)
    if args.command == "validate":
        return validate_cli.main(args)
    if args.command == "serve":
        return serve_cli.main(args)
    if args.command == "export":
        return export_cli.main(args)
    if args.command == "train":
        from facodec_tpu.train.loop import run_training

        return run_training(args.config_path, max_steps=args.max_steps)
    if args.command == "train-redecoder":
        from facodec_tpu.train.redecoder_loop import run_redecoder_training

        return run_redecoder_training(args.config_path, max_steps=args.max_steps)
    if args.command == "bench":
        import runpy

        return runpy.run_path("bench.py", run_name="__main__")
    parser.error(f"unknown command {args.command}")


if __name__ == "__main__":
    sys.exit(0 if main() is not None else 1)
