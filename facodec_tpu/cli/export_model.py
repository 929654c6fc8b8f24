"""Export AOT deployment artifacts (StableHLO, utils/export.py).

    python -m facodec_tpu export --out artifact/ [--config-path ...]
        [--ckpt-path ...] [--batch 1] [--seconds 10] [--precision hybrid]
        [--platforms tpu]

One artifact per (batch, seconds) signature — the bucketed-serving model
(cli/serve.py). Load with `facodec_tpu.utils.export.ExportedCodec`.
"""

from __future__ import annotations


def add_args(p):
    from facodec_tpu.cli._io import DEFAULT_CONFIG

    p.add_argument("--out", required=True, help="artifact output directory")
    p.add_argument("--config-path", default=DEFAULT_CONFIG)
    p.add_argument("--ckpt-path", default=None)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--seconds", type=float, default=10.0)
    p.add_argument("--precision", default="hybrid",
                   choices=["float32", "hybrid", "bfloat16", "bfloat16_act"])
    p.add_argument("--platforms", nargs="*", default=None,
                   help="lowering platforms (default: current backend); "
                        "e.g. --platforms tpu to cross-export from a CPU host")
    return p


def main(args) -> int:
    from facodec_tpu.api import FACodec
    from facodec_tpu.utils.export import export_codec

    codec = FACodec.from_config(
        args.config_path, args.ckpt_path, precision=args.precision
    )
    sizes = export_codec(
        codec, args.out, batch=args.batch, seconds=args.seconds,
        platforms=args.platforms,
    )
    for name, n in sizes.items():
        print(f"  {name}: {n / 1e6:.2f} MB")
    print(f"artifact written to {args.out}")
    return 0
