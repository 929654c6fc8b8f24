"""Batch-1 round-trip RTF A/B: bf16 vs W8A8 int8 recurrent LSTM matmul.

Round-4 profile: at batch 1 the decoder SLSTM dominates (~10.8 ms of the
48.8 ms round trip) because its w_hh (1536ch -> 4H x H = 18.9 MB bf16)
overflows the 16 MB VMEM scoped stack and streams from HBM every scan step;
unroll sweeps showed XLA won't widen the reuse window past 8 steps
(scripts/bench_lstm_unroll.py). FACODEC_LSTM_INT8=1 quantizes exactly those
oversized w_hh to int8 (9.4 MB — VMEM-resident territory, and half the
traffic even if not resident); encoder layers (8.4 MB, already resident)
keep bf16. CPU numerics: max |diff| 1.6e-3 on rms-0.137 outputs over 64
flagship-width steps — bf16-rounding magnitude, no accumulation blow-up.

    python scripts/bench_lstm_int8.py [seconds] [batch]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")

from facodec_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

import bench  # noqa: E402  (repo-root bench.py: reuses its timing harness)


def main(seconds: float = 10.0, batch: float = 1):
    batch = int(batch)
    models, params = bench._build_models()
    out = {"metric": "lstm_int8_rtf_ab", "seconds": seconds, "batch": batch}
    prior = os.environ.get("FACODEC_LSTM_INT8")  # restore, don't clobber
    for tag, on in (("bf16", "0"), ("int8", "1")):
        os.environ["FACODEC_LSTM_INT8"] = on  # trace-time; each _timed_rtf jits fresh
        try:
            rtf, dt = bench._timed_rtf(models, params, batch, seconds, "hybrid")
        finally:
            if prior is None:
                os.environ.pop("FACODEC_LSTM_INT8", None)
            else:
                os.environ["FACODEC_LSTM_INT8"] = prior
        out[f"rtf_{tag}"] = round(rtf, 2)
        out[f"ms_{tag}"] = round(dt * 1e3, 2)
        print(f"lstm {tag:5s}: {rtf:7.2f}x RT  ({dt*1e3:.2f} ms / {seconds:.0f} s clip)",
              file=sys.stderr, flush=True)
    out["speedup"] = round(out["rtf_int8"] / out["rtf_bf16"], 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main(*[float(a) for a in sys.argv[1:]])
