"""Gradio demo UI (reference webui.py:54-116): two tabs — codec
reconstruction and zero-shot voice conversion.

Gated on gradio availability (not installed in restricted environments);
the same functionality is available headless through `python -m facodec_tpu
reconstruct|convert`.

    python -m facodec_tpu.webui --codec-ckpt ... --redecoder-ckpt ...
"""

from __future__ import annotations

import argparse

import numpy as np


def _prep_audio(audio, sr: int = 24000) -> np.ndarray:
    """Gradio (sample_rate, array) -> mono float32 in [-1, 1] at `sr`.

    Integer PCM is detected BEFORE any float cast (int16 is gradio's default
    but 24/32-bit files arrive as int32 and mic input can be uint8), scaled
    by its own dtype range, with unsigned types re-centered. A mismatched
    input rate is resampled through the julius-exact fractional resampler
    (ops/resample.py) instead of being silently misread."""
    in_sr, w = audio
    w = np.asarray(w)
    if w.dtype.kind == "u":
        info = np.iinfo(w.dtype)
        w = (w.astype(np.float32) - (info.max + 1) / 2.0) / ((info.max + 1) / 2.0)
    elif w.dtype.kind == "i":
        w = w.astype(np.float32) / (np.iinfo(w.dtype).max + 1.0)
    w = np.asarray(w, np.float32)
    if w.ndim > 1:
        w = w.mean(axis=-1)
    if in_sr and int(in_sr) != sr:
        from facodec_tpu.ops.resample import resample_frac

        w = np.asarray(resample_frac(w[None], int(in_sr), sr)[0], np.float32)
    return w


def make_handlers(codec, redecoder=None, sr: int = 24000):
    """The two tab callbacks, gradio-free so they are testable in
    environments without gradio (reference webui.py:54-88 inlines them)."""

    def do_reconstruct(audio):
        out = codec.reconstruct(_prep_audio(audio, sr))[0]
        return (sr, (np.clip(out, -1, 1) * 32767).astype(np.int16))

    def do_convert(source, target):
        from facodec_tpu.api import convert_voice

        out = convert_voice(
            codec, redecoder, _prep_audio(source, sr), _prep_audio(target, sr)
        )[0]
        return (sr, (np.clip(out, -1, 1) * 32767).astype(np.int16))

    return do_reconstruct, do_convert


def build_interface(codec, redecoder=None, sr: int = 24000):
    try:
        import gradio as gr
    except ImportError as e:
        raise RuntimeError(
            "gradio is not installed; use the CLI instead: "
            "python -m facodec_tpu reconstruct|convert"
        ) from e

    do_reconstruct, do_convert = make_handlers(codec, redecoder, sr)

    with gr.Blocks(title="FAcodec-TPU") as demo:
        with gr.Tab("Reconstruction"):
            inp = gr.Audio(label="Input")
            btn = gr.Button("Reconstruct")
            out = gr.Audio(label="Reconstructed")
            btn.click(do_reconstruct, inputs=inp, outputs=out)
        if redecoder is not None:
            with gr.Tab("Voice Conversion"):
                src = gr.Audio(label="Source (content)")
                tgt = gr.Audio(label="Target (timbre)")
                vbtn = gr.Button("Convert")
                vout = gr.Audio(label="Converted")
                vbtn.click(do_convert, inputs=[src, tgt], outputs=vout)
    return demo


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--codec-ckpt", type=str, default=None)
    p.add_argument("--codec-config", type=str, default=None)
    p.add_argument("--redecoder-ckpt", type=str, default=None)
    p.add_argument("--redecoder-config", type=str, default=None)
    p.add_argument("--port", type=int, default=7860)
    args = p.parse_args(argv)

    from facodec_tpu.api import FACodec, FARedecoder
    from facodec_tpu.cli._io import DEFAULT_CONFIG, DEFAULT_REDECODER_CONFIG

    codec = FACodec.from_config(args.codec_config or DEFAULT_CONFIG, args.codec_ckpt)
    red = None
    if args.redecoder_ckpt or args.redecoder_config:
        red = FARedecoder.from_config(
            args.redecoder_config or DEFAULT_REDECODER_CONFIG, args.redecoder_ckpt
        )
    build_interface(codec, red).launch(server_port=args.port)


if __name__ == "__main__":
    main()
