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


def build_interface(codec, redecoder=None, sr: int = 24000):
    try:
        import gradio as gr
    except ImportError as e:
        raise RuntimeError(
            "gradio is not installed; use the CLI instead: "
            "python -m facodec_tpu reconstruct|convert"
        ) from e

    def do_reconstruct(audio):
        in_sr, wave = audio
        wave = np.asarray(wave, np.float32)
        if wave.dtype.kind == "i":
            wave = wave / 32768.0
        if wave.ndim > 1:
            wave = wave.mean(axis=-1)
        out = codec.reconstruct(wave)[0]
        return (sr, (np.clip(out, -1, 1) * 32767).astype(np.int16))

    def do_convert(source, target):
        from facodec_tpu.api import convert_voice

        def prep(audio):
            _, w = audio
            w = np.asarray(w, np.float32)
            if w.dtype.kind == "i":
                w = w / 32768.0
            return w.mean(axis=-1) if w.ndim > 1 else w

        out = convert_voice(codec, redecoder, prep(source), prep(target))[0]
        return (sr, (np.clip(out, -1, 1) * 32767).astype(np.int16))

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
