"""End-to-end tests for the user API (FACodec/FARedecoder), the .fac code
file format, and the CLI commands — on the tiny reference-schema config."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

TINY = os.path.join(os.path.dirname(__file__), "tiny_config.yml")
SR, HOP = 24000, 300


def tone(seconds=0.6, hz=220.0, seed=0):
    t = np.arange(int(seconds * SR)) / SR
    rng = np.random.default_rng(seed)
    return (0.4 * np.sin(2 * np.pi * hz * t) + 0.02 * rng.standard_normal(len(t))
            ).astype(np.float32)


@pytest.fixture(scope="module")
def codec():
    from facodec_tpu.api import FACodec

    return FACodec.from_config(TINY, n_c=2)


def test_codec_file_roundtrip(tmp_path):
    from facodec_tpu.codec_file import FACodecFile

    rng = np.random.default_rng(0)
    f = FACodecFile(
        codes_p=rng.integers(0, 32, (1, 1, 10)).astype(np.uint16),
        codes_c=rng.integers(0, 32, (1, 2, 10)).astype(np.uint16),
        codes_r=rng.integers(0, 32, (1, 3, 10)).astype(np.uint16),
        timbre=rng.standard_normal((1, 64)).astype(np.float32),
        original_length=3000,
        metadata=dict(source="test.wav"),
    )
    path = f.save(str(tmp_path / "x.fac"))
    g = type(f).load(path)
    np.testing.assert_array_equal(g.codes_p, f.codes_p)
    np.testing.assert_array_equal(g.codes_c, f.codes_c)
    np.testing.assert_array_equal(g.codes_r, f.codes_r)
    np.testing.assert_allclose(g.timbre, f.timbre)
    assert g.original_length == 3000
    assert g.metadata["source"] == "test.wav"


def test_api_encode_decode_reconstruct(codec):
    wave = tone()
    f = codec.encode(wave)
    frames = len(wave) // HOP
    assert f.codes_p.shape == (1, 1, frames)
    assert f.codes_c.shape == (1, 2, frames)
    assert f.codes_r.shape == (1, 3, frames)
    assert f.timbre.shape[1] == 64

    out = codec.decode(f)
    assert out.shape == (1, f.original_length)
    assert np.isfinite(out).all()

    # decode-from-codes == reconstruct (round-trip through outs) in eval:
    recon = codec.reconstruct(wave)
    np.testing.assert_allclose(out, recon[:, : out.shape[1]], rtol=2e-4, atol=2e-4)

    # dropping the residual stream still decodes (different wave)
    out_nr = codec.decode(f, use_residual=False)
    assert np.isfinite(out_nr).all()
    assert not np.allclose(out_nr, out)


def test_api_voice_conversion():
    from facodec_tpu.api import FACodec, FARedecoder, convert_voice

    codec = FACodec.from_config(TINY, n_c=1)
    red = FARedecoder.from_config(TINY)
    src, tgt = tone(0.5, 220.0, 1), tone(0.5, 330.0, 2)
    out = convert_voice(codec, red, src, tgt)
    assert out.shape[1] == len(src) // HOP * HOP
    assert np.isfinite(out).all()


def test_cli_reconstruct_encode_decode(tmp_path, monkeypatch):
    from scipy.io import wavfile

    from facodec_tpu.__main__ import main

    src = str(tmp_path / "in.wav")
    wavfile.write(src, SR, (tone(0.5) * 32767).astype(np.int16))
    monkeypatch.setenv("FACODEC_CONFIG", TINY)
    monkeypatch.chdir(tmp_path)
    # reload _io to pick up the env default
    import importlib

    import facodec_tpu.cli._io as _io

    importlib.reload(_io)

    out = main(["reconstruct", "--source", src, "--config-path", TINY,
                "--output", str(tmp_path / "rec.wav")])
    assert os.path.exists(out)
    sr, data = wavfile.read(out)
    assert sr == SR and len(data) > 0

    fac = main(["encode", "--input", src, "--config-path", TINY,
                "--output", str(tmp_path / "x.fac")])
    assert os.path.exists(fac)
    wav = main(["decode", "--input", fac, "--config-path", TINY,
                "--output", str(tmp_path / "dec.wav")])
    assert os.path.exists(wav)
    sr2, data2 = wavfile.read(wav)
    assert sr2 == SR and len(data2) == len(tone(0.5)) // HOP * HOP


def test_redecoder_train_step_runs():
    from facodec_tpu.models.builder import build_model, init_params
    from facodec_tpu.train.optimizers import build_optimizers, init_opt_states
    from facodec_tpu.train.redecoder_step import make_redecoder_train_step
    from facodec_tpu.train.step import TrainState
    from facodec_tpu.utils.config import load_config

    cfg = load_config(TINY)
    codec_models = build_model(cfg.model_params, "encoder")
    codec_params = init_params(codec_models, jax.random.PRNGKey(1), seg_frames=4)
    models = build_model(cfg.model_params, "redecoder")
    # shrink the discriminator for test speed
    from facodec_tpu.models.discriminator import Discriminator

    models["discriminator"] = Discriminator(
        rates=(), periods=(2,), fft_sizes=(512,), sample_rate=SR
    )
    params = init_params(models, jax.random.PRNGKey(0), seg_frames=4)
    optimizers = build_optimizers(models.keys())
    opt_states = init_opt_states(optimizers, params)
    step_fn = jax.jit(make_redecoder_train_step(codec_models, codec_params,
                                                models, optimizers))

    rng = np.random.default_rng(0)
    tw = 4 * HOP
    batch = dict(
        wave_seg=jnp.asarray(rng.standard_normal((2, tw)) * 0.3, jnp.float32),
        full_waves=jnp.asarray(rng.standard_normal((2, 2 * tw)) * 0.3, jnp.float32),
        wave_lens=jnp.asarray([2 * tw] * 2, jnp.int32),
    )
    state = TrainState(params, opt_states, jnp.zeros((), jnp.int32))
    state2, metrics = step_fn(state, batch, jax.random.PRNGKey(2))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    for key in ("encoder", "decoder", "discriminator"):
        before = jax.tree.leaves(state.params[key])
        after = jax.tree.leaves(state2.params[key])
        assert any(not np.allclose(np.asarray(a), np.asarray(b))
                   for a, b in zip(after, before)), key


def test_evaluate_cli(tmp_path):
    from scipy.io import wavfile

    from facodec_tpu.cli.evaluate import main as eval_main

    wav = str(tmp_path / "a.wav")
    wavfile.write(wav, SR, (tone(0.4) * 32767).astype(np.int16))
    manifest = str(tmp_path / "val.txt")
    with open(manifest, "w") as f:
        f.write(f"{wav}\t0\ten\ttext\tphones\n")
    out_json = str(tmp_path / "eval.json")
    rc = eval_main(["--manifest", manifest, "--config-path", TINY,
                    "--json", out_json])
    assert rc == 0
    import json

    data = json.load(open(out_json))
    assert np.isfinite(data["aggregate"]["mel_l1"])
    assert 0 < data["utterances"][0]["code_usage"]["content"] <= 1
    # quality scorecard keys (VERDICT item 9): SI-SDR/STOI + disentanglement
    utt = data["utterances"][0]
    assert np.isfinite(utt["si_sdr_db"])
    assert "stoi" in utt and "f0_corr_prosody" in utt and "f0_corr_content" in utt
    assert np.isfinite(utt["mcd_db"]) and utt["mcd_db"] > 0.0


def test_extract_targets_hard_fails_without_teachers(tmp_path):
    """A requested-but-unavailable teacher is a hard error (exit 2): training
    must never silently consume zero labels (reference train.py:91-101 runs
    the teachers unconditionally)."""
    from scipy.io import wavfile

    from facodec_tpu.cli.extract_targets import main as et_main

    wav = str(tmp_path / "b.wav")
    wavfile.write(wav, SR, (tone(0.4) * 32767).astype(np.int16))
    manifest = str(tmp_path / "train.txt")
    with open(manifest, "w") as f:
        f.write(f"{wav}\t7\ten\ttext\tphones\n")
    # zero-egress env: jdc ckpt missing, w2v/titanet undownloadable -> abort
    rc = et_main(["--manifest", manifest])
    assert rc == 2
    assert not (tmp_path / "b.wav.targets.npz").exists()


def test_extract_targets_explicit_optout(tmp_path):
    """--allow-missing makes degradation explicit: zero f0/phones, manifest
    sid speaker fallback."""
    from scipy.io import wavfile

    from facodec_tpu.cli.extract_targets import main as et_main

    wav = str(tmp_path / "b.wav")
    wavfile.write(wav, SR, (tone(0.4) * 32767).astype(np.int16))
    manifest = str(tmp_path / "train.txt")
    with open(manifest, "w") as f:
        f.write(f"{wav}\t7\ten\ttext\tphones\n")
    rc = et_main(["--manifest", manifest, "--allow-missing", "jdc,w2v,titanet"])
    assert rc == 0
    tgt = np.load(wav + ".targets.npz")
    frames = len(tone(0.4)) // HOP
    assert tgt["f0"].shape == (frames,)
    assert int(tgt["spk_label"]) == 7

    # the dataset picks the targets up
    from facodec_tpu.train.data import FileListDataset

    ds = FileListDataset(manifest)
    item = ds[0]
    assert int(item["spk_label"]) == 7


def test_extract_targets_real_w2v_path(tmp_path):
    """Drive the REAL wav2vec2-CTC teacher code (transformers inference,
    24k->16k resample, CTC argmax, nearest-frame interp — reference
    train.py:95-97, 181-186) end-to-end against a tiny random-init model
    saved locally, proving the pipeline needs no network to be validated."""
    transformers = pytest.importorskip("transformers")
    import json as _json

    from scipy.io import wavfile

    from facodec_tpu.cli.extract_targets import main as et_main

    # tiny random Wav2Vec2ForCTC + processor, fully offline
    mdir = tmp_path / "w2v_tiny"
    mdir.mkdir()
    vocab = {c: i for i, c in enumerate("<pad> a b c d e f g".split())}
    with open(mdir / "vocab.json", "w") as f:
        _json.dump(vocab, f)
    tok = transformers.Wav2Vec2CTCTokenizer(
        str(mdir / "vocab.json"), pad_token="<pad>")
    fe = transformers.Wav2Vec2FeatureExtractor(
        feature_size=1, sampling_rate=16000, padding_value=0.0,
        do_normalize=True, return_attention_mask=False)
    transformers.Wav2Vec2Processor(feature_extractor=fe, tokenizer=tok
                                   ).save_pretrained(str(mdir))
    cfg = transformers.Wav2Vec2Config(
        vocab_size=len(vocab), hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64,
        conv_dim=(16, 16, 16, 16, 16, 16, 16))
    transformers.Wav2Vec2ForCTC(cfg).save_pretrained(str(mdir))

    wav = str(tmp_path / "c.wav")
    wavfile.write(wav, SR, (tone(0.5) * 32767).astype(np.int16))
    manifest = str(tmp_path / "train.txt")
    with open(manifest, "w") as f:
        f.write(f"{wav}\t3\ten\ttext\tphones\n")
    rc = et_main(["--manifest", manifest, "--teachers", "w2v",
                  "--w2v-model", str(mdir)])
    assert rc == 0
    tgt = np.load(wav + ".targets.npz")
    frames = len(tone(0.5)) // HOP
    assert tgt["phone_ids"].shape == (frames,)
    assert tgt["phone_ids"].dtype == np.int32
    # real CTC argmax over a random model: ids land in-vocab
    assert tgt["phone_ids"].min() >= 0
    assert tgt["phone_ids"].max() < len(vocab)


def test_extract_targets_real_titanet_path(tmp_path):
    """Drive the REAL speaker-teacher branch (24k->16k resample, torch
    speaker-logits inference, 20000-way argmax — reference train.py:99-101,
    340-344) end-to-end against a scripted tiny stand-in saved locally, so
    the branch is not dead code in NeMo-less / zero-egress environments."""
    torch = pytest.importorskip("torch")

    from scipy.io import wavfile

    from facodec_tpu.cli.extract_targets import main as et_main

    class TinySpeakerNet(torch.nn.Module):
        """(1, T) 16 kHz wave -> (1, 20000) logits; length-agnostic."""

        def __init__(self):
            super().__init__()
            torch.manual_seed(0)
            self.proj = torch.nn.Linear(3, 20000)

        def forward(self, w: torch.Tensor) -> torch.Tensor:
            feats = torch.stack(
                [w.mean(dim=1), w.std(dim=1), w.abs().mean(dim=1)], dim=1)
            return self.proj(feats)

    mpath = str(tmp_path / "spk_teacher.pt")
    torch.jit.script(TinySpeakerNet()).save(mpath)

    wav = str(tmp_path / "d.wav")
    wavfile.write(wav, SR, (tone(0.5) * 32767).astype(np.int16))
    manifest = str(tmp_path / "train.txt")
    with open(manifest, "w") as f:
        f.write(f"{wav}\t3\ten\ttext\tphones\n")
    rc = et_main(["--manifest", manifest, "--teachers", "titanet",
                  "--titanet-model", mpath])
    assert rc == 0
    tgt = np.load(wav + ".targets.npz")
    spk = int(tgt["spk_label"])
    assert 0 <= spk < 20000
    # the label is the real argmax of the scripted model on the resampled wave
    wave24 = tone(0.5)
    t16 = np.linspace(0, len(wave24) / SR, int(len(wave24) * 2 / 3),
                      endpoint=False)
    w16 = np.interp(t16, np.arange(len(wave24)) / SR, wave24).astype(np.float32)
    want = int(torch.jit.load(mpath)(torch.from_numpy(w16)[None]).argmax())
    assert spk == want


def test_webui_gated():
    import pytest as _pytest

    from facodec_tpu.webui import build_interface

    with _pytest.raises(RuntimeError, match="gradio"):
        build_interface(codec=None)


def test_webui_build_interface_wiring(monkeypatch):
    """`build_interface` wiring (reference webui.py:54-81): runs against the
    real gradio when importable, otherwise against a minimal structural stub
    — both tabs built, each button clicked to the right handler with the
    right in/out arity."""
    import sys
    import types

    try:
        import gradio  # noqa: F401

        stub = None
    except ImportError:
        clicks = []

        class _Ctx:
            def __init__(self, label=None, **kw):
                self.label = label

            def __enter__(self):
                return self

            def __exit__(self, *a):
                return False

            def click(self, fn, inputs=None, outputs=None):
                clicks.append((fn, inputs, outputs))

        stub = types.ModuleType("gradio")
        stub.Blocks = stub.Tab = stub.Audio = stub.Button = _Ctx
        monkeypatch.setitem(sys.modules, "gradio", stub)

    from facodec_tpu.api import FACodec, FARedecoder
    from facodec_tpu.webui import build_interface

    c = FACodec.from_config(TINY, n_c=1)
    red = FARedecoder.from_config(TINY)
    demo = build_interface(c, red, sr=SR)
    assert demo is not None
    if stub is not None:
        assert len(clicks) == 2
        (rec_fn, rec_in, rec_out), (cv_fn, cv_in, cv_out) = clicks
        assert not isinstance(rec_in, list) and not isinstance(rec_out, list)
        assert isinstance(cv_in, list) and len(cv_in) == 2
        # handlers actually callable end to end through the wired objects
        sr_out, out = rec_fn((SR, (tone(0.5) * 32767).astype(np.int16)))
        assert sr_out == SR and out.dtype == np.int16
    # codec-only interface builds too (no VC tab)
    assert build_interface(c, None, sr=SR) is not None


def test_webui_reconstruct_handler(codec):
    """The tab callbacks are gradio-free (make_handlers) so they run here:
    int16 stereo in -> int16 mono out, and integer PCM is detected BEFORE
    the float cast (gradio delivers int16 by default — an int16 input must
    match the equivalent float input, not arrive 32768x too loud)."""
    from facodec_tpu.webui import _prep_audio, make_handlers

    w = tone(0.5)
    i16 = (w * 32767).astype(np.int16)
    stereo = np.stack([i16, i16], axis=-1)
    np.testing.assert_allclose(
        _prep_audio((SR, stereo)), i16.astype(np.float32) / 32768.0, atol=1e-7
    )
    # every integer PCM dtype scales by ITS OWN range (24/32-bit files
    # arrive as int32; mic input can be uint8 with a DC offset)
    i32 = (w * (2**31 - 1)).astype(np.int32)
    np.testing.assert_allclose(_prep_audio((SR, i32)), w, atol=2e-3)
    u8 = ((w * 0.5 + 0.5) * 255).astype(np.uint8)
    p8 = _prep_audio((SR, u8))
    assert np.abs(p8).max() <= 1.0 and abs(p8.mean()) < 0.05
    # a mismatched input rate is resampled to the codec rate, not misread
    w48 = np.repeat(i16, 2)  # crude 48 kHz version of the same tone
    p48 = _prep_audio((2 * SR, w48))
    assert abs(len(p48) - len(w)) <= 2

    do_reconstruct, _ = make_handlers(codec, sr=SR)
    sr_out, out = do_reconstruct((SR, i16))
    assert sr_out == SR and out.dtype == np.int16
    assert out.shape[0] == len(w) // HOP * HOP

    _, out_f = do_reconstruct((SR, i16.astype(np.float32) / 32768.0))
    np.testing.assert_array_equal(out, out_f)


def test_webui_convert_handler():
    from facodec_tpu.api import FACodec, FARedecoder
    from facodec_tpu.webui import make_handlers

    c = FACodec.from_config(TINY, n_c=1)
    red = FARedecoder.from_config(TINY)
    _, do_convert = make_handlers(c, red, sr=SR)
    src, tgt = tone(0.5, 220.0, 1), tone(0.5, 330.0, 2)
    sr_out, out = do_convert(
        (SR, (src * 32767).astype(np.int16)), (SR, tgt)
    )
    assert sr_out == SR and out.dtype == np.int16
    assert np.isfinite(out.astype(np.float32)).all()


def test_cli_stream(tmp_path):
    """The streaming CLI: exact chunked reconstruction of a wav."""
    from scipy.io import wavfile

    from facodec_tpu.__main__ import main

    src = str(tmp_path / "s.wav")
    wavfile.write(src, SR, (tone(16 * 3 * HOP / SR + 0.01) * 32767).astype(np.int16))
    out = main(["stream", "--source", src, "--config-path", TINY,
                "--chunk-frames", "16",
                "--output", str(tmp_path / "stream_out.wav")])
    assert os.path.exists(out)
    sr, data = wavfile.read(out)
    n = (int((16 * 3 * HOP / SR + 0.01) * SR) // (16 * HOP)) * 16 * HOP
    assert sr == SR and len(data) == n  # chunks + flush frame == input frames


def test_cli_convert(tmp_path):
    from scipy.io import wavfile

    from facodec_tpu.__main__ import main

    src, tgt = str(tmp_path / "src.wav"), str(tmp_path / "tgt.wav")
    wavfile.write(src, SR, (tone(0.4, 220.0, 3) * 32767).astype(np.int16))
    wavfile.write(tgt, SR, (tone(0.4, 330.0, 4) * 32767).astype(np.int16))
    out = main(["convert", "--source", src, "--target", tgt,
                "--codec-config", TINY, "--redecoder-config", TINY,
                "--output", str(tmp_path / "vc.wav")])
    assert os.path.exists(out)


def test_loudness_meter_and_normalize():
    """BS.1770 meter sanity: a full-scale 997 Hz sine reads ~-3.01 LKFS
    (K-weighting is ~0 dB there; mean square of a sine = -3 dB), gain math
    round-trips, silence is passed through (reference base.py:176-183)."""
    from facodec_tpu.ops.loudness import integrated_loudness, normalize_loudness

    t = np.arange(SR * 2) / SR
    sine = np.sin(2 * np.pi * 997.0 * t).astype(np.float32)
    loud = integrated_loudness(sine, SR)
    assert abs(loud - (-3.01)) < 0.25

    norm, input_db = normalize_loudness(0.1 * sine, SR, target_db=-16.0)
    assert abs(input_db - (-23.01)) < 0.25
    assert abs(integrated_loudness(norm, SR) - (-16.0)) < 0.05
    # peak cap: normalizing a quiet click-free sine to 0 LUFS would clip
    capped, _ = normalize_loudness(0.01 * sine, SR, target_db=0.0)
    assert np.abs(capped).max() <= 1.0 + 1e-6

    silent, db = normalize_loudness(np.zeros(SR), SR)
    assert not np.isfinite(db) and np.all(silent == 0)


def test_api_streaming_encode_decode_matches_oneshot(codec):
    """encode_streaming codes == one-shot codes (bit-exact); decode_streaming
    == one-shot decode — the bounded-memory long-file path (VERDICT item:
    reference base.py:188-216 windowing, rebuilt on exact streaming)."""
    wave = tone(4.1, seed=3)
    f_one = codec.encode(wave)
    f_str = codec.encode_streaming(wave, chunk_frames=16, timbre_seconds=60.0)
    np.testing.assert_array_equal(f_str.codes_p, f_one.codes_p)
    np.testing.assert_array_equal(f_str.codes_c, f_one.codes_c)
    np.testing.assert_array_equal(f_str.codes_r, f_one.codes_r)
    np.testing.assert_allclose(f_str.timbre, f_one.timbre, rtol=1e-5, atol=1e-5)

    out_one = codec.decode(f_one)
    out_str = codec.decode_streaming(f_one, chunk_frames=16)
    assert out_str.shape == out_one.shape
    np.testing.assert_allclose(out_str, out_one, rtol=2e-4, atol=2e-4)


def test_cli_long_file_streaming_encode(tmp_path, monkeypatch):
    """The encode CLI routes long inputs through the bounded-memory streaming
    path (threshold forced down) and decode restores the stored loudness."""
    from scipy.io import wavfile

    from facodec_tpu.__main__ import main
    from facodec_tpu.ops.loudness import integrated_loudness

    src = str(tmp_path / "long.wav")
    wave = tone(6.05, seed=5)
    wavfile.write(src, SR, (wave * 32767).astype(np.int16))
    monkeypatch.chdir(tmp_path)

    fac = main(["encode", "--input", src, "--config-path", TINY,
                "--streaming-threshold", "2.0", "--chunk-frames", "16",
                "--output", str(tmp_path / "long.fac")])
    assert os.path.exists(fac)
    from facodec_tpu.codec_file import FACodecFile

    f = FACodecFile.load(fac)
    assert f.codes_p.shape[-1] == len(wave) // HOP
    assert "input_db" in f.metadata

    wav = main(["decode", "--input", fac, "--config-path", TINY,
                "--streaming-threshold", "2.0", "--chunk-frames", "16",
                "--output", str(tmp_path / "long_dec.wav")])
    sr, data = wavfile.read(wav)
    assert sr == SR and len(data) == len(wave) // HOP * HOP
    # restored loudness ~= the source's (codec is random-init here, so only
    # check the restore hits the stored target within a loose band)
    got = integrated_loudness(data / 32767.0, SR)
    want = f.metadata["input_db"]
    assert abs(got - want) < 1.0
