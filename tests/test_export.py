"""AOT StableHLO artifact export/load (utils/export.py)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

TINY = os.path.join(os.path.dirname(__file__), "tiny_config.yml")
SR = 24000


@pytest.fixture(scope="module")
def codec():
    from facodec_tpu.api import FACodec

    return FACodec.from_config(TINY, n_c=2)


def tone(seconds=0.6):
    t = np.arange(int(seconds * SR)) / SR
    return (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)


def test_export_roundtrip_bit_exact(codec, tmp_path):
    """Exported artifact == the live-traced model, bit for bit, with the
    model source out of the loop at load time."""
    from facodec_tpu.utils.export import ExportedCodec, export_codec

    d = str(tmp_path / "artifact")
    sizes = export_codec(codec, d, batch=1, seconds=0.6)
    assert set(sizes) == {"encode", "decode", "reconstruct",
                          "encode_masked", "reconstruct_masked"}
    assert all(s > 0 for s in sizes.values())
    assert os.path.exists(os.path.join(d, "meta.json"))

    exp = ExportedCodec(d)
    w = jnp.asarray(tone())[None, : (int(0.6 * SR) // 300) * 300]

    cp, cc, cr, timbre = exp.encode(codec.params, w)
    f = codec.encode(np.asarray(w[0]))
    np.testing.assert_array_equal(np.asarray(cp), f.codes_p)
    np.testing.assert_array_equal(np.asarray(cc), f.codes_c)
    np.testing.assert_array_equal(np.asarray(cr), f.codes_r)
    np.testing.assert_allclose(np.asarray(timbre), f.timbre, rtol=0, atol=0)

    np.testing.assert_allclose(
        np.asarray(exp.reconstruct(codec.params, w)),
        codec.reconstruct(np.asarray(w[0])), rtol=0, atol=0,
    )
    np.testing.assert_allclose(
        np.asarray(exp.decode(
            codec.params, cp.astype(jnp.int32), cc.astype(jnp.int32),
            cr.astype(jnp.int32), timbre,
        )),
        codec.decode(f), rtol=0, atol=0,
    )


def test_artifact_service(codec, tmp_path):
    """cli/serve.ArtifactService: the full serving surface from the AOT
    artifact + a params pytree alone — encode/decode/reconstruct match the
    live-traced codec; past-bucket requests are rejected."""
    import pytest as _pytest

    from facodec_tpu.cli.serve import ArtifactService
    from facodec_tpu.utils.export import export_codec

    d = str(tmp_path / "artifact")
    export_codec(codec, d, batch=2, seconds=0.6)
    svc = ArtifactService(d, codec.params, batch_window_ms=1.0)

    w = tone(0.6)[: (int(0.6 * SR) // 300) * 300]
    f_ref = codec.encode(w)
    f = svc.encode(w)
    np.testing.assert_array_equal(f.codes_p, f_ref.codes_p)
    np.testing.assert_array_equal(f.codes_c, f_ref.codes_c)
    np.testing.assert_array_equal(f.codes_r, f_ref.codes_r)
    np.testing.assert_allclose(f.timbre, f_ref.timbre, rtol=1e-6, atol=1e-7)

    np.testing.assert_allclose(
        svc.decode(f), codec.decode(f_ref), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        svc.reconstruct(w), codec.reconstruct(w), rtol=1e-5, atol=1e-6
    )

    # shorter request: zero-padded into the bucket, codes trimmed back
    w2 = tone(0.45)
    f2 = svc.encode(w2)
    assert f2.codes_p.shape[-1] == len(w2) // 300

    # past-bucket request and residual-free decode are rejected
    with _pytest.raises(ValueError, match="exceeds the artifact bucket"):
        svc.encode(tone(0.9))
    with _pytest.raises(ValueError, match="residual"):
        svc.decode(f, use_residual=False)

    h = svc.health()
    assert h["artifact"] is True and h["max_batch"] == 2


def test_export_rejects_non_artifact(tmp_path):
    from facodec_tpu.utils.export import ExportedCodec

    d = tmp_path / "not_artifact"
    d.mkdir()
    (d / "meta.json").write_text('{"format": "something-else"}')
    with pytest.raises(ValueError, match="not a facodec-tpu export"):
        ExportedCodec(str(d))
