"""Continuous batching of live streams (models/stream_batch.py): slot
isolation, masked state freezing, staggered join/leave/slot-reuse, and
parity with independent batch-1 sessions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facodec_tpu.models.dac import Decoder, Encoder
from facodec_tpu.models.fa_quantizer import FAquantizer

HOP = 300


@pytest.fixture(scope="module")
def sess():
    from facodec_tpu.models.builder import init_params
    from facodec_tpu.models.streaming import StreamingFACodec

    enc = Encoder(d_model=4, strides=(2, 5, 5, 6), d_latent=64, causal=True,
                  lstm=1)
    qt = FAquantizer(in_dim=64, n_p_codebooks=1, n_c_codebooks=2,
                     n_t_codebooks=2, n_r_codebooks=3, codebook_size=32,
                     codebook_dim=4, quantizer_dropout=0.5, causal=True,
                     separate_prosody_encoder=True, timbre_norm=True,
                     style_hidden_dim=32, prosody_hidden_dim=16)
    dec = Decoder(input_channel=64, channels=32, rates=(6, 5, 5, 2),
                  causal=True, lstm=1)
    params = init_params(dict(encoder=enc, quantizer=qt, decoder=dec),
                         jax.random.PRNGKey(0), seg_frames=12)
    return StreamingFACodec(enc, qt, dec, params, chunk_frames=4, n_c=1)


def make_stream(sess, seed, n_chunks):
    rng = np.random.default_rng(seed)
    C = sess.chunk_frames
    wave = rng.standard_normal((1, n_chunks * C * HOP)).astype(np.float32) * 0.2
    timbre = rng.standard_normal((1, 64)).astype(np.float32) * 0.5
    return jnp.asarray(wave), jnp.asarray(timbre)


def solo_run(sess, wave, timbre):
    """Independent batch-1 session over the whole stream (incl. flush)."""
    est, dst = sess.init_encode_state(1), sess.init_decode_state(1)
    step = sess.chunk_frames * HOP
    parts = []
    for i in range(0, wave.shape[1], step):
        est, outs, _ = sess.encode_chunk(est, wave[:, i : i + step], timbre)
        dst, out = sess.decode_chunk(dst, outs)
        if out is not None:
            parts.append(np.asarray(out)[0])
    outs_t, _ = sess.flush_encode(est, timbre)
    dst, out_t = sess.decode_chunk(dst, outs_t)
    parts.append(np.asarray(out_t)[0])
    return np.concatenate(parts)


def group_run_staggered(sess, streams, capacity):
    """Drive the group with staggered membership: stream k joins after k
    ticks of the earlier streams; each leaves (flush) when its chunks run
    out; freed slots are reused by later joins."""
    from facodec_tpu.models.stream_batch import BatchedStreamGroup

    group = BatchedStreamGroup(sess, capacity)
    C = sess.chunk_frames
    step = C * HOP
    P = sess.prime_frames
    outs = {}
    slots = {}
    cursor = {}
    pending = list(range(len(streams)))
    live = []
    while pending or live:
        if pending and group.free_slots() > 0:
            k = pending.pop(0)
            wave, timbre = streams[k]
            slot, first, _ = group.join(wave[:, : P * HOP], timbre)
            outs[k] = [np.asarray(first)[0]]
            slots[k] = slot
            cursor[k] = P * HOP
            live.append(k)
        # one tick advancing every live stream that still has input
        chunks = {}
        for k in list(live):
            wave, _ = streams[k]
            if cursor[k] < wave.shape[1]:
                chunks[slots[k]] = np.asarray(wave)[0, cursor[k] : cursor[k] + step]
                cursor[k] += step
        got = group.tick(chunks)
        done = []
        for k in list(live):
            if slots[k] in got:
                outs[k].append(got[slots[k]])
            if cursor[k] >= streams[k][0].shape[1]:
                outs[k].append(group.flush(slots[k]))
                group.leave(slots[k])
                done.append(k)
        for k in done:
            live.remove(k)
    return {k: np.concatenate(v) for k, v in outs.items()}


def test_group_matches_solo_sessions(sess):
    """Four streams through a 2-slot group (forcing slot reuse), staggered
    joins: every stream's output matches its independent session."""
    P = sess.prime_frames
    C = sess.chunk_frames
    n_prime_chunks = P // C
    streams = [make_stream(sess, seed, n_prime_chunks + 2 + seed % 2)
               for seed in range(4)]
    got = group_run_staggered(sess, streams, capacity=2)
    for k, (wave, timbre) in enumerate(streams):
        want = solo_run(sess, wave, timbre)
        assert got[k].shape == want.shape
        np.testing.assert_allclose(got[k], want, rtol=1e-5, atol=1e-6)


def test_straggler_slot_is_bit_frozen(sess):
    """A tick that advances only one of two live streams leaves the other's
    state BIT-identical (the masked merge), so its later chunks are exact."""
    from facodec_tpu.models.stream_batch import BatchedStreamGroup

    P, C = sess.prime_frames, sess.chunk_frames
    step = C * HOP
    a_wave, a_timbre = make_stream(sess, 21, P // C + 3)
    b_wave, b_timbre = make_stream(sess, 22, P // C + 3)

    group = BatchedStreamGroup(sess, 2)
    sa, _, _ = group.join(a_wave[:, : P * HOP], a_timbre)
    sb, _, _ = group.join(b_wave[:, : P * HOP], b_timbre)
    frozen = jax.tree.leaves(group.enc_core) + jax.tree.leaves(group.dec_core)
    frozen = [np.asarray(x) for x in frozen]

    # advance ONLY stream a
    group.tick({sa: np.asarray(a_wave)[0, P * HOP : P * HOP + step]})
    after = jax.tree.leaves(group.enc_core) + jax.tree.leaves(group.dec_core)
    axes = jax.tree.leaves(group._enc_axes) + jax.tree.leaves(group._dec_axes)
    for before_leaf, after_leaf, ax in zip(frozen, after, axes):
        np.testing.assert_array_equal(
            np.take(before_leaf, sb, axis=ax),
            np.take(np.asarray(after_leaf), sb, axis=ax),
        )

    # b then advances normally and matches its solo run
    outs_b = []
    est, dst = sess.init_encode_state(1), sess.init_decode_state(1)
    est, outs, _ = sess.encode_chunk(est, b_wave[:, : P * HOP], b_timbre)
    dst, w0 = sess.decode_chunk(dst, outs)
    for i in range(P * HOP, b_wave.shape[1], step):
        est, outs, _ = sess.encode_chunk(est, b_wave[:, i : i + step], b_timbre)
        dst, w = sess.decode_chunk(dst, outs)
        got = group.tick({sb: np.asarray(b_wave)[0, i : i + step]})
        np.testing.assert_allclose(got[sb], np.asarray(w)[0],
                                   rtol=1e-5, atol=1e-6)


def test_group_capacity_and_errors(sess):
    from facodec_tpu.models.stream_batch import BatchedStreamGroup

    P = sess.prime_frames
    group = BatchedStreamGroup(sess, 1)
    wave, timbre = make_stream(sess, 31, P // sess.chunk_frames + 1)
    slot, _, _ = group.join(wave[:, : P * HOP], timbre)
    assert group.free_slots() == 0
    with pytest.raises(RuntimeError, match="full"):
        group.join(wave[:, : P * HOP], timbre)
    with pytest.raises(ValueError, match="priming"):
        group.leave(slot)
        group.join(wave[:, :HOP], timbre)
    assert group.tick({}) == {}
    with pytest.raises(ValueError, match="not active"):
        group.tick({0: np.zeros(sess.chunk_frames * HOP, np.float32)})
