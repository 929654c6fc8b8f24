"""Data pipeline tests: PseudoDataset, collate padding, per-host sharding,
segment cropping, and mel front-end consistency with the model's preprocess."""

import numpy as np

import jax.numpy as jnp

from facodec_tpu.train.data import (
    MelConfig,
    PseudoDataset,
    collate,
    compute_mel,
    segment_batch,
    shard_iterator,
)

HOP = 300


def test_pseudo_dataset_item():
    ds = PseudoDataset(length=4, seed=0, min_s=1.0, max_s=2.0)
    item = ds[0]
    T = len(item["wave"])
    assert T % HOP == 0
    frames = T // HOP
    assert item["mel"].shape == (frames, 80)
    assert item["f0"].shape == (frames,)
    assert item["phone_ids"].shape == (frames,)
    assert item["phone_ids"].dtype == np.int32


def test_collate_pads_and_sorts():
    ds = PseudoDataset(length=6, seed=1, min_s=1.0, max_s=3.0)
    batch = collate([ds[i] for i in range(4)])
    B, Tmax = batch["waves"].shape
    assert B == 4
    # sorted desc by length
    assert np.all(np.diff(batch["wave_lens"]) <= 0)
    assert batch["wave_lens"][0] == Tmax
    # padding is zeros
    for i in range(B):
        assert np.all(batch["waves"][i, batch["wave_lens"][i]:] == 0)
    assert batch["mels"].shape[1] == batch["mel_lens"].max()


def test_shard_iterator_partitions():
    ds = PseudoDataset(length=16, seed=2, min_s=1.0, max_s=1.5)
    seen = []
    for rank in range(2):
        for b in shard_iterator(ds, batch_size=2, rank=rank, world_size=2, shuffle=False):
            seen.append(b["waves"].shape[0])
    assert sum(seen) == 16  # every item consumed exactly once across hosts


def test_segment_batch_shapes():
    ds = PseudoDataset(length=4, seed=3, min_s=1.2, max_s=2.0)
    batch = collate([ds[i] for i in range(3)])
    seg = segment_batch(batch, max_frames=80, rng=np.random.default_rng(0))
    F = seg["mel_seg"].shape[1]
    assert F <= 80
    assert seg["wave_seg"].shape == (3, F * HOP)
    assert seg["f0"].shape == (3, F)
    assert seg["phone_ids"].shape == (3, F)
    assert seg["full_waves"].shape == batch["waves"].shape


def test_compute_mel_matches_model_preprocess():
    """Pipeline mels == FAquantizer.preprocess mels (same XLA kernel)."""
    from facodec_tpu.ops.spectral import log_mel_spectrogram

    rng = np.random.default_rng(4)
    wave = (rng.standard_normal(3 * HOP * 4) * 0.1).astype(np.float32)
    got = compute_mel(wave)
    want = np.asarray(log_mel_spectrogram(jnp.asarray(wave)[None]))[0, : len(wave) // HOP]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_collate_bucket_frames():
    """Shape bucketing: padded lengths round UP to the bucket multiple so jit
    sees a small set of shapes on variable-length real data."""
    from facodec_tpu.train.data import PseudoDataset, collate

    ds = PseudoDataset(length=4, seed=0, min_s=1.0, max_s=1.9)
    items = [ds[i] for i in range(4)]
    b = collate(items, bucket_frames=64)
    assert b["mels"].shape[1] % 64 == 0
    assert b["waves"].shape[1] == b["mels"].shape[1] * 300
    # content identical to the unbucketed collate on the shared prefix
    u = collate(items)
    F, T = u["mels"].shape[1], u["waves"].shape[1]
    np.testing.assert_array_equal(b["mels"][:, :F], u["mels"])
    np.testing.assert_array_equal(b["waves"][:, :T], u["waves"])
    assert np.all(b["waves"][:, T:] == 0)
    np.testing.assert_array_equal(b["wave_lens"], u["wave_lens"])


def test_prefetch_matches_sync_and_propagates_errors():
    from facodec_tpu.train.data import prefetch

    items = list(range(20))
    got = list(prefetch(iter(items), lambda x: x * x, depth=3))
    assert got == [x * x for x in items]

    # order-sensitive prepare (stateful rng) stays in iteration order
    rng = np.random.default_rng(0)
    got = list(prefetch(iter(items), lambda x: (x, rng.integers(100)), depth=2))
    rng2 = np.random.default_rng(0)
    want = [(x, rng2.integers(100)) for x in items]
    assert [int(g[1]) for g in got] == [int(w[1]) for w in want]

    def boom(x):
        if x == 3:
            raise RuntimeError("boom")
        return x

    out = []
    try:
        for v in prefetch(iter(items), boom, depth=2):
            out.append(v)
        raised = False
    except RuntimeError:
        raised = True
    assert raised and out == [0, 1, 2]

    # early consumer break must not deadlock (worker unwinds via stop event)
    g = prefetch(iter(items), lambda x: x, depth=1)
    assert next(g) == 0
    g.close()

    # depth<=0 degrades to the synchronous path
    assert list(prefetch(iter(items), lambda x: x + 1, depth=0)) == [
        x + 1 for x in items
    ]
