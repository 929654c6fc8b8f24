"""Host-side data pipeline: datasets, collation, per-host sharding, and
segment cropping.

Mirrors the reference pipeline (/root/reference/meldataset.py):
  * mel front-end n_fft 2048 / win 1200 / hop 300 / 80 HTK mels, normalized
    `(log(1e-5+mel)+4)/4` (meldataset.py:28-47) — computed here with the same
    XLA kernel the model uses (jitted on the host CPU backend);
  * `PseudoDataset`: random 1-30 s noise utterances, fixed len 100
    (meldataset.py:50-71) so the full training loop runs with no real data;
  * `FileListDataset`: `path\tsid\tlang\ttext\tphones` manifest rows
    (data/val.txt format, assemble_data.py:12-37) + optional sidecar `.npz`
    per utterance with offline teacher targets (f0, phone_ids, spk_label) —
    the TPU-native replacement for the reference's in-loop torch teachers;
  * `collate`: sort by length desc, zero-pad (meldataset.py:74-100);
  * `shard_iterator`: per-host slice, the DistributedSampler equivalent
    (seed 114514, meldataset.py:112-118);
  * `segment_batch`: the random fixed-length crop train.py:189-212 performs,
    done host-side so every device-side shape is static.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

SR = 24000
HOP = 300
MAX_FRAMES = 80  # config.yml:9 max_len


@dataclass(frozen=True)
class MelConfig:
    sample_rate: int = SR
    n_fft: int = 2048
    win_length: int = 1200
    hop_length: int = HOP
    n_mels: int = 80
    mel_mean: float = -4.0
    mel_std: float = 4.0


def compute_mel(wave: np.ndarray, cfg: MelConfig = MelConfig()) -> np.ndarray:
    """(T,) float wave -> (frames, n_mels) normalized log-mel (numpy).

    Pure numpy (ops/spectral.log_mel_spectrogram_np): the data pipeline must
    never enter the JAX runtime — under multi-process JAX a jitted host mel
    yields non-addressable global arrays (test_multihost.py), and a host
    thread touching the TPU backend would serialize against training steps."""
    from facodec_tpu.ops.spectral import log_mel_spectrogram_np

    out = log_mel_spectrogram_np(
        np.asarray(wave, np.float32)[None],
        sample_rate=cfg.sample_rate,
        n_fft=cfg.n_fft,
        hop_length=cfg.hop_length,
        win_length=cfg.win_length,
        n_mels=cfg.n_mels,
        mel_mean=cfg.mel_mean,
        mel_std=cfg.mel_std,
    )
    n_frames = len(wave) // cfg.hop_length
    return out[0, :n_frames]


def load_wav(path: str, sr: int = SR) -> np.ndarray:
    """Load a mono wav at the target rate. Prefers the native C++ decoder
    (facodec_tpu/native: GIL-free parallel decode + in-decoder resample);
    falls back to scipy + numpy linear resampling."""
    from facodec_tpu.native import load_wav_native

    native = load_wav_native(path, sr)
    if native is not None:
        return native
    from scipy.io import wavfile

    file_sr, data = wavfile.read(path)
    if data.dtype.kind == "i":
        data = data.astype(np.float32) / np.iinfo(data.dtype).max
    elif data.dtype.kind == "u":
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim > 1:
        data = data.mean(axis=1)
    if file_sr != sr:
        # linear resample fallback (host-side, load-time only)
        t = np.linspace(0.0, len(data) / file_sr, int(len(data) * sr / file_sr), endpoint=False)
        src_t = np.arange(len(data)) / file_sr
        data = np.interp(t, src_t, data).astype(np.float32)
    return data


class PseudoDataset:
    """Random-noise utterances (reference meldataset.py:50-71) with random
    teacher targets, for end-to-end pipeline/training tests."""

    def __init__(self, length: int = 100, seed: int = 0, min_s: float = 1.0,
                 max_s: float = 30.0, cfg: MelConfig = MelConfig(),
                 n_phones: int = 1024, n_speakers: int = 20000):
        self.length = length
        self.cfg = cfg
        self.rng = np.random.default_rng(seed)
        self.min_s, self.max_s = min_s, max_s
        self.n_phones, self.n_speakers = n_phones, n_speakers

    def __len__(self):
        return self.length

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        dur = self.rng.uniform(self.min_s, self.max_s)
        T = int(dur * self.cfg.sample_rate) // self.cfg.hop_length * self.cfg.hop_length
        wave = (self.rng.standard_normal(T) * 0.05).astype(np.float32)
        frames = T // self.cfg.hop_length
        return dict(
            wave=wave,
            mel=compute_mel(wave, self.cfg),
            f0=np.abs(self.rng.standard_normal(frames)).astype(np.float32) * 200.0,
            phone_ids=self.rng.integers(0, self.n_phones, frames).astype(np.int32),
            spk_label=np.int32(self.rng.integers(0, self.n_speakers)),
        )


class FileListDataset:
    """Manifest-driven dataset. Row: `path\tsid\tlang\ttext\tphones`.

    Teacher targets are read from `<wav>.targets.npz` when present (keys:
    f0 (frames,), phone_ids (frames,), spk_label ()); otherwise zeros — train
    with predictor lambdas 0 or precompute targets first (see
    facodec_tpu/cli/extract_targets.py)."""

    def __init__(self, manifest: str, root: str = "", cfg: MelConfig = MelConfig()):
        self.cfg = cfg
        self.rows: List[Tuple[str, int]] = []
        with open(manifest) as f:
            for line in f:
                parts = line.rstrip("\n").split("\t")
                if not parts or not parts[0]:
                    continue
                path = os.path.join(root, parts[0]) if root else parts[0]
                sid = int(parts[1]) if len(parts) > 1 and parts[1].isdigit() else 0
                self.rows.append((path, sid))

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        path, sid = self.rows[idx]
        wave = load_wav(path, self.cfg.sample_rate)
        T = len(wave) // self.cfg.hop_length * self.cfg.hop_length
        wave = wave[:T]
        frames = T // self.cfg.hop_length
        tgt_path = path + ".targets.npz"
        if os.path.exists(tgt_path):
            tgt = np.load(tgt_path)
            f0 = tgt["f0"][:frames].astype(np.float32)
            phone_ids = tgt["phone_ids"][:frames].astype(np.int32)
            spk = np.int32(tgt["spk_label"])
        else:
            f0 = np.zeros(frames, np.float32)
            phone_ids = np.zeros(frames, np.int32)
            spk = np.int32(sid % 20000)
        return dict(
            wave=wave, mel=compute_mel(wave, self.cfg), f0=f0,
            phone_ids=phone_ids, spk_label=spk,
        )


def collate(
    items: Sequence[Dict[str, np.ndarray]],
    bucket_frames: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Zero-pad a list of utterances, sorted by length desc
    (reference meldataset.py:74-100).

    bucket_frames rounds the padded length UP to a multiple (shape
    bucketing): under jit every distinct (B, max_T) signature compiles a new
    program, so without bucketing real-data batches would recompile almost
    every step — torch hides this because eager kernels are shape-agnostic.
    A multiple of ~240 frames (3 s) keeps the shape set tiny at <2% padding
    overhead."""
    items = sorted(items, key=lambda d: len(d["wave"]), reverse=True)
    B = len(items)
    max_T = max(len(d["wave"]) for d in items)
    max_F = max(d["mel"].shape[0] for d in items)
    if bucket_frames:
        # bucket the FRAME count (covering both the longest mel and the
        # longest wave rounded up to a hop multiple), then derive max_T from
        # it — keeps waves.shape[1] == mels.shape[1]*HOP even when the raw
        # longest wave exceeds max_F*HOP by a sub-hop remainder, and keeps
        # the padded-shape set tiny (no raw lengths leak into jit signatures)
        frames = max(-(-max_T // HOP), max_F)
        max_F = -(-frames // bucket_frames) * bucket_frames
        max_T = max_F * HOP
    n_mels = items[0]["mel"].shape[1]

    waves = np.zeros((B, max_T), np.float32)
    mels = np.zeros((B, max_F, n_mels), np.float32)
    f0 = np.zeros((B, max_F), np.float32)
    phone_ids = np.zeros((B, max_F), np.int32)
    spk = np.zeros(B, np.int32)
    wave_lens = np.zeros(B, np.int32)
    mel_lens = np.zeros(B, np.int32)
    for i, d in enumerate(items):
        T, F = len(d["wave"]), d["mel"].shape[0]
        waves[i, :T] = d["wave"]
        mels[i, :F] = d["mel"]
        f0[i, :F] = d["f0"][:F]
        phone_ids[i, :F] = d["phone_ids"][:F]
        spk[i] = d["spk_label"]
        wave_lens[i] = T
        mel_lens[i] = F
    return dict(waves=waves, mels=mels, f0=f0, phone_ids=phone_ids,
                spk_labels=spk, wave_lens=wave_lens, mel_lens=mel_lens)


def shard_iterator(
    dataset, batch_size: int, rank: int = 0, world_size: int = 1,
    seed: int = 114514, shuffle: bool = True, epoch: int = 0,
    bucket_frames: Optional[int] = None,
) -> Iterator[Dict[str, np.ndarray]]:
    """Per-host batch iterator — DistributedSampler equivalent
    (meldataset.py:112-118). Yields collated batches of this host's shard."""
    order = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng(seed + epoch).shuffle(order)
    order = order[rank::world_size]
    for i in range(0, len(order) - batch_size + 1, batch_size):
        yield collate([dataset[int(j)] for j in order[i : i + batch_size]],
                      bucket_frames=bucket_frames)


def prefetch(iterator: Iterator, prepare, depth: int = 2) -> Iterator:
    """Run `prepare(item)` for upcoming items on a background thread, `depth`
    items ahead — the host builds (and `jax.device_put`s) batch N+1..N+depth
    while the device executes step N, hiding the input pipeline behind
    compute. device_put is async, so the H2D copy itself also overlaps.

    The reference's loop is fully synchronous (teachers + crop inline,
    train.py:177-212); torch DataLoader workers cover only file IO there.
    depth<=0 degrades to the synchronous `map(prepare, iterator)`.

    Single worker thread => `prepare`'s rng draws stay in iteration order
    (training determinism is preserved — test_train_loop determinism test).
    Exceptions in `prepare`/`iterator` re-raise at the consumer."""
    if depth <= 0:
        for item in iterator:
            yield prepare(item)
        return

    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    done = object()
    stop = threading.Event()  # consumer gone (early break): unwind the worker

    def _put(x) -> bool:
        while not stop.is_set():
            try:
                q.put(x, timeout=0.1)
                return True
            except queue.Full:
                pass
        return False

    def worker():
        try:
            for item in iterator:
                if stop.is_set() or not _put(prepare(item)):
                    return
        except BaseException as e:  # surfaced at the consumer
            _put(e)
            return
        _put(done)

    t = threading.Thread(target=worker, daemon=True, name="facodec-prefetch")
    t.start()
    try:
        while True:
            item = q.get()
            if item is done:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()


def segment_batch(
    batch: Dict[str, np.ndarray],
    max_frames: int = MAX_FRAMES,
    hop: int = HOP,
    rng: Optional[np.random.Generator] = None,
) -> Dict[str, np.ndarray]:
    """Random fixed-length segment crop (train.py:189-212): one segment per
    utterance, seg length = min(min(mel_lens), max_frames). Returns the train
    step's batch dict (static shapes per batch)."""
    rng = rng or np.random.default_rng()
    mel_lens = batch["mel_lens"]
    seg = int(min(mel_lens.min(), max_frames))
    B = len(mel_lens)
    wave_seg = np.zeros((B, seg * hop), np.float32)
    mel_seg = np.zeros((B, seg, batch["mels"].shape[-1]), np.float32)
    f0 = np.zeros((B, seg), np.float32)
    phone_ids = np.zeros((B, seg), np.int32)
    for i in range(B):
        L = int(mel_lens[i])
        start = int(rng.integers(0, L - seg)) if L > seg else 0
        mel_seg[i] = batch["mels"][i, start : start + seg]
        f0[i] = batch["f0"][i, start : start + seg]
        phone_ids[i] = batch["phone_ids"][i, start : start + seg]
        wave_seg[i] = batch["waves"][i, start * hop : (start + seg) * hop]
    return dict(
        wave_seg=wave_seg, mel_seg=mel_seg, f0=f0, phone_ids=phone_ids,
        spk_labels=batch["spk_labels"], full_waves=batch["waves"],
        wave_lens=batch["wave_lens"],
    )
