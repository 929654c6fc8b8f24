"""Continuous batching for concurrent real-time streams.

One chip serves one 50 ms-chunk stream at ~4 ms/chunk — but batch 1
underfills the MXU badly (bench.py batch curve: 210x RTF at batch 1 vs
490x at batch 16). A server holding N live connections should advance ALL
of them with ONE device call per tick, not N. This module is that
mechanism, the streaming analog of cli/serve.py's request micro-batcher
(and of continuous batching in LLM serving):

  * a `BatchedStreamGroup` owns `capacity` SLOTS of device-resident
    streaming state, permanently stacked at a fixed batch — static shapes,
    one compiled steady-step program for the whole group's lifetime;
  * `join` admits a stream: its priming chunk runs through the batch-1
    first-step program (a different trace anyway — priming emits
    prime_frames-1 frames) and the resulting state is written into a free
    slot with `lax.dynamic_update_slice_in_dim` (slot index traced, so no
    per-slot recompile);
  * `tick` advances every slot that has a chunk pending in ONE masked
    batched call: slots without input (stragglers, free slots) keep their
    state bit-frozen via `jnp.where(mask, stepped, old)` — compute is
    spent on them (the batch is static) but their streams are untouched;
  * `flush`/`leave` extract one slot's state for the final right-reflect
    frame and free the slot for reuse.

Slot isolation: every op in the step (convs, LSTM, VQ, AdaIN) is
batch-parallel, so slot b's outputs depend only on slot b's state, input
chunk, and timbre row. Inactive slots are bit-frozen by construction.
Active-slot outputs match an independent batch-1 session to float
tolerance (XLA may tile batched reductions differently than batch-1;
codes agree except at exact argmin ties — tests/test_stream_batch.py).

The per-leaf batch axis is discovered STRUCTURALLY (state constructors at
two batch sizes, diff the shapes): conv rings carry batch at axis 0 but
LSTM carries (layers, batch, hidden) — shape-sniffing a single pytree
would misfire whenever layers == batch.

The reference has no serving stack at all (SURVEY.md §4); its real-time
story is the causality claim (reference README.md:105-107). This is the
TPU-native capacity story for that claim.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

HOP = 300


def _batch_axes(small, big) -> Any:
    """Pytree of per-leaf batch axes: the unique axis whose size differs
    between the same state built at two batch sizes."""

    def axis(a, b):
        diff = [i for i, (x, y) in enumerate(zip(a.shape, b.shape)) if x != y]
        if len(diff) != 1:
            raise ValueError(
                f"cannot locate batch axis: {a.shape} vs {b.shape}"
            )
        return diff[0]

    return jax.tree.map(axis, small, big)


def _mask_merge(mask: jnp.ndarray, new, old, axes):
    """new where mask (broadcast along each leaf's batch axis) else old."""

    def merge(n, o, ax):
        shape = [1] * n.ndim
        shape[ax] = mask.shape[0]
        return jnp.where(mask.reshape(shape), n, o)

    return jax.tree.map(merge, new, old, axes)


def _insert(group, one, slot, axes):
    """Write a batch-1 state pytree into `slot` of the stacked pytree."""
    return jax.tree.map(
        lambda G, s, ax: lax.dynamic_update_slice_in_dim(G, s.astype(G.dtype),
                                                         slot, axis=ax),
        group, one, axes,
    )


def _extract(group, slot, axes):
    """Batch-1 view of `slot` from the stacked pytree."""
    return jax.tree.map(
        lambda G, ax: lax.dynamic_slice_in_dim(G, slot, 1, axis=ax),
        group, axes,
    )


class BatchedStreamGroup:
    """Up to `capacity` concurrent streaming sessions advanced per-chunk by
    ONE device call. Host-side object; not thread-safe by itself (callers
    serialize ticks — cli/stream_serve.py's dispatcher does)."""

    def __init__(self, session, capacity: int):
        assert capacity >= 1
        self.sess = session
        self.capacity = B = capacity
        s1 = session.init_encode_state(1).core
        s2 = session.init_encode_state(2).core
        self._enc_axes = _batch_axes(s1, s2)
        d1 = session.init_decode_state(1)[0]
        d2 = session.init_decode_state(2)[0]
        self._dec_axes = _batch_axes(d1, d2)
        self.enc_core = session.init_encode_state(B).core
        self.dec_core = session.init_decode_state(B)[0]
        # the timbre vector is (B, in_dim) (fa_quantizer.py:359)
        self.timbre_dim = session.quantizer.in_dim
        self.timbre = jnp.zeros((B, self.timbre_dim))
        self.active = np.zeros(B, bool)

        sess = session

        def masked_step(params, waves, timbre, enc_core, dec_core, mask):
            outs, codes, enc2 = sess._encode_steady_raw(
                params, waves, timbre, enc_core
            )
            wave, dec2 = sess._decode_steady_raw(params, outs, dec_core)
            enc_core = _mask_merge(mask, enc2, enc_core, self._enc_axes)
            dec_core = _mask_merge(mask, dec2, dec_core, self._dec_axes)
            return wave, codes, enc_core, dec_core

        self._step = jax.jit(masked_step)
        self._insert_enc = jax.jit(
            lambda G, s, i: _insert(G, s, i, self._enc_axes)
        )
        self._insert_dec = jax.jit(
            lambda G, s, i: _insert(G, s, i, self._dec_axes)
        )
        self._extract_enc = jax.jit(
            lambda G, i: _extract(G, i, self._enc_axes)
        )
        self._extract_dec = jax.jit(
            lambda G, i: _extract(G, i, self._dec_axes)
        )

    # ----------------------------------------------------------- membership
    def free_slots(self) -> int:
        return int(self.capacity - self.active.sum())

    def join(self, prime_wave: jnp.ndarray, timbre: jnp.ndarray,
             ) -> Tuple[int, jnp.ndarray, Tuple]:
        """Admit a stream. prime_wave (1, prime_frames*HOP) — the session's
        full priming span; timbre (1, d). Returns (slot, first emission
        (1, (prime_frames-1)*HOP), first codes)."""
        free = np.flatnonzero(~self.active)
        if len(free) == 0:
            raise RuntimeError("stream group full")
        slot = int(free[0])
        sess = self.sess
        est = sess.init_encode_state(1)
        est, outs, codes = sess.encode_chunk(est, prime_wave, timbre)
        if outs is None:
            raise ValueError(
                f"join needs the full priming span "
                f"({sess.prime_frames * HOP} samples)"
            )
        dst = sess.init_decode_state(1)
        dst, wave = sess.decode_chunk(dst, outs)
        self.enc_core = self._insert_enc(self.enc_core, est.core, slot)
        self.dec_core = self._insert_dec(self.dec_core, dst[0], slot)
        self.timbre = self.timbre.at[slot].set(timbre[0])
        self.active[slot] = True
        return slot, wave, codes

    def leave(self, slot: int) -> None:
        self.active[slot] = False

    # ----------------------------------------------------------- advancing
    def tick(self, chunks: Dict[int, np.ndarray]) -> Dict[int, np.ndarray]:
        """Advance every slot in `chunks` ({slot: (chunk_frames*HOP,) wave})
        with one device call; other slots stay bit-frozen. Returns
        {slot: (chunk_frames*HOP,) output wave}."""
        if not chunks:
            return {}
        B, step = self.capacity, self.sess.chunk_frames * HOP
        waves = np.zeros((B, step), np.float32)
        mask = np.zeros(B, bool)
        for slot, w in chunks.items():
            if not self.active[slot]:
                raise ValueError(f"slot {slot} is not active")
            waves[slot] = np.asarray(w, np.float32).reshape(step)
            mask[slot] = True
        wave, codes, self.enc_core, self.dec_core = self._step(
            self.sess.params, jnp.asarray(waves), self.timbre,
            self.enc_core, self.dec_core, jnp.asarray(mask),
        )
        out = np.asarray(wave)
        return {slot: out[slot] for slot in chunks}

    def flush(self, slot: int) -> np.ndarray:
        """The stream's final right-reflect frame ((HOP,) wave). Does not
        advance or free the slot (call `leave` after)."""
        if not self.active[slot]:
            raise ValueError(f"slot {slot} is not active")
        sess = self.sess
        enc1 = self._extract_enc(self.enc_core, slot)
        dec1 = self._extract_dec(self.dec_core, slot)
        timbre1 = lax.dynamic_slice_in_dim(self.timbre, slot, 1, axis=0)
        outs_t, _ = sess._flush(sess.params, timbre1, enc1)
        wave_t, _ = sess._decode(sess.params, outs_t, dec1)
        return np.asarray(wave_t)[0]
