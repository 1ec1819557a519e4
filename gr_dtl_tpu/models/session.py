"""Continuous streaming receiver: block-by-block RX with carried state.

The last runtime piece replacing GNU Radio's always-on scheduler: a
:class:`StreamRx` consumes an endless sample stream in fixed-size
blocks (any whole number of frame periods), carrying across blocks

- a held sample *tail* so frames straddling block boundaries complete,
- the trigger lock state machine (models/streaming.trigger_lock_scan —
  the reference's frame_detect lock/unlock semantics),
- the last known constellation (the reference parser's
  ``d_constellation`` memory, packet_header.cc:269-273) as the header-
  failure fallback,
- a running expected frame number for lost-frame accounting.

One jitted per-block function does metric -> vote -> triggers -> demod;
the host loop only moves the small carry dict between calls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gr_dtl_tpu.ops import constellation as cn, metrics, sync
from gr_dtl_tpu.models import receiver, streaming

__all__ = ["StreamRx"]


class StreamRx:
    """Feed me sample chunks; I emit per-frame RxOut batches.

    Args:
      cfg: RxConfig.
      frames_per_block: frames demodulated per jitted step; chunks
        passed to :meth:`process` must contain exactly this many frame
        periods (the constructor exposes ``block_samples``).
    """

    def __init__(self, cfg, frames_per_block: int = 16, fec=None):
        self.cfg = cfg
        self.F = frames_per_block
        self.P = cfg.frame_samples
        self.block_samples = self.F * self.P
        # tail: enough history to finish a frame that starts near the
        # end of the previous block + the metric lookahead
        self.tail_len = self.P + cfg.fft_len
        self.rxp = receiver.build_rx(cfg, fec)
        self._tail = np.zeros(self.tail_len, np.complex64)
        self._lock = streaming.TriggerLockState(
            locked=jnp.asarray(False), expected=jnp.asarray(0),
            sync_count=jnp.asarray(0), miss_count=jnp.asarray(0),
        )
        self._fallback = jnp.full((self.F,), int(cn.ConstellationType.BPSK),
                                  jnp.int32)
        self._step = self._build_step()

    def _build_step(self):
        cfg, F, P = self.cfg, self.F, self.P
        rxp = self.rxp

        @jax.jit
        def step(samples, lock_state, fallback_cnst):
            """samples: [tail + block] complex64; triggers are owned by
            the tail-start coordinate system (frame k starts in the
            first F periods of `samples`)."""
            Pm, M = sync.timing_metric(samples, cfg.fft_len)
            phase = sync.fold_detect(M[: F * P], P, cfg.cp_len)
            cand = sync.frame_triggers(M, phase, P, F)
            # plausibility per candidate: metric level at the trigger
            lvl = M[jnp.clip(cand, 0, M.shape[-1] - 1)]
            found = lvl > 0.5
            lock_state, (trig, valid) = streaming.trigger_lock_scan(
                lock_state, cand, found, P
            )
            eps = sync.fine_cfo(Pm, trig, cfg.cp_len)
            offs = jnp.arange(P, dtype=jnp.int32)
            idx = jnp.clip(trig[:, None] + offs[None, :], 0, samples.shape[-1] - 1)
            frames = sync.cfo_correct(samples[idx], eps, cfg.fft_len)
            out = receiver.rx_frames(rxp, frames, fallback_cnst=fallback_cnst)
            # next fallback: last frame's accepted constellation
            new_fallback = jnp.full((F,), out.cnst_id[-1], jnp.int32)
            # rebase the lock expectation into the next block's coords
            lock_state = lock_state._replace(
                expected=lock_state.expected - F * P
            )
            return out, valid, lock_state, new_fallback

        return step

    def process(self, chunk: np.ndarray):
        """One block of block_samples samples -> (RxOut, valid [F])."""
        assert chunk.shape[-1] == self.block_samples, (
            f"feed exactly {self.block_samples} samples per call"
        )
        samples = np.concatenate([self._tail, np.asarray(chunk, np.complex64)])
        out, valid, self._lock, self._fallback = self._step(
            jnp.asarray(samples), self._lock, self._fallback
        )
        self._tail = np.asarray(chunk)[-self.tail_len :]
        return out, np.asarray(valid)
