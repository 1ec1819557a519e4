"""Sharded receiver: many streams x time-blocked sample timelines.

TPU-native design note
----------------------
This layer replaces the GNU Radio scheduler's concurrency (SURVEY.md
§2f) with SPMD over a ``(stream, time)`` mesh:

- the **stream axis** shards independent adaptive-OFDM channels (pure
  data parallelism; no cross-talk),
- the **time axis** shards one channel's sample timeline into
  contiguous blocks.  The Schmidl-Cox correlator and frame extraction
  need to look past a block's right edge, so each shard fetches a halo
  of ``frame_samples + fft_len`` samples from its right neighbour with
  ``jax.lax.ppermute`` (overlap-save over ICI), and the frame-phase
  vote is made global with a ``psum`` so every block agrees on trigger
  positions ("trigger ownership": a frame belongs to the block its
  start sample lies in).

Block length must be a multiple of ``frame_samples`` so the folded
trigger phase is identical in every block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from gr_dtl_tpu.ops import sync
from gr_dtl_tpu.models import receiver

__all__ = ["build_sharded_rx"]


def build_sharded_rx(cfg, mesh, frames_per_block: int):
    """Jitted sharded receiver over a (stream, time) mesh.

    Returns ``fn(streams) -> RxOut-pytree`` where ``streams`` is
    ``[n_streams, n_blocks*block_samples]`` complex64 and every leaf of
    the result has leading dims ``[n_streams, n_blocks*frames_per_block]``.
    """
    rxp = receiver.build_rx(cfg)
    frame_samples = cfg.frame_samples
    block = frames_per_block * frame_samples
    halo = frame_samples + cfg.fft_len  # finish boundary frames + metric window
    n_time = mesh.shape["time"]

    def local_block_rx(ext):
        """One stream's local block + right halo -> frames_per_block results.

        ext: [block + halo] samples.
        """
        Pm, M = sync.timing_metric(ext, cfg.fft_len)
        # local vote over the block only (exclude halo to keep votes
        # disjoint), then global consensus across time blocks
        n_full = block // frame_samples
        folded = jnp.sum(
            M[: n_full * frame_samples].reshape(n_full, frame_samples), axis=0
        )
        folded = jax.lax.psum(folded, "time")
        # circular plateau-center vote (a raw argmax can land on the
        # wrap edge and make every block decode its neighbour's frame
        # through the halo)
        phase = sync.phase_from_folded(folded, frame_samples, cfg.cp_len)
        trig = sync.frame_triggers(M, phase, frame_samples, frames_per_block)
        eps = sync.fine_cfo(Pm, trig, cfg.cp_len)
        offs = jnp.arange(frame_samples, dtype=jnp.int32)
        idx = jnp.clip(trig[:, None] + offs[None, :], 0, ext.shape[-1] - 1)
        frames = sync.cfo_correct(ext[idx], eps, cfg.fft_len)
        return receiver.rx_frames(rxp, frames)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=P("stream", "time"),
        out_specs=P("stream", "time"),
        check_vma=False,
    )
    def rx_sharded(streams_block):
        # local view: [S_local, block]
        right = jax.lax.ppermute(
            streams_block[:, :halo],
            "time",
            [(i, (i - 1) % n_time) for i in range(n_time)],
        )
        ext = jnp.concatenate([streams_block, right], axis=1)
        out = jax.vmap(local_block_rx)(ext)
        return out

    def fn(streams):
        return rx_sharded(streams)

    return jax.jit(fn), rxp
