"""Bit repacking: bytes <-> k-bit symbols, LSB-first, batched and adaptive.

TPU-native design note
----------------------
The reference keeps a *stateful* bit repacker carrying partial-byte
indexes across streaming work calls (``lib/testbed/repack.cc:31-112``).
In the frame-batched dataflow repacking is stateless by construction:
every frame owns a whole number of symbols, and the bits-per-symbol
``k`` may differ per frame (adaptive MCS).  The variable-``k`` repack is
a single gather over an unpacked bit tensor — static shapes, no
branches, uniform across a mixed batch.

Bit order matches the reference's LSB-first convention
(``repack.cc:48-67``): symbol ``s`` of a frame takes bits
``s*k .. s*k+k-1`` of the byte stream, each byte contributing its LSB
first; bit ``j`` of a symbol is bit ``s*k+j`` of the stream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "bytes_to_bits",
    "bits_to_bytes",
    "bytes_to_symbols",
    "symbols_to_bytes",
]


def bytes_to_bits(data: jax.Array) -> jax.Array:
    """[.., N] uint8 -> [.., N*8] bits (LSB of each byte first)."""
    bits = (data[..., None] >> jnp.arange(8, dtype=jnp.uint8)) & 1
    return bits.reshape(*data.shape[:-1], data.shape[-1] * 8)


def bits_to_bytes(bits: jax.Array) -> jax.Array:
    """[.., N*8] bits -> [.., N] uint8 (LSB-first within each byte)."""
    b = bits.reshape(*bits.shape[:-1], bits.shape[-1] // 8, 8).astype(jnp.uint8)
    weights = (jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8))
    return jnp.sum(b * weights, axis=-1, dtype=jnp.uint8)


def bytes_to_symbols(data: jax.Array, bps: jax.Array, n_symbols: int) -> jax.Array:
    """Repack bytes into k-bit symbols with per-frame k.

    Args:
      data:      [B, max_bytes] uint8.
      bps:       [B] int32 bits per symbol (1..4); bits read beyond the
                 byte buffer are taken as 0 via index clamping (callers
                 size max_bytes >= n_symbols*max_bps/8 to avoid it).
      n_symbols: static symbol count per frame.
    Returns [B, n_symbols] int32 symbol indices.
    """
    bits = bytes_to_bits(data)  # [B, max_bits]
    max_bits = bits.shape[-1]
    s = jnp.arange(n_symbols, dtype=jnp.int32)[None, :, None]  # [1, S, 1]
    j = jnp.arange(4, dtype=jnp.int32)[None, None, :]  # [1, 1, 4]
    k = bps[:, None, None].astype(jnp.int32)  # [B, 1, 1]
    idx = s * k + j
    valid = j < k
    idx = jnp.clip(idx, 0, max_bits - 1)
    got = jnp.take_along_axis(bits, idx.reshape(bits.shape[0], -1), axis=-1)
    got = got.reshape(bits.shape[0], n_symbols, 4).astype(jnp.int32)
    got = jnp.where(valid, got, 0)
    weights = jnp.int32(1) << jnp.arange(4, dtype=jnp.int32)
    return jnp.sum(got * weights, axis=-1, dtype=jnp.int32)


def symbols_to_bytes(symbols: jax.Array, bps: jax.Array, max_bytes: int) -> jax.Array:
    """Inverse of :func:`bytes_to_symbols`.

    Args:
      symbols:  [B, n_symbols] int32.
      bps:      [B] int32 bits per symbol.
      max_bytes: static output byte count (bits beyond n_symbols*bps are 0).
    Returns [B, max_bytes] uint8.
    """
    B, S = symbols.shape
    # bit t of the stream = bit (t mod k) of symbol (t div k)
    t = jnp.arange(max_bytes * 8, dtype=jnp.int32)[None, :]  # [1, T]
    k = bps[:, None].astype(jnp.int32)
    sym_i = t // k
    bit_j = t - sym_i * k
    valid = sym_i < S
    sym_i = jnp.clip(sym_i, 0, S - 1)
    vals = jnp.take_along_axis(symbols, sym_i, axis=-1)
    bits = (vals >> bit_j) & 1
    bits = jnp.where(valid, bits, 0)
    return bits_to_bytes(bits)
