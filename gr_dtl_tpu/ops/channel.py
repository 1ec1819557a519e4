"""Channel models for loopback testing: AWGN, CFO, multipath FIR.

Replaces the reference's test channel (``channels.channel_model`` —
AWGN + frequency offset + static taps; SURVEY.md §2e) with jitted array
ops so a whole simulation sweep runs on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["awgn", "apply_cfo", "fir_channel", "channel_model"]


def awgn(key: jax.Array, x: jax.Array, noise_voltage: float | jax.Array) -> jax.Array:
    """Add complex white noise with E|n|^2 = noise_voltage^2
    (per-complex-sample power, matching gr channel_model semantics where
    ``noise_voltage`` is the amplitude fed to both I/Q noise sources)."""
    kr, ki = jax.random.split(key)
    std = jnp.asarray(noise_voltage) / jnp.sqrt(2.0)
    n = std * (
        jax.random.normal(kr, x.shape, dtype=jnp.float32)
        + 1j * jax.random.normal(ki, x.shape, dtype=jnp.float32)
    )
    return x + n.astype(jnp.complex64)


def apply_cfo(x: jax.Array, freq_offset: float | jax.Array, fft_len: int = 64) -> jax.Array:
    """Rotate by a carrier frequency offset given in *subcarrier units*
    (1.0 = one OFDM carrier spacing = fs/fft_len)."""
    n = jnp.arange(x.shape[-1], dtype=jnp.float32)
    ph = 2.0 * jnp.pi * jnp.asarray(freq_offset) * n / fft_len
    return x * jnp.exp(1j * ph.astype(jnp.float32))


def fir_channel(x: jax.Array, taps: jax.Array) -> jax.Array:
    """Causal FIR multipath channel, same length output."""
    t = jnp.asarray(taps, dtype=jnp.complex64)
    pad = jnp.zeros(t.shape[-1] - 1, dtype=x.dtype)
    xp = jnp.concatenate([pad, x], axis=-1)

    def tap_sum(i, acc):
        return acc + t[i] * jax.lax.dynamic_slice_in_dim(
            xp, t.shape[-1] - 1 - i, x.shape[-1], axis=-1
        )

    return jax.lax.fori_loop(0, t.shape[-1], tap_sum, jnp.zeros_like(x))


def channel_model(key: jax.Array, x: jax.Array, *, noise_voltage=0.0,
                  freq_offset=0.0, taps=(1.0,), fft_len: int = 64) -> jax.Array:
    """AWGN + CFO + static multipath, the loopback test channel."""
    y = fir_channel(x, jnp.asarray(taps, jnp.complex64))
    y = apply_cfo(y, freq_offset, fft_len)
    return awgn(key, y, noise_voltage)
