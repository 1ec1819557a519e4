"""Channel models for loopback testing: AWGN, CFO, multipath FIR.

Replaces the reference's test channel (``channels.channel_model`` —
AWGN + frequency offset + static taps; SURVEY.md §2e) with jitted array
ops so a whole simulation sweep runs on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["awgn", "apply_cfo", "fir_channel", "channel_model",
           "selective_fading", "sample_clock_offset"]


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


def sample_clock_offset(x: jax.Array, ppm: float) -> jax.Array:
    """Sample-frequency offset (SFO): resample by ``1 + ppm * 1e-6``.

    Models TX/RX sample-clock mismatch — the impairment the reference's
    trigger-repair block exists to absorb
    (``ofdm_adaptive_frame_detect_bb_impl.cc:64-173``: accumulated ±1
    trigger drift detection/correction).  Output sample ``n`` reads the
    input at position ``n * (1 + ppm*1e-6)`` via Catmull-Rom cubic
    interpolation (accurate to ~-45 dB for this 52/64-occupied OFDM
    signal; plenty below the test SNRs).  The fractional drift
    ``n * delta`` is computed separately from the integer ramp so f32
    keeps sub-sample precision over multi-second captures.
    """
    N = x.shape[-1]
    delta = float(ppm) * 1e-6
    n = jnp.arange(N, dtype=jnp.int32)
    d = n.astype(jnp.float32) * jnp.float32(delta)
    di = jnp.floor(d).astype(jnp.int32)
    mu = d - di.astype(jnp.float32)  # fractional part, [0, 1)
    idx = n + di

    def at(k):
        return x[..., jnp.clip(idx + k, 0, N - 1)]

    xm1, x0, x1, x2 = at(-1), at(0), at(1), at(2)
    mu = mu.astype(x.real.dtype)
    a = (-xm1 + 3 * x0 - 3 * x1 + x2) * 0.5
    b = xm1 - 2.5 * x0 + 2 * x1 - 0.5 * x2
    c = (x1 - xm1) * 0.5
    return ((a * mu + b) * mu + c) * mu + x0


def selective_fading(key: jax.Array, x: jax.Array, *,
                     delays=(0, 3, 7), powers_db=(0.0, -3.0, -6.0),
                     doppler_norm: float = 1e-4,
                     n_sinusoids: int = 8) -> jax.Array:
    """Time-varying Rayleigh frequency-selective fading.

    The analog of the reference's test channel
    ``channels.selective_fading_model2`` (SURVEY.md §2e): each discrete
    delay tap fades independently with a Jakes-like sum-of-sinusoids
    process; the taps are then applied as a time-varying FIR.

    Args:
      x:            [N] complex stream.
      delays:       integer tap delays in samples.
      powers_db:    average power per tap (normalized internally).
      doppler_norm: max Doppler as a fraction of the sample rate
                    (f_d / f_s); 1e-4 at 64-sample symbols means the
                    channel decorrelates over ~100 OFDM symbols.
      n_sinusoids:  sinusoids per tap for the Jakes sum.
    """
    n = x.shape[-1]
    p = 10.0 ** (jnp.asarray(powers_db, jnp.float32) / 10.0)
    p = p / jnp.sum(p)
    t = jnp.arange(n, dtype=jnp.float32)

    keys = jax.random.split(key, 3)
    L = len(delays)
    alpha = jax.random.uniform(keys[0], (L, n_sinusoids), minval=0.0,
                               maxval=2 * jnp.pi)
    phi = jax.random.uniform(keys[1], (L, n_sinusoids), minval=0.0,
                             maxval=2 * jnp.pi)
    psi = jax.random.uniform(keys[2], (L, n_sinusoids), minval=0.0,
                             maxval=2 * jnp.pi)
    # h_l(t) = sqrt(p_l / K) sum_k exp(i(2 pi f_d cos(a_k) t + phi_k))
    # with a quadrature component for proper Rayleigh statistics
    w = 2 * jnp.pi * doppler_norm * jnp.cos(alpha)  # [L, K]
    ang = w[:, :, None] * t[None, None, :]  # [L, K, N]
    h = (jnp.cos(ang + phi[:, :, None]) + 1j * jnp.cos(ang + psi[:, :, None]))
    h = jnp.sum(h, axis=1) * jnp.sqrt(p[:, None] / (2 * n_sinusoids))  # [L, N]

    y = jnp.zeros_like(x)
    for i, d in enumerate(delays):
        xd = jnp.concatenate([jnp.zeros(d, x.dtype), x[: n - d]]) if d else x
        y = y + h[i] * xd
    return y
