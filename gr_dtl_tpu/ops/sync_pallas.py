"""Pallas TPU kernel: fused Schmidl-Cox timing metric.

The jnp implementation (ops/sync.timing_metric) makes several
memory-bound passes over the stream (lagged product, two cumsum-based
moving sums, magnitude, normalize).  This kernel fuses the whole metric
into one VMEM-resident pass per block:

- each grid step DMAs its block plus a one-row (128-sample) halo from
  HBM into VMEM scratch (double-buffer-free: the DMA is tiny vs compute),
- the stream is viewed as ``[rows, 128]`` lanes; the flat 32-sample lag
  is the lane-concat of ``x[:, 32:]`` with the next row's first 32
  lanes,
- the 32-wide moving sums become two banded ``[128, 128]`` matmuls
  (current row band + next-row spill band) — windowed sums on the MXU
  instead of cumsums in HBM,
- P (complex, as two float planes) and M are produced in one pass.

Outputs match ops/sync.timing_metric exactly (same definition:
``P(d) = sum_{m<32} conj(r[d+m]) r[d+m+32]``, ``M = |P|^2/R^2``).
``timing_metric`` below dispatches to the kernel on TPU and falls back
to the jnp version elsewhere (tests run the kernel in interpreter mode
for bit-level comparison).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gr_dtl_tpu.ops import sync as sync_jnp

__all__ = ["timing_metric", "timing_metric_pallas"]

_LANES = 128
_HALF = 32  # repetition lag (fft_len // 2)


@functools.lru_cache(maxsize=None)
def _band_mats():
    """B1[l', l] = 1 for l <= l' <= l+31 (same-row window part);
    B2[l', l] = 1 for l' <= l - 97    (next-row spill part)."""
    l = np.arange(_LANES)
    lp = np.arange(_LANES)[:, None]
    b1 = ((lp >= l[None, :]) & (lp <= l[None, :] + _HALF - 1)).astype(np.float32)
    b2 = (lp <= l[None, :] - (_LANES - _HALF + 1)).astype(np.float32)
    return b1, b2


def _metric_kernel(re_ref, im_ref, re_halo_ref, im_halo_ref, b1_ref, b2_ref,
                   p_re_ref, p_im_ref, m_ref, *, rows):
    B1 = b1_ref[:, :]
    B2 = b2_ref[:, :]

    # stitch the halo's first row below the block: [rows+1, 128]
    # (the halo block is 8 rows to satisfy TPU sublane tiling; only the
    # first row is needed — lookahead is 63 samples < 128)
    xr = jnp.concatenate([re_ref[:, :], re_halo_ref[:1, :]], axis=0)
    xi = jnp.concatenate([im_ref[:, :], im_halo_ref[:1, :]], axis=0)

    def up1(x):
        # bring row i+1 to row i (pltpu.roll needs non-negative shifts)
        return pltpu.roll(x, x.shape[0] - 1, axis=0)

    def flat_shift32(x):
        return jnp.concatenate([x[:, _HALF:], up1(x)[:, :_HALF]], axis=1)

    sr = flat_shift32(xr)
    si = flat_shift32(xi)
    # c = conj(r) * r_shift32
    c_re = xr * sr + xi * si
    c_im = xr * si - xi * sr
    e = sr * sr + si * si

    def msum(x):
        nxt = up1(x)
        return (
            jnp.dot(x, B1, preferred_element_type=jnp.float32)
            + jnp.dot(nxt, B2, preferred_element_type=jnp.float32)
        )

    P_re = msum(c_re)
    P_im = msum(c_im)
    R = msum(e)
    M = (P_re * P_re + P_im * P_im) / jnp.maximum(R * R, 1e-12)

    p_re_ref[:, :] = P_re[:rows]
    p_im_ref[:, :] = P_im[:rows]
    m_ref[:, :] = M[:rows]


def timing_metric_pallas(r: jax.Array, fft_len: int = 64,
                         block_rows: int = 64, interpret: bool = False):
    # block_rows must be a multiple of 8 (TPU sublane tiling)
    """Fused metric over a [N] complex64 stream; returns (P, M) like
    ops/sync.timing_metric (length N - fft_len)."""
    assert fft_len == 2 * _HALF, "kernel is specialized for fft_len=64"
    n = r.shape[-1]
    out_len = n - fft_len
    block = block_rows * _LANES
    n_blocks = -(-out_len // block)
    # pad so every block has a full halo row beyond its end (the
    # window+lag lookahead of 63 samples fits inside one 128-lane row)
    padded = (n_blocks * block_rows + 8) * _LANES
    rp = jnp.pad(r, (0, max(0, padded - n)))
    re = jnp.real(rp).astype(jnp.float32).reshape(-1, _LANES)
    im = jnp.imag(rp).astype(jnp.float32).reshape(-1, _LANES)
    re_in, im_in = re[: n_blocks * block_rows], im[: n_blocks * block_rows]

    grid = (n_blocks,)
    kernel = functools.partial(_metric_kernel, rows=block_rows)
    # overlapping windows are expressed as a second (1-row) input view:
    # block i gets rows [i*R, (i+1)*R) plus halo row (i+1)*R
    p_re, p_im, m = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, _LANES), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, _LANES), lambda i: (i, 0)),
            pl.BlockSpec((8, _LANES), lambda i: ((i + 1) * block_rows // 8, 0)),
            pl.BlockSpec((8, _LANES), lambda i: ((i + 1) * block_rows // 8, 0)),
            pl.BlockSpec((_LANES, _LANES), lambda i: (0, 0)),
            pl.BlockSpec((_LANES, _LANES), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_rows, _LANES), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, _LANES), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, _LANES), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks * block_rows, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks * block_rows, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks * block_rows, _LANES), jnp.float32),
        ],
        interpret=interpret,
    )(re_in, im_in, re, im, *(jnp.asarray(b) for b in _band_mats()))
    P = (p_re + 1j * p_im).reshape(-1)[:out_len]
    M = m.reshape(-1)[:out_len]
    return P.astype(jnp.complex64), M


def timing_metric(r: jax.Array, fft_len: int = 64):
    """Dispatch: Pallas kernel on TPU (opt-in), jnp elsewhere.

    The kernel is gated behind ``GR_DTL_TPU_PALLAS=1`` because some TPU
    access paths (e.g. the axon remote-compile tunnel used in this
    repo's CI environment) cannot compile Mosaic kernels even though
    regular XLA works; the XLA path already exceeds the throughput
    target, so the kernel is a further optimization where available.
    """
    import os

    try:
        on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        on_tpu = False
    if (on_tpu and fft_len == 64 and r.ndim == 1
            and os.environ.get("GR_DTL_TPU_PALLAS") == "1"):
        return timing_metric_pallas(r, fft_len)
    return sync_jnp.timing_metric(r, fft_len)
