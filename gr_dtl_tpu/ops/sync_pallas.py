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
- the 32-wide moving sums are shift-doubling reductions (5 lane-roll +
  add steps) with a carried next-row plane for the cross-row spill —
  no HBM cumsum passes,
- P (complex, as two float planes) and M are produced in one pass.

Outputs match ops/sync.timing_metric exactly (same definition:
``P(d) = sum_{m<32} conj(r[d+m]) r[d+m+32]`` with the two-sided
Cauchy-Schwarz normalization ``M = |P|^2 / (R1 * R2)`` where
``R1(d) = sum |r[d+m]|^2`` and ``R2(d) = sum |r[d+m+32]|^2`` — both
half-window energies, so M <= 1 even at signal->silence edges).
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


def _metric_kernel(re_ref, im_ref, re_halo_ref, im_halo_ref,
                   p_re_ref, p_im_ref, m_ref, *, rows):
    """All row/lane stitching is done with pltpu.roll + iota selects —
    Mosaic rejects concatenates of refs with different sublane offsets
    ("result/input offset mismatch on non-concat dimension")."""
    xr = re_ref[:, :]
    xi = im_ref[:, :]
    # halo row 0 broadcast over the block (the halo block is 8 rows to
    # satisfy sublane tiling; only its first row is needed — the
    # window+lag lookahead is 63 samples < 128)
    hr = jnp.broadcast_to(re_halo_ref[0:1, :], xr.shape)
    hi = jnp.broadcast_to(im_halo_ref[0:1, :], xi.shape)
    row = jax.lax.broadcasted_iota(jnp.int32, xr.shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, xr.shape, 1)

    def nxt(x, h):
        """Row i -> row i+1; the last row comes from the halo."""
        return jnp.where(row == rows - 1, h,
                         pltpu.roll(x, rows - 1, axis=0))

    xr_n = nxt(xr, hr)
    xi_n = nxt(xi, hi)

    def shift32(x, x_n):
        """Flat 32-sample lag: lane l -> flat position l+32.  Lanes
        < 96 read the same row (rolled); lanes >= 96 read the next
        row's first 32 lanes."""
        return jnp.where(lane < _LANES - _HALF,
                         pltpu.roll(x, _LANES - _HALF, axis=1),
                         pltpu.roll(x_n, _LANES - _HALF, axis=1))

    def products(x_r, x_i, s_r, s_i):
        # c = conj(r) * r_shift32 ; e2 = |r_shift32|^2 ; e1 = |r|^2
        return (x_r * s_r + x_i * s_i,
                x_r * s_i - x_i * s_r,
                s_r * s_r + s_i * s_i,
                x_r * x_r + x_i * x_i)

    sr = shift32(xr, xr_n)
    si = shift32(xi, xi_n)
    c_re, c_im, e2, e1 = products(xr, xi, sr, si)
    # next-row copies of the products (the 32-wide window spills up to
    # 31 flat positions into the next row).  The window sum only reads
    # next-row lanes <= 30, which shift32 serves from the *same* row
    # (lanes 32..62), so passing x_n for its own next-row argument is
    # safe: the contaminated high lanes are never used.
    sr_n = shift32(xr_n, xr_n)
    si_n = shift32(xi_n, xi_n)
    c_re_n, c_im_n, e2_n, e1_n = products(xr_n, xi_n, sr_n, si_n)

    def msum(v, v_n):
        """32-wide sliding window sum over the flat stream by
        shift-doubling: after step k, v[i] = sum of 2^(k+1) consecutive
        flat elements starting at i.  Cross-row reads use the carried
        next-row plane; its own high lanes degrade by the cumulative
        shift (< 32), which stays outside the lanes the final result
        reads (<= 30) — same argument as above."""
        for k in range(5):  # 2^5 = 32 = _HALF
            s = 1 << k
            rv = pltpu.roll(v, _LANES - s, axis=1)
            rn = pltpu.roll(v_n, _LANES - s, axis=1)
            sel = lane < _LANES - s
            v = v + jnp.where(sel, rv, rn)
            v_n = v_n + rn  # self-referential next-next row: lanes
            #                 >= 128-s wrap within v_n, contaminating
            #                 only lanes the result never reads
        return v

    P_re = msum(c_re, c_re_n)
    P_im = msum(c_im, c_im_n)
    R2 = msum(e2, e2_n)
    R1 = msum(e1, e1_n)
    # two-sided normalization (Cauchy-Schwarz: M <= 1 even at
    # signal->silence edges) — must match ops/sync.timing_metric
    M = (P_re * P_re + P_im * P_im) / jnp.maximum(R1 * R2, 1e-12)

    p_re_ref[:, :] = P_re
    p_im_ref[:, :] = P_im
    m_ref[:, :] = M


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
    )(re_in, im_in, re, im)
    P = (p_re + 1j * p_im).reshape(-1)[:out_len]
    M = m.reshape(-1)[:out_len]
    return P.astype(jnp.complex64), M


def timing_metric(r: jax.Array, fft_len: int = 64):
    """Deprecated alias: the Pallas-vs-jnp dispatch gate lives in
    ops/sync.timing_metric (default ON for 1-D streams on TPU;
    ``GR_DTL_TPU_PALLAS=0`` forces the jnp path).

    Measured through the FULL receiver on one chip (bench.py,
    2026-08-20, after the two-sided-normalization + shared-moving-sum
    rework of both paths): the kernel wins at every batch size —
    125 vs 123 Ms/s end-to-end at 256 frames/step, 177 vs 168 at 512,
    231 vs 195 at 2048 (+18%) — so it is the default on TPU.  (An
    earlier 2026-08-18 measurement had XLA's fusion winning in-pipeline;
    that inverted when the jnp path gained the second normalization
    moving-sum and the kernel kept it fused in the same VMEM pass.)
    """
    return sync_jnp.timing_metric(r, fft_len)
