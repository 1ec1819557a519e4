"""Constellation map/demap round trips per type + mixed batches + LLR signs.

Mirrors the reference QA pattern qa_ofdm_adaptive_chunks_to_symbols_bc.py:39-63
(map -> decision round trip per constellation).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gr_dtl_tpu.ops import constellation as cn


@pytest.mark.parametrize("ctype", [cn.ConstellationType.BPSK, cn.ConstellationType.QPSK,
                                   cn.ConstellationType.PSK8, cn.ConstellationType.QAM16])
def test_map_decision_roundtrip(ctype):
    bps = int(cn.BITS_PER_SYMBOL[ctype])
    syms = np.arange(1 << bps, dtype=np.int32)[None, :]
    cid = np.array([int(ctype)], dtype=np.int32)
    pts = cn.map_symbols(jnp.asarray(syms), jnp.asarray(cid))
    dec = cn.hard_decision(pts, jnp.asarray(cid))
    np.testing.assert_array_equal(np.asarray(dec), syms)


def test_qpsk_normalized_scaling():
    # ref constellation.cc:18-24 scales QPSK by 0.5
    pts = np.asarray(cn.POINTS[int(cn.ConstellationType.QPSK), :4])
    np.testing.assert_allclose(np.abs(pts), 0.5, atol=1e-6)


def test_mixed_batch_roundtrip():
    rng = np.random.RandomState(0)
    B, n = 8, 64
    cids = rng.randint(1, 5, size=B).astype(np.int32)
    syms = np.array([rng.randint(0, 1 << cn.BITS_PER_SYMBOL[c], size=n) for c in cids],
                    dtype=np.int32)
    pts = cn.map_symbols(jnp.asarray(syms), jnp.asarray(cids))
    noisy = np.asarray(pts) + 0.01 * (rng.randn(B, n) + 1j * rng.randn(B, n))
    dec = cn.hard_decision(jnp.asarray(noisy.astype(np.complex64)), jnp.asarray(cids))
    np.testing.assert_array_equal(np.asarray(dec), syms)


def test_llr_sign_convention():
    # noiseless symbols: LLR > 0 iff the transmitted bit is 0
    for ctype in (cn.ConstellationType.QPSK, cn.ConstellationType.QAM16):
        bps = int(cn.BITS_PER_SYMBOL[ctype])
        syms = np.arange(1 << bps, dtype=np.int32)[None, :]
        cid = np.array([int(ctype)], dtype=np.int32)
        pts = cn.map_symbols(jnp.asarray(syms), jnp.asarray(cid))
        llr = np.asarray(cn.soft_llrs(pts, jnp.asarray(cid), jnp.asarray([0.1])))
        for s in range(1 << bps):
            for b in range(bps):
                bit = (s >> b) & 1
                assert (llr[0, s, b] < 0) == (bit == 1), (ctype, s, b)
        # bits above bps are zeroed
        assert np.all(llr[..., bps:] == 0)


def test_min_distance_table():
    d = cn.min_distances()
    assert abs(d[int(cn.ConstellationType.BPSK)] - 2.0) < 1e-6
    assert abs(d[int(cn.ConstellationType.QAM16)] - 2.0 / np.sqrt(10)) < 1e-6
