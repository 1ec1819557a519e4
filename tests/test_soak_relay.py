"""Unit tests for the soak harness's impairment relay
(tools/soak_link.py): the CFO/SFO state must be continuous across
chunk boundaries — a phase or resampler-position glitch at block edges
would masquerade as channel impairment and invalidate the soak's
lost-frame accounting."""

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(HERE, "tools"))

from soak_link import ImpairRelay  # noqa: E402


def _run_chunks(relay, x, chunk):
    out = []
    for i in range(0, len(x), chunk):
        out.append(relay(x[i: i + chunk]))
    return np.concatenate(out)


def test_chunking_invariance():
    """Same stream through different chunk sizes -> identical output
    (state carried exactly: CFO phase, resampler position, holdover)."""
    rng = np.random.RandomState(0)
    x = (rng.randn(30000) + 1j * rng.randn(30000)).astype(np.complex64)
    # noise seeded identically; same draw order only if chunking doesn't
    # change the number of noise samples drawn per output sample -> use
    # noise 0 (snr inf) to isolate the deterministic state
    r1 = ImpairRelay(300.0, 0.3, 5e4, 50.0, seed=1)
    r2 = ImpairRelay(300.0, 0.3, 5e4, 50.0, seed=1)
    y1 = _run_chunks(r1, x, 1000)
    y2 = _run_chunks(r2, x, 7333)
    n = min(len(y1), len(y2))
    np.testing.assert_allclose(y1[:n], y2[:n], rtol=0, atol=2e-5)


def test_sfo_rate():
    """+ppm clock: output length ~= input / (1 + ppm*1e-6)."""
    x = np.ones(1_000_000, np.complex64)
    r = ImpairRelay(300.0, 0.0, 1e9, 100.0, seed=2)
    y = _run_chunks(r, x, 65536)
    expect = len(x) / (1 + 100e-6)
    assert abs(len(y) - expect) < 3


def test_cfo_is_continuous_phase():
    """With a constant-envelope input and no noise/SFO, consecutive
    output samples must never jump more than the max CFO step."""
    x = np.ones(200_000, np.complex64)
    r = ImpairRelay(300.0, 0.5, 1e5, 0.0, seed=3)
    y = _run_chunks(r, x, 9999)
    dphi = np.angle(y[1:] * np.conj(y[:-1]))
    max_step = 0.5 * 2 * np.pi / 64  # cfo_max in rad/sample
    assert np.max(np.abs(dphi)) <= max_step * 1.01


def test_awgn_power():
    """Injected noise variance matches the requested SNR (0.81 signal
    power convention of the sample-link tools)."""
    x = np.zeros(500_000, np.complex64)
    snr_db = 18.0
    r = ImpairRelay(snr_db, 0.0, 1e9, 0.0, seed=4)
    y = _run_chunks(r, x, 50_000)
    want = 0.81 / 10 ** (snr_db / 10)
    got = np.mean(np.abs(y) ** 2)
    assert abs(got - want) / want < 0.05
