"""Pallas Schmidl-Cox kernel vs the jnp reference (interpreter mode on
the CPU test mesh; the real-TPU path is exercised by bench tooling)."""

import jax.numpy as jnp
import numpy as np

from gr_dtl_tpu.ops import sync, sync_pallas


def test_pallas_metric_matches_reference():
    rng = np.random.RandomState(0)
    for N in (9000, 8256):
        r = (rng.randn(N) + 1j * rng.randn(N)).astype(np.complex64)
        P0, M0 = sync.timing_metric(jnp.asarray(r), 64)
        P1, M1 = sync_pallas.timing_metric_pallas(jnp.asarray(r), 64, interpret=True)
        assert P0.shape == P1.shape
        np.testing.assert_allclose(np.asarray(P0), np.asarray(P1), atol=2e-4)
        np.testing.assert_allclose(np.asarray(M0), np.asarray(M1), atol=2e-3)


def test_pallas_metric_detects_frames():
    """Detection pipeline works when fed the Pallas metric."""
    import jax

    from gr_dtl_tpu.utils import config as cfgmod
    from gr_dtl_tpu.models import transmitter

    cfg = cfgmod.make_tx_config(None, frame_length=10)
    txp = transmitter.build_tx(cfg)
    B = 4
    rng = np.random.RandomState(1)
    maxb = cfg.max_frame_bytes()
    payload = np.zeros((B, maxb), np.uint8)
    plen = np.full(B, cfg.frame_bytes(1) - 4, np.int32)
    for i in range(B):
        payload[i, : plen[i]] = rng.randint(0, 256, plen[i])
    out = transmitter.tx_frames(
        txp, jnp.asarray(payload), jnp.asarray(plen),
        jnp.ones(B, jnp.int32), jnp.zeros(B, jnp.int32),
        jnp.arange(B, dtype=jnp.int32), jax.random.PRNGKey(0),
    )
    stream = jnp.concatenate([jnp.zeros(200, jnp.complex64),
                              out.samples.reshape(-1)])
    P, M = sync_pallas.timing_metric_pallas(stream, 64, interpret=True)
    phase = sync.fold_detect(M, cfg.frame_samples)
    trig = sync.frame_triggers(M, phase, cfg.frame_samples, B)
    t = np.asarray(trig) - 200 - np.arange(B) * cfg.frame_samples
    assert np.all((t >= 0) & (t <= 16)), t  # on the metric plateau
