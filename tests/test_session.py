"""Continuous streaming receiver: chunked stream with frames straddling
block boundaries, each frame demodulated exactly once, in order."""

import jax
import jax.numpy as jnp
import numpy as np

from gr_dtl_tpu.utils import config as cfgmod
from gr_dtl_tpu.ops import channel, constellation as cn
from gr_dtl_tpu.models import session, transmitter


def test_stream_rx_chunked():
    cfg = cfgmod.make_rx_config(None, frame_length=10)
    txcfg = cfgmod.make_tx_config(None, frame_length=10)
    txp = transmitter.build_tx(txcfg)
    F = 4
    n_blocks = 5
    B = F * n_blocks
    rng = np.random.RandomState(0)
    cnst = rng.randint(1, 5, size=B).astype(np.int32)
    maxb = txcfg.max_frame_bytes()
    payload = np.zeros((B, maxb), np.uint8)
    plen = np.zeros(B, np.int32)
    for i in range(B):
        plen[i] = txcfg.frame_bytes(int(cn.BITS_PER_SYMBOL[cnst[i]])) - 4
        payload[i, : plen[i]] = rng.randint(0, 256, plen[i])
    out = transmitter.tx_frames(
        txp, jnp.asarray(payload), jnp.asarray(plen), jnp.asarray(cnst),
        jnp.zeros(B, jnp.int32), jnp.arange(B, dtype=jnp.int32),
        jax.random.PRNGKey(0),
    )
    rx = session.StreamRx(cfg, frames_per_block=F)
    S = rx.block_samples
    # frames start mid-block (offset 300) so every block boundary cuts
    # a frame; total stream padded to a whole number of blocks
    stream = np.concatenate([
        np.zeros(300, np.complex64),
        np.asarray(out.samples).reshape(-1),
        np.zeros((n_blocks + 1) * S, np.complex64),
    ])[: (n_blocks + 1) * S]
    sig = float(np.mean(np.abs(np.asarray(out.samples)) ** 2))
    stream = np.asarray(channel.awgn(jax.random.PRNGKey(1), jnp.asarray(stream),
                                     float(np.sqrt(sig / 10**3))))

    decoded = {}
    for b in range(n_blocks + 1):
        outb, valid = rx.process(stream[b * S : (b + 1) * S])
        ok = np.asarray(outb.crc_ok)
        nos = np.asarray(outb.frame_no)
        pays = np.asarray(outb.payload)
        lens = np.asarray(outb.payload_len)
        for i in range(F):
            if ok[i] and valid[i]:
                assert nos[i] not in decoded, f"frame {nos[i]} decoded twice"
                decoded[int(nos[i])] = pays[i, : lens[i]].tobytes()

    assert len(decoded) == B, (sorted(decoded), B)
    for i in range(B):
        assert decoded[i] == payload[i, : plen[i]].tobytes(), f"frame {i} mismatch"
