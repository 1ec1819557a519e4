#!/usr/bin/env python3
"""ShardedStreamRx on the REAL chip: 1x1 mesh (collectives degenerate),
device-produced input, 3 chained process()-equivalent steps."""
import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from jax.sharding import Mesh
from gr_dtl_tpu.utils import config as cfgmod
from gr_dtl_tpu.utils.fetch import fetch_np
from gr_dtl_tpu.models import transmitter
from gr_dtl_tpu.parallel.session import ShardedStreamRx

dev = jax.devices()[0]
mesh = Mesh(np.array([dev]).reshape(1, 1), axis_names=("stream", "time"))
cfg = cfgmod.make_rx_config(None, frame_length=10)
txcfg = cfgmod.make_tx_config(None, frame_length=10)
S, F, n_blocks = 1, 4, 3
srx = ShardedStreamRx(cfg, mesh, n_streams=S, frames_per_block=F)
blk = srx.block_samples
B = (n_blocks - 1) * F
txp = transmitter.build_tx(txcfg)

@jax.jit
def gen():
    key = jax.random.PRNGKey(0)
    plen = jnp.full((B,), txcfg.frame_bytes(2) - 4, jnp.int32)
    payload = jax.random.randint(key, (B, txcfg.max_frame_bytes()), 0, 256,
                                 jnp.int32).astype(jnp.uint8)
    mask = jnp.arange(txcfg.max_frame_bytes())[None, :] < plen[:, None]
    payload = jnp.where(mask, payload, 0)
    out = transmitter.tx_frames(txp, payload, plen,
                                jnp.full((B,), 2, jnp.int32),
                                jnp.zeros((B,), jnp.int32),
                                jnp.arange(B, dtype=jnp.int32), key)
    s = out.samples.reshape(-1)
    big = jnp.zeros(n_blocks * blk, jnp.complex64)
    return big.at[137:137 + s.shape[0]].set(s)[None]  # [1, total]

stream_d = gen()

@jax.jit
def window(s, b):
    return jax.lax.dynamic_slice(s, (0, b * blk), (S, blk))

n_ok = 0
lock = (srx._lock.locked, srx._lock.expected, srx._lock.sync_count,
        srx._lock.miss_count)
tail, fb, exp, tb = srx._tail, srx._fallback, srx._expected_no, srx._tb_state
for b in range(n_blocks):
    w = window(stream_d, jnp.int32(b))
    (out, valid, lock, fb, exp, tb, _tbout, acct, tail) = srx._step(
        w, tail, lock, fb, exp, tb)
    a = fetch_np(acct)
    n_ok += int(a[0, 1])
print("SHARDED_CHIP_OK frames_received=", n_ok, "of", B)
assert n_ok == B
