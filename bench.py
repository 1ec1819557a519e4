"""Benchmark: OFDM receiver throughput on the real chip.

Prints ONE JSON line:
  {"metric": "ofdm_demod_throughput", "value": X, "unit": "Msamples/s",
   "vs_baseline": X/100}

The metric counts complex baseband samples fully demodulated per second
through the *complete* receiver: Schmidl-Cox detection over the raw
stream + frame extraction + CFO correction + FFT + carrier-offset
search + channel estimation + 2-pass decision-directed equalizer +
header parse + adaptive demap + repack + CRC32 verify.

Baseline = the project north star of 100 Msamples/s/chip (BASELINE.md;
the reference publishes no speed numbers — its examples run at
0.2-0.9 MS/s CPU/SDR rates).

Axon-tunnel notes: device->host transfers are slow on first use and
occasionally UNIMPLEMENTED, so results are fetched best-effort after
timing; compile time dominates wall time, so the batch is kept at 256
frames (measured throughput is batch-insensitive above ~128).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gr_dtl_tpu.utils import config as cfgmod
    from gr_dtl_tpu.ops import channel, constellation as cn
    from gr_dtl_tpu.models import receiver, transmitter

    cfg = cfgmod.make_rx_config(None, frame_length=20)
    txcfg = cfgmod.make_tx_config(None, frame_length=20)
    txp = transmitter.build_tx(txcfg)
    rxp = receiver.build_rx(cfg)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256  # frames per step
    n_samples = B * cfg.frame_samples

    rng = np.random.RandomState(0)
    maxb = txcfg.max_frame_bytes()
    cnst = rng.randint(1, 5, size=B).astype(np.int32)
    payload = np.zeros((B, maxb), np.uint8)
    plen = np.zeros(B, np.int32)
    for i in range(B):
        plen[i] = txcfg.frame_bytes(int(cn.BITS_PER_SYMBOL[cnst[i]])) - 4
        payload[i, : plen[i]] = rng.randint(0, 256, plen[i])
    # keep every stage jitted: on the axon tunnel each *eager* op is a
    # host round trip, which turns the eager TX into minutes of dispatch
    @jax.jit
    def make_stream(payload, plen, cnst, frame_no, key):
        out = transmitter.tx_frames(
            txp, payload, plen, cnst,
            jnp.zeros(B, jnp.int32), frame_no, key,
        )
        return channel.awgn(jax.random.PRNGKey(1), out.samples.reshape(-1), 0.02)

    stream = make_stream(
        jnp.asarray(payload), jnp.asarray(plen), jnp.asarray(cnst),
        jnp.arange(B, dtype=jnp.int32) % 4096, jax.random.PRNGKey(0),
    )

    detect = jax.jit(lambda s: receiver.detect_and_extract(s, cfg, B))
    demod = jax.jit(lambda f: receiver.rx_frames(rxp, f))

    # warmup / compile
    frames, _ = jax.block_until_ready(detect(stream))
    res = jax.block_until_ready(demod(frames))

    # per-dispatch latency over the remote tunnel dwarfs the ~0.1 ms
    # step, so chain INNER iterations inside one jitted graph (the roll
    # makes each inner pass data-dependent so XLA can't CSE them away)
    INNER = 8

    @jax.jit
    def rx_chained(stream):
        def body(i, acc):
            s = jnp.roll(stream, i)
            frames, _ = receiver.detect_and_extract(s, cfg, B)
            r = receiver.rx_frames(rxp, frames)
            return acc + jnp.sum(r.crc_ok)
        return jax.lax.fori_loop(0, INNER, body, jnp.int32(0))

    jax.block_until_ready(rx_chained(stream))
    iters = 6
    t0 = time.perf_counter()
    for _ in range(iters):
        out = rx_chained(stream)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (iters * INNER)

    msps = n_samples / dt / 1e6
    # best-effort correctness telemetry (transfers can be flaky)
    try:
        ok = float(jax.jit(lambda r: r.crc_ok.astype(jnp.float32).mean())(res))
    except Exception:
        ok = None
    print(json.dumps({
        "metric": "ofdm_demod_throughput",
        "value": round(msps, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(msps / 100.0, 3),
        "extra": {"frames_per_step": B, "crc_ok_rate": ok,
                  "step_ms": round(dt * 1e3, 3)},
    }))


if __name__ == "__main__":
    main()
