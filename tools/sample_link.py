#!/usr/bin/env python3
"""Two-process modem link over a real byte stream (TCP samples).

The live-I/O counterpart of the reference's Pluto examples
(``/root/reference/examples/ofdm_adaptive_pluto_tx.grc``,
``examples/ofdm_adaptive_pluto.json:2-5``): two OS processes exchange
complex64 samples over a duplex TCP connection — forward OFDM frames
one way, the reverse feedback-burst capture the other — through the
``testbed/sample_io.py`` source/sink boundary that a real SDR front-end
would plug into.

  TX node:  StreamTx --> sink  |  source --> StreamBurstRx --> MCS switch
  RX node:  source --> (AWGN) --> StreamRx --> MCS decision --> burst --> sink

The protocol is strictly alternating per block (TX: write fwd, read
rev; RX: read fwd, write rev), so the link is deadlock-free for any
block size.  AWGN is injected host-side at the RX (the "RF channel" of
this wired setup); the adaptation loop must climb the MCS ladder from
BPSK to whatever the configured SNR supports, via real decoded feedback
bursts flowing back over the socket.

Modes:
  --tx / --rx        one node (connect/listen per --port/--host)
  --loopback-test    spawn both nodes as subprocesses on localhost,
                     collect their JSON reports, assert CRC-clean
                     decode + adaptation convergence, write --out
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)


def _cpu_platform():
    # node subprocesses pin CPU (both sides of the link are host loops;
    # the test must not depend on the chip) unless the caller forces TPU
    if os.environ.get("RUN_MODEM_TPU", "0") != "1":
        import jax

        jax.config.update("jax_platforms", "cpu")


def tx_node(args):
    _cpu_platform()
    import jax  # noqa: F401  (platform pinned above)
    from gr_dtl_tpu.models import session
    from gr_dtl_tpu.testbed import sample_io
    from gr_dtl_tpu.utils import config as cfgmod

    cfg = cfgmod.make_tx_config(
        args.config, frame_length=args.frame_length,
        max_empty_frames=2 * args.frames_per_block)
    tx = session.StreamTx(cfg, frames_per_block=args.frames_per_block)
    brx = session.StreamBurstRx(args.rev_block)

    rng = np.random.RandomState(args.seed)
    for _ in range(args.pdus):
        tx.send(rng.randint(0, 256, args.pdu_bytes).astype(np.uint8).tobytes())

    ep = sample_io.connect(args.host, args.port, timeout=120.0)
    blocks = 0
    fb_applied = []
    try:
        while True:
            blk = tx.next_block()
            if blk is None:
                break
            samples, _info = blk
            ep.sink.write(samples)
            rev = ep.source.read(args.rev_block)
            if len(rev) < args.rev_block:
                break  # peer hung up
            bout = brx.process(rev)
            okb = np.asarray(bout.ok)
            if okb.any():
                i = int(np.nonzero(okb)[0][-1])
                cnst = int(np.asarray(bout.cnst_id)[i])
                tx.set_feedback(cnst)
                fb_applied.append(cnst)
            blocks += 1
    finally:
        ep.close()
    print("TX_RESULT " + json.dumps({
        "blocks": blocks,
        "samples_sent": int(ep.sink.n_written),
        "pdus": args.pdus,
        "feedback_applied": fb_applied,
        "final_cnst": tx.constellation,
    }), flush=True)


def rx_node(args):
    _cpu_platform()
    import jax
    import jax.numpy as jnp
    from gr_dtl_tpu.models import adaptive, session
    from gr_dtl_tpu.ops import burst
    from gr_dtl_tpu.testbed import sample_io
    from gr_dtl_tpu.utils import config as cfgmod

    rxcfg = cfgmod.make_rx_config(args.config, frame_length=args.frame_length)
    rx = session.StreamRx(rxcfg, frames_per_block=args.frames_per_block)
    tables = adaptive.build_mcs_tables(rxcfg)
    fb_state = adaptive.initial_state(rxcfg.initial_mcs_id)
    cnst_of_mcs = np.asarray(tables["cnst"])
    fec_of_mcs = np.asarray(tables["fec"])
    modem = burst.build_burst_modem()
    burst_fn = jax.jit(lambda c, f: burst.burst_tx(c, f, modem, pad=0))

    @jax.jit
    def fb_scan(state, snrs, mask):
        def stepf(s, x):
            snr, m = x
            ns, mcs = adaptive.feedback_step(s, snr, tables)
            ns = jax.tree.map(lambda a, b: jnp.where(m, a, b), ns, s)
            return ns, jnp.where(m, mcs, s.last)

        return jax.lax.scan(stepf, state, (snrs, mask))

    srv, port = sample_io.listen(args.host, args.port)
    print(f"RX_LISTENING {port}", flush=True)
    ep = sample_io.accept_endpoint(srv, timeout=120.0)
    srv.close()

    rng = np.random.RandomState(args.seed + 1)
    noise_v = 0.0
    if args.snr_db is not None:
        # signal power of the modulated stream is ~0.81 (pilot+data mix)
        noise_v = float(np.sqrt(0.81 / 10 ** (args.snr_db / 10)))

    n_ok = n_crc = n_frames = n_payload = 0
    want_hist = []
    try:
        while True:
            chunk = ep.source.read(rx.block_samples)
            if len(chunk) < rx.block_samples:
                break  # EOF: TX finished
            if noise_v > 0:
                chunk = chunk + (noise_v / np.sqrt(2)) * (
                    rng.standard_normal(len(chunk))
                    + 1j * rng.standard_normal(len(chunk))
                ).astype(np.complex64)
            out, valid = rx.process(chunk)
            ok = np.asarray(out.header_ok) & valid
            n_frames += int(valid.sum())
            n_ok += int(ok.sum())
            # CRC gate only counts frames that carry payload (empty
            # keepalive frames have no CRC to pass)
            has_payload = np.asarray(out.payload_len) > 0
            n_payload += int((ok & has_payload).sum())
            n_crc += int((np.asarray(out.crc_ok) & ok & has_payload).sum())

            rev = np.zeros(args.rev_block, np.complex64)
            if ok.any():
                fb_state, mcs_seq = fb_scan(
                    fb_state, out.snr_db, jnp.asarray(ok))
                mcs = int(np.asarray(mcs_seq)[np.nonzero(ok)[0][-1]])
                want = int(cnst_of_mcs[mcs])
                want_hist.append(want)
                wave = np.asarray(burst_fn(
                    jnp.asarray([want], jnp.int32),
                    jnp.asarray([int(fec_of_mcs[mcs])], jnp.int32)))[0]
                off = rng.randint(0, args.rev_block - len(wave))
                rev[off: off + len(wave)] = wave
            ep.sink.write(rev)
    finally:
        ep.close()
    print("RX_RESULT " + json.dumps({
        "frames": n_frames,
        "header_ok": n_ok,
        "payload_frames": n_payload,
        "payload_crc_ok": n_crc,
        "lost_frame_rate": rx.lost_frame_rate,
        "want_final": want_hist[-1] if want_hist else None,
        "want_hist": want_hist[:64],
        "samples_received": int(ep.source.n_read),
    }), flush=True)


def loopback_test(args):
    """Spawn RX (listener) + TX (connector) subprocesses on localhost and
    assert the link: CRC-clean payload decode and MCS convergence."""
    import socket as _socket

    with _socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["RUN_MODEM_CPU"] = "1"
    base = [sys.executable, os.path.abspath(__file__),
            "--port", str(port),
            "--frames-per-block", str(args.frames_per_block),
            "--frame-length", str(args.frame_length),
            "--pdus", str(args.pdus),
            "--pdu-bytes", str(args.pdu_bytes),
            "--seed", str(args.seed)]
    if args.config:
        base += ["--config", args.config]
    rxp = subprocess.Popen(base + ["--rx"] + (
        ["--snr-db", str(args.snr_db)] if args.snr_db is not None else []),
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    # wait for the listener before connecting
    for line in rxp.stdout:
        if line.startswith("RX_LISTENING"):
            break
    txp = subprocess.Popen(base + ["--tx"], env=env, stdout=subprocess.PIPE,
                           stderr=subprocess.STDOUT, text=True)
    tx_out = txp.communicate(timeout=1200)[0]
    rx_rest = rxp.communicate(timeout=300)[0]
    if txp.returncode != 0 or rxp.returncode != 0:
        sys.stderr.write(f"--- tx ---\n{tx_out}\n--- rx ---\n{rx_rest}\n")
        raise SystemExit("node process failed")
    tx = json.loads([l for l in tx_out.splitlines()
                     if l.startswith("TX_RESULT ")][-1][10:])
    rx = json.loads([l for l in rx_rest.splitlines()
                     if l.startswith("RX_RESULT ")][-1][10:])
    result = {
        "transport": "tcp sample stream (complex64), duplex",
        "port": port,
        "tx": tx,
        "rx": rx,
        "adaptation_converged": (rx["want_final"] == tx["final_cnst"]
                                 and tx["final_cnst"] is not None),
        "crc_clean": (rx["payload_frames"] > 0
                      and rx["payload_crc_ok"] == rx["payload_frames"]),
    }
    print(json.dumps(result, indent=2))
    assert result["crc_clean"], "payload CRC failures over the link"
    assert tx["blocks"] > 0 and rx["frames"] > 0
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tx", action="store_true")
    ap.add_argument("--rx", action="store_true")
    ap.add_argument("--loopback-test", action="store_true")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=5660)
    ap.add_argument("--config", default=None)
    ap.add_argument("--frames-per-block", type=int, default=8)
    ap.add_argument("--frame-length", type=int, default=10)
    ap.add_argument("--rev-block", type=int, default=4096)
    ap.add_argument("--pdus", type=int, default=64)
    ap.add_argument("--pdu-bytes", type=int, default=40)
    ap.add_argument("--snr-db", type=float, default=None,
                    help="inject AWGN at the RX (default: clean wire)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.tx:
        tx_node(args)
    elif args.rx:
        rx_node(args)
    else:
        loopback_test(args)


if __name__ == "__main__":
    main()
