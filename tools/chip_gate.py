#!/usr/bin/env python3
"""Gate a chip-bound command on tunnel health, then exec it.

Failure mode this exists for (observed repeatedly on the axon dev
tunnel): a process whose TPU runtime client is created during a tunnel
outage never recovers — every later fetch fails UNIMPLEMENTED or hangs
even after the tunnel returns — while a FRESH process works fine.  So
benches must be *born healthy*: this wrapper probes the device with a
tiny compile+fetch in a disposable subprocess (short timeout), retries
until one succeeds, then immediately execs the real command in a new
process.

Usage:  python tools/chip_gate.py [--budget-s 3600] -- CMD [ARGS...]
Exits with the command's status, or 75 (EX_TEMPFAIL) if the budget
expires without ever seeing a healthy tunnel.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

PROBE = (
    "import jax, jax.numpy as jnp;"
    "print(float((jnp.ones(128) * 3).sum()))"
)

# a sickly tunnel can pass the tiny probe yet still fail real work
# (observed: 128-element fetch OK while a receiver-graph compile +
# 5-int fetch dies UNIMPLEMENTED).  --heavy probes with a
# representative slice: a real StreamRx block step + accounting fetch.
HEAVY_PROBE = r"""
import numpy as np, jax, jax.numpy as jnp
from gr_dtl_tpu.utils import config as cfgmod
from gr_dtl_tpu.models import session
rx = session.StreamRx(cfgmod.make_rx_config(None, frame_length=10),
                      frames_per_block=2)
# device-produced input (NOT a host transfer): this attachment's
# compiled programs cannot consume host-transferred buffers, and the
# gated benches use the same device-stream discipline
w = jax.jit(lambda: jnp.zeros(rx.tail_len + rx.block_samples,
                              jnp.complex64))()
out, valid, *_rest = rx._step(w, rx._lock, rx._fallback,
                              rx._expected_no, None)
acct = _rest[3]
print("HEAVY_OK", int(np.asarray(acct)[1] >= 0))
"""


def probe_once(timeout_s: float, heavy: bool = False) -> bool:
    code, want = (HEAVY_PROBE, "HEAVY_OK") if heavy else (PROBE, "384")
    env = dict(os.environ)
    env["GR_DTL_TPU_FETCH_TRIES"] = "2"  # the gate retries, not the probe
    # mirror the gated benches' env: the Mosaic kernel wedges this
    # attachment's device->host path, and the stream benches pin the
    # jnp sync path — the probe must not fail a good window over a
    # pathology the bench won't hit
    env.setdefault("GR_DTL_TPU_PALLAS", "0")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True,
                           timeout=timeout_s, env=env,
                           cwd=os.path.dirname(os.path.dirname(
                               os.path.abspath(__file__))))
        return r.returncode == 0 and want in r.stdout
    except subprocess.TimeoutExpired:
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget-s", type=float, default=3600.0,
                    help="total time to wait for a healthy tunnel")
    ap.add_argument("--probe-timeout-s", type=float, default=90.0)
    ap.add_argument("--heavy", action="store_true",
                    help="probe with a real receiver block step instead "
                         "of a tiny op (catches sickly-but-alive tunnels)")
    ap.add_argument("--interval-s", type=float, default=30.0,
                    help="wait between failed probes")
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- CMD ARGS... to exec once healthy")
    args = ap.parse_args()
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        sys.exit("usage: chip_gate.py [--budget-s N] -- CMD [ARGS...]")

    deadline = time.monotonic() + args.budget_s
    n = 0
    while time.monotonic() < deadline:
        n += 1
        t0 = time.monotonic()
        if probe_once(args.probe_timeout_s, heavy=args.heavy):
            sys.stderr.write(
                f"chip_gate: tunnel healthy after {n} probe(s); exec\n")
            os.execvp(cmd[0], cmd)
        sys.stderr.write(
            f"chip_gate: probe {n} failed "
            f"({time.monotonic() - t0:.0f}s); retrying\n")
        time.sleep(args.interval_s)
    sys.stderr.write("chip_gate: budget expired, tunnel never healthy\n")
    sys.exit(75)


if __name__ == "__main__":
    main()
