#!/usr/bin/env python3
"""Real multi-process ``jax.distributed`` run of the sharded modem.

The reference has no distributed runtime (SURVEY.md §2f); this tool is
the evidence path for the multi-host target (BASELINE.md: >=85%
efficiency at 2 hosts): it launches N actual OS processes, each owning
a slice of a global ``(stream, time)`` device mesh, initializes
``jax.distributed`` against a local coordinator, runs the full
TX+channel+RX SPMD step (``parallel/stream.build_sharded_loopback``)
over globally-sharded arrays, asserts every frame decodes byte-exactly,
and measures per-step wall time.

Modes:
  --launch  spawn ``--procs`` worker subprocesses (CPU platform,
            ``--devices-per-proc`` virtual devices each), plus a
            single-process baseline of the SAME global workload, and
            write a JSON artifact with the scaling efficiency.
  --worker  one distributed process (spawned by --launch).

On real TPU pods the same worker runs unchanged per host: ``dist.init``
reads JAX_COORDINATOR/JAX_NUM_PROCESSES/JAX_PROCESS_ID and the mesh
comes out (hosts*chips // n_time, n_time) with time rings on ICI.

Note: this machine has 2 CPU cores, so the 2-process "hosts" contend
for the same silicon — the efficiency number here validates the
*methodology* (global mesh, cross-process collectives, byte-exact
output), not the ICI/DCN balance of real pod hardware.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

STREAMS = 8  # global stream axis (64 in the pod config; 8 keeps CI fast)
FRAMES_PER_BLOCK = 2
N_TIME = 2
STEPS = 3


def _workload(txcfg, S, F, seed=0):
    import numpy as np

    rng = np.random.RandomState(seed)
    maxb = txcfg.max_frame_bytes()
    plen = np.full((S, F), txcfg.frame_bytes(2) - 4, np.int32)
    payload = np.zeros((S, F, maxb), np.uint8)
    for s in range(S):
        for f in range(F):
            payload[s, f, : plen[s, f]] = rng.randint(0, 256, plen[s, f])
    cnst = np.full((S, F), 2, np.int32)
    frame_no = np.tile(np.arange(F, dtype=np.int32), (S, 1))
    return payload, plen, cnst, frame_no


def _run_steps(step, mesh, payload, plen, cnst, frame_no, steps):
    """Run `steps` loopback steps on globally-sharded inputs; returns
    (seconds_per_step, total_frames_checked).  Timing is value-chained:
    each step's key is folded with a scalar read off the previous
    step's output, so steps cannot overlap."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    def gshard(x, spec):
        s = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(x.shape, s, lambda i: x[i])

    args = (gshard(payload, P("stream", "time")),
            gshard(plen, P("stream", "time")),
            gshard(cnst, P("stream", "time")),
            gshard(frame_no, P("stream", "time")))

    # warmup/compile
    out = step(*args, jax.random.PRNGKey(0))
    ok_local = np.concatenate(
        [np.asarray(sh.data).reshape(-1) for sh in out.crc_ok.addressable_shards])
    assert ok_local.all(), "warmup step failed to decode every frame"

    t0 = time.monotonic()
    chain = 0
    for i in range(steps):
        key = jax.random.fold_in(jax.random.PRNGKey(1 + i), chain)
        out = step(*args, key)
        # value-chain: a scalar fetched from this step feeds the next key
        chain = int(np.asarray(out.crc_ok.addressable_shards[0].data).ravel()[0])
        assert chain == 1
    dt = (time.monotonic() - t0) / steps
    return dt, int(np.prod(plen.shape))


def worker(args):
    os.environ.setdefault("XLA_FLAGS", "")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from gr_dtl_tpu.parallel import dist, stream as pstream
    from gr_dtl_tpu.utils import config as cfgmod

    assert dist.init(), "dist.init() did not initialize jax.distributed"
    n_proc = jax.process_count()
    assert n_proc == int(os.environ["JAX_NUM_PROCESSES"])
    mesh = dist.make_host_mesh(n_time=N_TIME)

    txcfg = cfgmod.make_tx_config(None, frame_length=4)
    rxcfg = cfgmod.make_rx_config(None, frame_length=4)
    step, _ = pstream.build_sharded_loopback(
        txcfg, rxcfg, mesh, frames_per_block=FRAMES_PER_BLOCK, noise_v=0.01)

    S = STREAMS
    F = mesh.shape["time"] * FRAMES_PER_BLOCK
    payload, plen, cnst, frame_no = _workload(txcfg, S, F)
    dt, n_frames = _run_steps(step, mesh, payload, plen, cnst, frame_no,
                              STEPS)
    rec = {
        "process_id": jax.process_index(),
        "n_processes": n_proc,
        "global_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
        "mesh": dict(mesh.shape),
        "sec_per_step": dt,
        "frames_per_step": n_frames,
        "samples_per_step": n_frames * rxcfg.frame_samples,
        "crc_ok": True,
    }
    print("WORKER_RESULT " + json.dumps(rec), flush=True)


def baseline(ns_devices: int):
    """Single-process run of the same global workload on ns_devices
    virtual devices (the 1-host reference point for efficiency)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from gr_dtl_tpu.parallel import dist, stream as pstream
    from gr_dtl_tpu.utils import config as cfgmod

    mesh = dist.make_host_mesh(n_time=N_TIME)
    txcfg = cfgmod.make_tx_config(None, frame_length=4)
    rxcfg = cfgmod.make_rx_config(None, frame_length=4)
    step, _ = pstream.build_sharded_loopback(
        txcfg, rxcfg, mesh, frames_per_block=FRAMES_PER_BLOCK, noise_v=0.01)
    S = STREAMS
    F = mesh.shape["time"] * FRAMES_PER_BLOCK
    payload, plen, cnst, frame_no = _workload(txcfg, S, F)
    dt, n_frames = _run_steps(step, mesh, payload, plen, cnst, frame_no,
                              STEPS)
    print("BASELINE_RESULT " + json.dumps({
        "sec_per_step": dt, "frames_per_step": n_frames,
        "devices": jax.device_count()}), flush=True)


def launch(procs: int, devices_per_proc: int, out_path: str | None):
    # pick a free coordinator port
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    def env_for(pid):
        e = dict(os.environ)
        e.update({
            "JAX_COORDINATOR": coord,
            "JAX_NUM_PROCESSES": str(procs),
            "JAX_PROCESS_ID": str(pid),
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": f"--xla_force_host_platform_device_count={devices_per_proc}",
        })
        return e

    ps = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker"],
        env=env_for(i), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for i in range(procs)]
    outs = [p.communicate(timeout=900)[0] for p in ps]
    workers = []
    for i, (p, o) in enumerate(zip(ps, outs)):
        if p.returncode != 0:
            sys.stderr.write(f"--- worker {i} failed ---\n{o}\n")
            raise SystemExit(f"worker {i} exited {p.returncode}")
        line = [l for l in o.splitlines() if l.startswith("WORKER_RESULT ")]
        workers.append(json.loads(line[-1][len("WORKER_RESULT "):]))

    # single-process baseline: same global device count, one process
    e = dict(os.environ)
    e.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS":
            f"--xla_force_host_platform_device_count={procs * devices_per_proc}",
    })
    e.pop("JAX_COORDINATOR", None)
    o = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--baseline",
         str(procs * devices_per_proc)],
        env=e, capture_output=True, text=True, timeout=900)
    if o.returncode != 0:
        sys.stderr.write(o.stdout + o.stderr)
        raise SystemExit("baseline run failed")
    line = [l for l in o.stdout.splitlines() if l.startswith("BASELINE_RESULT ")]
    base = json.loads(line[-1][len("BASELINE_RESULT "):])

    worst = max(w["sec_per_step"] for w in workers)
    eff = base["sec_per_step"] / worst if worst > 0 else 0.0
    result = {
        "n_processes": procs,
        "devices_per_process": devices_per_proc,
        "coordinator": coord,
        "workers": workers,
        "single_process_baseline": base,
        "sec_per_step_distributed": worst,
        "sec_per_step_single": base["sec_per_step"],
        # same global work, same global devices: 1.0 = no cross-process
        # overhead.  (On this 2-core box the processes contend for CPU;
        # on real pod hosts each process has its own chips.)
        "efficiency_vs_single_process": round(eff, 4),
        "crc_ok_all": all(w["crc_ok"] for w in workers),
        "note": "2 OS processes, gloo CPU collectives, global (stream,time) "
                "mesh, ppermute halos + psum phase vote cross boundary; "
                "byte-exact decode asserted in every process",
    }
    print(json.dumps(result, indent=2))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--launch", action="store_true")
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--baseline", type=int, default=0)
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--devices-per-proc", type=int, default=4)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.worker:
        worker(args)
    elif args.baseline:
        baseline(args.baseline)
    else:
        launch(args.procs, args.devices_per_proc, args.out)


if __name__ == "__main__":
    main()
