#!/usr/bin/env python3
"""On-chip equal-output check: Pallas Schmidl-Cox kernel vs the jnp path.

tests/test_sync_pallas.py compares the two in *interpreter* mode (the CI
mesh is CPU-only); this tool runs the compiled Mosaic kernel on the real
device and asserts the outputs match on both noise and a real modulated
stream — the evidence that the default-on dispatch in
``ops/sync.timing_metric`` is safe on hardware.

All comparisons run ON DEVICE inside one jitted program and only scalar
deviations are fetched (large-array device->host transfers are what the
dev tunnel drops; scalars with retries are reliable — see bench.py).

Prints one JSON line with max abs deviations and the trigger agreement.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gr_dtl_tpu.utils.fetch import fetch_float


def main():
    import jax
    import jax.numpy as jnp

    from gr_dtl_tpu.ops import sync, sync_pallas
    from gr_dtl_tpu.utils import config as cfgmod
    from gr_dtl_tpu.models import transmitter

    plat = jax.devices()[0].platform
    rng = np.random.RandomState(0)

    cfg = cfgmod.make_tx_config(None, frame_length=20)
    txp = transmitter.build_tx(cfg)
    B = 64
    maxb = cfg.max_frame_bytes()
    payload = np.zeros((B, maxb), np.uint8)
    plen = np.full(B, cfg.frame_bytes(2) - 4, np.int32)
    for i in range(B):
        payload[i, : plen[i]] = rng.randint(0, 256, plen[i])

    @jax.jit
    def compare(payload_d, plen_d, key, noise):
        """Returns scalar deviations for (noise-only, modulated) streams."""
        out = transmitter.tx_frames(
            txp, payload_d, plen_d, jnp.full(B, 2, jnp.int32),
            jnp.zeros(B, jnp.int32), jnp.arange(B, dtype=jnp.int32), key)
        sig = jnp.concatenate([
            jnp.zeros(700, jnp.complex64), out.samples.reshape(-1),
            jnp.zeros(700, jnp.complex64)])
        sig = sig + 0.05 * noise[: sig.shape[0]]

        def devs(r, with_phase):
            P0, M0 = sync.timing_metric(r, 64)  # dispatch forced off below
            P1, M1 = sync_pallas.timing_metric_pallas(r, 64)
            dP = jnp.abs(P0 - P1).max()
            dM = jnp.abs(M0 - M1).max()
            scale = jnp.abs(P0).max()
            if not with_phase:
                return dP, dM, scale, jnp.int32(0), jnp.int32(0)
            ph0 = sync.fold_detect(M0, cfg.frame_samples, cfg.cp_len)
            ph1 = sync.fold_detect(M1, cfg.frame_samples, cfg.cp_len)
            return dP, dM, scale, ph0, ph1

        n = devs(noise, False)
        m = devs(sig, True)
        return n, m

    # force the jnp path inside sync.timing_metric so the comparison is
    # genuinely jnp-vs-kernel (the gate reads the env var at trace time)
    os.environ["GR_DTL_TPU_PALLAS"] = "0"
    noise = (rng.randn(1 << 20) + 1j * rng.randn(1 << 20)).astype(np.complex64)
    n, m = compare(jnp.asarray(payload), jnp.asarray(plen),
                   jax.random.PRNGKey(0), jnp.asarray(noise))

    def row(t, with_phase):
        dP, dM, scale = (fetch_float(x) for x in t[:3])
        r = {"max_dP": dP, "max_dM": dM, "P_scale": scale,
             "rel_dP": dP / max(scale, 1e-12)}
        if with_phase:
            ph0, ph1 = int(fetch_float(t[3])), int(fetch_float(t[4]))
            r["trigger_phase"] = [ph0, ph1]
            r["trigger_phase_equal"] = bool(ph0 == ph1)
        return r

    report = {"platform": plat,
              "streams": {"noise": row(n, False), "modulated": row(m, True)}}
    ok = all(s["max_dM"] < 2e-3 and s["rel_dP"] < 1e-3
             for s in report["streams"].values())
    ok = ok and report["streams"]["modulated"]["trigger_phase_equal"]
    report["ok"] = ok
    print(json.dumps(report))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
