"""Robust device->host readback.

Some TPU attachment paths (e.g. the dev tunnel used here) intermittently
fail a device->host copy with ``UNIMPLEMENTED: TPU backend error``; the
value is fine on retry.  Every tool that materializes device arrays for
reporting funnels through these helpers so a transient transfer error
never kills a run.  (The reference has no analog — its samples never
leave host memory; this is the TPU-runtime equivalent of its defensive
CRC gates, SURVEY.md §5 failure detection.)

Outages on the dev tunnel can last minutes, not seconds, so the retry
budget is configurable: ``GR_DTL_TPU_FETCH_TRIES`` (default 12) with
exponential backoff from ``delay_s`` capped at 10 s per wait.  Long
benches set a large budget and time with per-block medians so a stall
doesn't corrupt the measurement.
"""

from __future__ import annotations

import os
import time

import numpy as np

__all__ = ["fetch_np", "fetch_float"]


def _tries(default: int) -> int:
    return int(os.environ.get("GR_DTL_TPU_FETCH_TRIES", default))


def _retry(fn, tries, delay_s):
    delay = delay_s
    for i in range(tries):
        try:
            return fn()
        except Exception:
            if i == tries - 1:
                raise
            time.sleep(delay)
            delay = min(delay * 1.5, 10.0)


def fetch_np(x, tries: int | None = None, delay_s: float = 0.5) -> np.ndarray:
    """np.asarray(x) with retries on transient transfer errors."""
    return _retry(lambda: np.asarray(x), tries or _tries(12), delay_s)


def fetch_float(x, tries: int | None = None, delay_s: float = 0.5) -> float:
    """float(x) with retries on transient transfer errors."""
    return _retry(lambda: float(x), tries or _tries(12), delay_s)


def run_with_pallas_fallback(main) -> None:
    """Run a bench/tool main(); if it dies with the Pallas kernel
    enabled, re-exec the process with ``GR_DTL_TPU_PALLAS=0``.

    On the axon dev tunnel, once a Mosaic/Pallas kernel has executed,
    device->host reads can fail *persistently* (measured 2026-08-20: 60
    retries over ~9 min, still UNIMPLEMENTED), and the failure sticks to
    the process's runtime client — no in-process retry recovers.
    ``os.execv`` replaces the process image (fresh client) with the jnp
    sync path pinned.  On a directly-attached chip this never triggers.
    """
    import sys
    import traceback

    try:
        main()
    except Exception:
        if os.environ.get("GR_DTL_TPU_PALLAS") == "0":
            raise  # already on the fallback path: a real failure
        # the retry hides the first traceback otherwise — and a genuine
        # non-Pallas bug would be silently re-run once; keep the
        # evidence on stderr before the process image is replaced
        traceback.print_exc()
        sys.stderr.write(
            f"{sys.argv[0]}: failure with the Pallas kernel enabled; "
            "re-running with GR_DTL_TPU_PALLAS=0\n")
        os.environ["GR_DTL_TPU_PALLAS"] = "0"
        os.execv(sys.executable, [sys.executable] + sys.argv)
