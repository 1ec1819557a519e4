"""Robust device->host readback.

Some TPU attachment paths (e.g. the dev tunnel used here) intermittently
fail a device->host copy with ``UNIMPLEMENTED: TPU backend error``; the
value is fine on retry.  Every tool that materializes device arrays for
reporting funnels through these helpers so a transient transfer error
never kills a run.  (The reference has no analog — its samples never
leave host memory; this is the TPU-runtime equivalent of its defensive
CRC gates, SURVEY.md §5 failure detection.)
"""

from __future__ import annotations

import time

import numpy as np

__all__ = ["fetch_np", "fetch_float"]


def fetch_np(x, tries: int = 12, delay_s: float = 0.5) -> np.ndarray:
    """np.asarray(x) with retries on transient transfer errors."""
    for i in range(tries):
        try:
            return np.asarray(x)
        except Exception:
            if i == tries - 1:
                raise
            time.sleep(delay_s)


def fetch_float(x, tries: int = 12, delay_s: float = 0.5) -> float:
    """float(x) with retries on transient transfer errors."""
    for i in range(tries):
        try:
            return float(x)
        except Exception:
            if i == tries - 1:
                raise
            time.sleep(delay_s)
