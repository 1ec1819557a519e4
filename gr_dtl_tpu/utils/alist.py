"""alist parity-check matrix parser (MacKay format).

Replaces gr-fec's ``alist`` class (used via ``lib/dtl/ldpc_enc.cc:21-30``).
Format: line 1 "N M" (columns=variables, rows=checks), line 2 max
col/row degree, lines 3-4 per-col/per-row degrees, then per-column
1-indexed row lists (zero-padded), then per-row column lists.
"""

from __future__ import annotations

import numpy as np

__all__ = ["parse_alist", "load_alist"]


def parse_alist(text: str) -> np.ndarray:
    """Parse alist text -> dense H [M, N] uint8.

    Line-based: some alist writers pad each adjacency line to the max
    degree with zeros, others (like the reference's files) write exactly
    degree-many entries per line — parsing per line handles both.
    """
    lines = [ln for ln in text.splitlines() if ln.strip()]
    n, m = (int(x) for x in lines[0].split())
    col_deg = [int(x) for x in lines[2].split()]
    assert len(col_deg) == n, "malformed alist: column degree count"
    H = np.zeros((m, n), dtype=np.uint8)
    for c in range(n):
        for tok in lines[4 + c].split():
            r = int(tok)
            if r > 0:
                H[r - 1, c] = 1
    for c, d in enumerate(col_deg):
        assert H[:, c].sum() == d, f"alist column {c} degree mismatch"
    return H


def load_alist(path: str) -> np.ndarray:
    with open(path) as f:
        return parse_alist(f.read())
