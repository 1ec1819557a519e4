"""LDPC encode/decode on TPU.

TPU-native design note
----------------------
The reference wraps gr-fec's ``cldpc`` encoder and ``awgn_bp``
belief-propagation decoder behind host loops, one codeword at a time
(``lib/dtl/ldpc_enc.cc``, ``ldpc_dec.cc``; the encoder even extracts
the internal column permutation by capturing ``print_permute()`` stdout
— ldpc_enc.cc:38-51).  Here:

- **encoding** is a GF(2) matrix multiply: a systematic generator is
  derived from the alist H once on the host (Gaussian elimination with
  column pivoting), and a whole batch of codewords is produced by one
  MXU matmul (ops/gf2.gf2_matmul),
- **decoding** is batched sum-product BP on a padded adjacency
  structure: messages live in dense ``[B, n_checks, max_row_deg]``
  tensors, check/variable updates are gathers + reductions over the
  degree axis (max degrees here are 3/7 — tiny), iterations are a
  ``lax.scan`` with per-codeword convergence masking (the reference
  runs at most 15 iterations, ldpc_dec.cc:27, and reports the average
  used — we track the same).

Transmitted codeword layout matches the reference's transport-block
convention: ``[check bits | systematic bits]`` (tb_encoder.cc:65-70).
LLR sign convention: LLR > 0 <=> bit = 0 (the reference negates LLRs
for gr-fec's opposite convention, ldpc_dec.cc:65 — ours needs no flip).
Shortened bits are pinned with LLR = +15 (|SHORTENED_VALUE| of
tb_decoder.cc:145, sign adapted to our convention).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gr_dtl_tpu.ops import gf2

__all__ = ["build_ldpc", "encode", "decode", "SHORTENED_LLR"]

SHORTENED_LLR = 15.0


def _gf2_solve_systematic(H: np.ndarray):
    """Column-permute H and reduce so H_perm = [A | I_M] (systematic form).

    Returns (col_perm [N], A [M, K]) with K = N - M, such that for the
    permuted codeword c = [s | p] (systematic s, parity p):
    p = A @ s (mod 2).
    """
    H = H.copy().astype(np.uint8)
    M, N = H.shape
    K = N - M
    perm = np.arange(N)
    # eliminate to put an identity in the last M (permuted) columns;
    # pivot for row r targets permuted column K + r
    for r in range(M):
        target = K + r
        # find a pivot row >= r with a 1 in some unused column; prefer
        # current target column, else swap a column in
        pivot_row = None
        for c_idx in range(target, N):
            rows = np.nonzero(H[r:, perm[c_idx]])[0]
            if rows.size:
                pivot_row = r + rows[0]
                perm[[target, c_idx]] = perm[[c_idx, target]]
                break
        if pivot_row is None:
            # look among earlier columns (rare; rank deficiency would fail)
            for c_idx in range(0, target):
                rows = np.nonzero(H[r:, perm[c_idx]])[0]
                if rows.size:
                    pivot_row = r + rows[0]
                    perm[[target, c_idx]] = perm[[c_idx, target]]
                    break
        assert pivot_row is not None, "H is rank deficient"
        if pivot_row != r:
            H[[r, pivot_row]] = H[[pivot_row, r]]
        col = perm[target]
        # clear the column everywhere else
        rows = np.nonzero(H[:, col])[0]
        for rr in rows:
            if rr != r:
                H[rr] ^= H[r]
    A = H[:, perm[:K]].copy()
    return perm, A


def build_ldpc(H: np.ndarray):
    """Precompute encoder/decoder constants from a parity-check matrix.

    Transmitted layout: cw = [parity (M) | systematic (K)] in the
    *original* H column order given by the derived permutation —
    self-consistent between encode() and decode().
    """
    H = np.asarray(H, dtype=np.uint8)
    M, N = H.shape
    K = N - M
    perm, A = _gf2_solve_systematic(H)

    # transmitted index: position j of the tx codeword corresponds to
    # H column tx_cols[j]
    tx_cols = np.concatenate([perm[K:], perm[:K]])  # [parity | systematic]
    # H in transmitted order:
    Ht = H[:, tx_cols]

    max_row = int(Ht.sum(axis=1).max())
    max_col = int(Ht.sum(axis=0).max())
    chk_adj = np.full((M, max_row), -1, dtype=np.int32)
    for r in range(M):
        cols = np.nonzero(Ht[r])[0]
        chk_adj[r, : cols.size] = cols
    # var -> (check, slot) edge map
    var_edges = np.full((N, max_col, 2), -1, dtype=np.int32)
    var_deg = np.zeros(N, dtype=np.int32)
    for r in range(M):
        for s, c in enumerate(chk_adj[r]):
            if c >= 0:
                var_edges[c, var_deg[c]] = (r, s)
                var_deg[c] += 1

    return {
        "M": M, "N": N, "K": K,
        "A": A.astype(np.float32),  # [M, K] parity generator
        "chk_adj": chk_adj,  # [M, max_row] var index or -1
        "chk_mask": (chk_adj >= 0),
        "var_edges": var_edges,  # [N, max_col, (check, slot)]
        "var_mask": (var_edges[..., 0] >= 0),
        "Ht": Ht,
    }


def encode(msg_bits: jax.Array, code) -> jax.Array:
    """[B, K] bits -> [B, N] codeword = [parity | systematic] (one MXU
    matmul; replaces per-codeword host encoding, ldpc_enc.cc:53-66)."""
    parity = gf2.gf2_matmul(msg_bits.astype(jnp.float32), jnp.asarray(code["A"]).T)
    return jnp.concatenate([parity, msg_bits.astype(jnp.float32)], axis=-1).astype(
        jnp.int32
    )


def decode(llr: jax.Array, code, max_iters: int = 15):
    """Batched sum-product BP.

    Args:
      llr: [B, N] float32, transmitted order ([parity | systematic]),
           LLR > 0 <=> bit 0.
    Returns (hard_bits [B, N] int32, iters_used [B] int32, ok [B] bool).
    ``iters_used`` = first iteration after which the syndrome was
    satisfied (== max_iters if never; matches the avg-iterations
    telemetry of the reference, monitor_dec_msg).
    """
    B, N = llr.shape
    chk_adj = jnp.asarray(code["chk_adj"])  # [M, R]
    chk_mask = jnp.asarray(code["chk_mask"])  # [M, R]
    var_edges = jnp.asarray(code["var_edges"])  # [N, C, 2]
    var_mask = jnp.asarray(code["var_mask"])  # [N, C]
    M, R = chk_adj.shape

    safe_adj = jnp.maximum(chk_adj, 0)
    ve_chk = jnp.maximum(var_edges[..., 0], 0)  # [N, C]
    ve_slot = jnp.maximum(var_edges[..., 1], 0)

    def check_update(v2c):
        """v2c: [B, M, R] variable->check messages; returns c2v [B, M, R]."""
        t = jnp.tanh(jnp.clip(v2c, -20.0, 20.0) / 2.0)
        t = jnp.where(chk_mask[None], t, 1.0)
        prod = jnp.prod(t, axis=-1, keepdims=True)
        # leave-one-out product; guard tiny values for the division
        t_safe = jnp.where(jnp.abs(t) < 1e-12, jnp.sign(t) * 1e-12 + 1e-30, t)
        loo = prod / t_safe
        loo = jnp.clip(loo, -0.999999, 0.999999)
        return 2.0 * jnp.arctanh(loo)

    def gather_c2v_for_vars(c2v):
        """[B, M, R] -> [B, N, C]: each var's incoming check messages."""
        return c2v[:, ve_chk, ve_slot]

    # precompute reverse map: for each (m, r) edge, the (var, var_slot)
    rev = np.full((code["M"], R, 2), 0, dtype=np.int32)
    ve_np = np.asarray(code["var_edges"])
    for v in range(code["N"]):
        for s in range(ve_np.shape[1]):
            m, r = ve_np[v, s]
            if m >= 0:
                rev[m, r] = (v, s)
    rev = jnp.asarray(rev)
    rev_var, rev_slot = rev[..., 0], rev[..., 1]

    def syndrome_ok_of(total):
        hard = (total < 0).astype(jnp.int32)  # bit=1 where LLR<0
        bits_at_checks = jnp.where(chk_mask[None], hard[:, safe_adj], 0)
        return jnp.all(jnp.sum(bits_at_checks, axis=-1) % 2 == 0, axis=-1)

    def body(carry, _):
        c2v, iters_used, done = carry
        inc = gather_c2v_for_vars(c2v)  # [B, N, C]
        inc = jnp.where(var_mask[None], inc, 0.0)
        total = llr + jnp.sum(inc, axis=-1)  # [B, N]
        done = done | syndrome_ok_of(total)
        # v2c = total - incoming (leave-one-out), per edge
        v2c_var = total[:, :, None] - inc  # [B, N, C]
        v2c = v2c_var[:, rev_var, rev_slot]  # [B, M, R]
        new_c2v = check_update(v2c)
        # freeze messages once converged (early-exit semantics)
        c2v = jnp.where(done[:, None, None], c2v, new_c2v)
        iters_used = iters_used + (~done).astype(jnp.int32)
        return (c2v, iters_used, done), None

    c2v0 = jnp.zeros((B, M, R), jnp.float32)
    iters0 = jnp.zeros((B,), jnp.int32)
    done0 = jnp.zeros((B,), bool)
    (c2v, iters_used, done), _ = jax.lax.scan(
        body, (c2v0, iters0, done0), None, length=max_iters
    )
    inc = gather_c2v_for_vars(c2v)
    inc = jnp.where(var_mask[None], inc, 0.0)
    total = llr + jnp.sum(inc, axis=-1)
    hard = (total < 0).astype(jnp.int32)
    ok = done | syndrome_ok_of(total)
    return hard, iters_used, ok
