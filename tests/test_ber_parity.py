"""BER parity with AWGN theory: the round's correctness target.

Pins the north-star criterion (BASELINE.md): measured BER through the
full TX -> AWGN -> RX chain within 0.5 dB of the textbook AWGN curve
for every MCS at/above its ladder threshold, and BPSK usable down to
~6 dB.  The reference's own functional bar is byte-exact loopback at
high SNR (ref qa_ofdm_adaptive_txrx.py:49-114); these assertions are
strictly stronger.

Statistical sizing: each point uses enough frames that >=50 bit errors
are expected at the theory rate, so a true 0.5 dB regression (x1.5-2 in
BER) is detected with overwhelming probability while noise in a healthy
run stays well inside the 0.7 dB assertion ceiling (0.5 target + margin
for finite-sample wobble).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from tools.ber_curve import implementation_loss_db, run_point

# (cnst_id, channel snr dB, frames) — chosen so theory BER is measurable
# with modest batch sizes.  BPSK@6 is the ladder's bottom rung; the
# others sit at/near their MCS thresholds (QPSK switches in at 13 dB;
# 8PSK/QAM16 points are below their 18/23 dB thresholds — i.e. harder
# than any SNR the adaptive loop would ever run them at).
POINTS = [
    (1, 6.0, 256),
    (2, 13.0, 128),
    (3, 14.0, 192),
    (4, 16.0, 128),
]

MAX_LOSS_DB = 0.7  # 0.5 dB target + finite-sample margin


@pytest.mark.parametrize("cnst_id,snr_db,frames", POINTS)
def test_ber_within_half_db_of_theory(cnst_id, snr_db, frames):
    r = run_point(cnst_id, snr_db, frames, seed=int(10 * snr_db) + cnst_id,
                  frame_length=10)
    assert r["ber"] > 0, (
        "point produced zero errors — raise frames or lower snr so the "
        "test actually measures the loss")
    assert r["loss_db"] is not None and r["loss_db"] <= MAX_LOSS_DB, (
        f"cnst={cnst_id} @ {snr_db} dB: BER {r['ber']:.3e} vs theory "
        f"{r['theory_ber']:.3e} -> implementation loss {r['loss_db']} dB "
        f"(limit {MAX_LOSS_DB})")


def test_bpsk_headers_survive_6db():
    """The adaptive loop lives or dies on header decode at the ladder's
    bottom; at 6 dB the header CRC16 must pass for ~the theory rate
    (48 BPSK bits/frame -> ~96% with ideal CSI)."""
    r = run_point(1, 6.0, 256, seed=7, frame_length=10)
    assert r["hdr_ok_rate"] >= 0.90


def test_reference_exact_alpha_mode_decodes():
    """The reference-exact tracking mode (eq_alpha=0.1, single pass —
    ofdm_receiver.py:115 hardcodes 0.1) must still decode cleanly at a
    comfortable operating point; the measured cost of that mode vs the
    default is pinned in examples/eq_alpha_ablation.json."""
    r = run_point(2, 16.0, 64, seed=3, frame_length=10,
                  eq_passes=1, eq_alpha=0.1)
    assert r["hdr_ok_rate"] == 1.0
    assert r["ber"] < 1e-3, r


# --- coded path (LDPC transport blocks, reference examples/config_fec.json) ---

import os

FEC_ALIST = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples", "n_0300_k_0152.alist")
# ^ the reference demo code's geometry (n=300, k=152) — generated, not copied

# The FEC ladder switches constellations 2 dB earlier than the uncoded
# ladder (11/16/21 vs 13/18/23 dB, ref examples/config_fec.json vs
# config.json) — i.e. the code must buy >=2 dB at each switch point.
FEC_POINTS = [(2, 11.0), (3, 16.0), (4, 21.0)]


@pytest.mark.parametrize("cnst_id,snr_db", FEC_POINTS)
def test_fec_ladder_operating_points_decode_clean(cnst_id, snr_db):
    """At its own ladder's operating point every coded MCS must decode
    essentially error-free over a real TB population (>=128 TBs; the
    round-2 curves carried ~32/point, too thin to claim anything)."""
    r = run_point(cnst_id, snr_db, 64, seed=31 + cnst_id, frame_length=10,
                  fec_alist=FEC_ALIST, target_frame_errors=2, max_batches=2)
    assert r["frames"] >= 128
    assert r["frame_errors"] <= 1, (
        f"coded cnst={cnst_id} @ {snr_db} dB: {r['frame_errors']} TB errors "
        f"in {r['frames']} TBs (FER {r['fer']:.3f})")


def test_fec_coding_gain_at_qpsk_switch_point():
    """The measurable heart of the FEC parity claim: at 11 dB — where
    the FEC ladder runs QPSK but the uncoded ladder still can't (its
    QPSK threshold is 13 dB) — the coded path must be clean while the
    uncoded path shows a real error floor.  A >=2 dB gain at this point
    is exactly what justifies the reference's shifted thresholds."""
    coded = run_point(2, 11.0, 64, seed=5, frame_length=10,
                      fec_alist=FEC_ALIST, target_frame_errors=2,
                      max_batches=2)
    uncoded = run_point(2, 11.0, 64, seed=5, frame_length=10,
                        target_frame_errors=50, max_batches=4)
    assert uncoded["ber"] >= 1e-3, (
        "uncoded QPSK at 11 dB should show a measurable error floor; "
        f"got BER {uncoded['ber']:.2e}")
    assert coded["ber"] <= uncoded["ber"] / 20, (coded["ber"], uncoded["ber"])
    assert coded["frame_errors"] <= 1, coded


def test_split_waterfall_knees_in_artifact():
    """The committed coded waterfall (examples/ber_curves_fec.json)
    must carry the SPLIT curves — header survival vs TB-given-header —
    and its knees must sit where the physics puts them.  The reference
    separates these mechanisms too (monitor_dec_msg TBER vs
    header-level stats, lib/dtl/proto/monitor_ofdm.proto:3-22); a
    combined FER at low SNR is ~all header-CRC16 loss and says nothing
    about the decoder."""
    import json

    path = os.path.join(os.path.dirname(FEC_ALIST), "ber_curves_fec.json")
    rows = json.load(open(path))
    by = {(r["cnst"], r["snr_db"]): r for r in rows}
    assert all("fer_given_hdr" in r for r in rows), "artifact predates split"

    def fgh(c, s):
        return by[(c, s)]["fer_given_hdr"]

    # BPSK: the decoder never fails once the header survives — its
    # whole low-SNR FER is header-limited (the r03 conflation, now
    # quantified away)
    for r in rows:
        if r["cnst"] == 1:
            assert r["fer_given_hdr"] == 0.0, r
    # QPSK decoder cliff brackets [3, 5] dB: >=50% conditional TB
    # failure at 3 dB, <=5% by 5 dB — ~6 dB below the ladder's 11 dB
    # switch point
    assert fgh(2, 3.0) >= 0.5
    assert fgh(2, 5.0) <= 0.05
    assert fgh(2, 11.0) == 0.0  # clean at the operating point
    # QAM16 cliff brackets [8, 10] dB (header survives everywhere
    # there: hdr_ok ~1.0, so this IS the decoder)
    assert by[(4, 8.0)]["hdr_ok_rate"] >= 0.99
    assert fgh(4, 8.0) >= 0.1
    assert fgh(4, 10.0) <= 0.05
    assert fgh(4, 21.0) == 0.0
    # 8PSK already clean by its grid start; clean at the 16 dB point
    assert fgh(3, 16.0) == 0.0


def test_default_alpha_beats_reference_alpha():
    """Regression pin for the documented deviation: at the 8PSK
    threshold the default eq_alpha=0.8 must outperform the
    reference-exact 0.1 (else the deviation has lost its justification
    and the config comment is stale)."""
    ref = run_point(3, 18.0, 96, seed=21, frame_length=10,
                    eq_passes=2, eq_alpha=0.1)
    ours = run_point(3, 18.0, 96, seed=21, frame_length=10,
                     eq_passes=2, eq_alpha=0.8)
    assert ours["ber"] < ref["ber"], (ours["ber"], ref["ber"])
