#!/usr/bin/env python3
"""Extract gr-dtl's wire-format constants from a GNU Radio install.

Run this on ANY machine with gnuradio (>=3.10, the reference's
requirement) — it does not need gr-dtl itself, only gr-digital — and
commit the output as e.g. ``examples/wire_constants.json``.  Pointing a
config at that file (``wire_compat`` field) then makes this framework
bit-compatible on the air with the reference modem:

- constellation label->point tables: the reference maps symbols with
  stock ``constellation_bpsk/qpsk/8psk/16qam`` (QPSK scaled x0.5,
  ``lib/dtl/constellation.cc:18-24``, factory
  ``lib/dtl/ofdm_adaptive_utils.cc:51-61``);
- Schmidl-Cox sync words: ``digital.ofdm_txrx._make_sync_word1/2``
  with the default carrier allocation
  (``python/dtl/ofdm_adaptive_config.py:33-36``).

This box has no gnuradio (and zero egress to install one), so the
script is committed un-runnable-here by design; the schema it writes is
validated by tests/test_wire_compat.py against a native-constants dump,
and the golden-bit interop tests activate automatically once a real
extraction lands in the tree (see utils/wire_compat docstring).

Usage:  python tools/extract_gr_constants.py [--fft-len 64] > wire_constants.json
"""

from __future__ import annotations

import argparse
import json
import sys


def pairs(seq):
    return [[float(c.real), float(c.imag)] for c in seq]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fft-len", type=int, default=64)
    args = ap.parse_args()

    try:
        from gnuradio import digital
    except ImportError:
        sys.exit(
            "error: gnuradio not importable. Run this script on a machine "
            "with GNU Radio >= 3.10 (the reference's dependency); commit "
            "its stdout as examples/wire_constants.json."
        )

    fft_len = args.fft_len
    # the reference's default allocation (ofdm_adaptive_config.py:17-20)
    occupied_carriers = (
        list(range(-26, -21)) + list(range(-20, -7)) +
        list(range(-6, 0)) + list(range(1, 7)) +
        list(range(8, 21)) + list(range(22, 27)),
    )
    pilot_carriers = ((-21, -7, 7, 21), (-21, -7, 7, 21))

    sw1 = digital.ofdm_txrx._make_sync_word1(
        fft_len, occupied_carriers, pilot_carriers)
    sw2 = digital.ofdm_txrx._make_sync_word2(
        fft_len, occupied_carriers, pilot_carriers)

    # constellation_qpsk scaled x0.5 = the reference's
    # constellation_qpsk_normalized (constellation.cc:18-24)
    qpsk = [0.5 * p for p in digital.constellation_qpsk().points()]

    out = {
        "fft_len": fft_len,
        "source": "gnuradio " + getattr(
            __import__("gnuradio"), "version", lambda: "unknown")(),
        "constellations": {
            "bpsk": pairs(digital.constellation_bpsk().points()),
            "qpsk": pairs(qpsk),
            "psk8": pairs(digital.constellation_8psk().points()),
            "qam16": pairs(digital.constellation_16qam().points()),
        },
        "sync_word1": pairs(sw1),
        "sync_word2": pairs(sw2),
    }
    json.dump(out, sys.stdout, indent=2)
    print()


if __name__ == "__main__":
    main()
