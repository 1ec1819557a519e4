"""Binary frame store: per-frame payload log keyed by frame number.

File format is byte-compatible with the reference's
``frame_file_store`` (``lib/testbed/frame_file_store.cc:30-61``) so the
offline BER scorer can read either side's captures:

    record := [len : int32 LE][long_frame_no : uint64 LE][payload bytes]

The 12-bit on-air frame number is unwrapped to a monotonically
increasing 64-bit counter; records whose short number jumps backwards
or by more than a glitch window are skipped like the reference
(frame_file_store.cc:33-48).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["FrameStore", "read_frames"]

_HDR = struct.Struct("<iQ")


class FrameStore:
    """Append-only frame log with 12-bit -> 64-bit unwrapping."""

    def __init__(self, path: str):
        self._f = open(path, "wb")
        self._last_short = -1
        self._base = 0
        self._started = False

    def store(self, payload: bytes, frame_no: int) -> None:
        frame_no &= 0xFFF
        if not self._started:
            self._started = True
            self._last_short = frame_no
        else:
            delta = (frame_no - self._last_short) & 0xFFF
            if delta == 0:
                return  # duplicate
            if delta > 2048:
                return  # backwards glitch, skip (ref :33-48)
            if frame_no < self._last_short:
                self._base += 1 << 12
            self._last_short = frame_no
        long_no = self._base + frame_no
        self._f.write(_HDR.pack(len(payload), long_no))
        self._f.write(payload)

    def store_batch(self, rx_out, valid=None) -> None:
        """Store every CRC-passing frame of an RxOut/TxOut-like batch.

        ``valid``: optional [B] bool mask of real frame slots (e.g. the
        trigger-lock validity from a streaming session) — a CRC-passing
        frame in an invalid slot (a tail re-detection duplicate) must
        not reach the store, rather than relying on the frame-number
        dedup heuristics downstream."""
        payload = np.asarray(rx_out.payload)
        plen = np.asarray(rx_out.payload_len)
        nos = np.asarray(rx_out.frame_no)
        ok = np.asarray(getattr(rx_out, "crc_ok", np.ones(len(nos), bool)))
        if valid is not None:
            ok = ok & np.asarray(valid, bool)
        for i in range(payload.shape[0]):
            if ok[i]:
                self.store(payload[i, : plen[i]].tobytes(), int(nos[i]))

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_frames(path: str):
    """Yield (long_frame_no, payload bytes) records."""
    with open(path, "rb") as f:
        while True:
            hdr = f.read(_HDR.size)
            if len(hdr) < _HDR.size:
                return
            length, no = _HDR.unpack(hdr)
            yield no, f.read(length)
