"""PHY <-> network convergence layer (ctypes over native/libdtl_testbed.so).

Mirrors the reference's C++ testbed components with the same byte
semantics (SURVEY.md #34-37): packet validators (IPv4 checksum,
Ethernet dst-MAC, modified-Ethernet with an inline length field), the
``from_phy`` deframer that scans decoded modem bytes for packets and
reassembles partially delivered ("jumbo") packets, and the ``to_phy``
framer.  The hot byte-scanning loop is native C++ (built by
``make -C native``); the binding is ctypes, per this repo's
no-pybind11 constraint.
"""

from __future__ import annotations

import ctypes
import enum
import os
import subprocess
import typing as t

import numpy as np

__all__ = ["Protocol", "FromPhy", "to_phy_frame", "validate_packet", "load_lib"]

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                         "libdtl_testbed.so")
_lib = None


class Protocol(enum.IntEnum):
    """Transported protocol (ref include/gnuradio/testbed/phy_converge.h:19)."""

    IPV4_ONLY = 0
    ETHER_IPV4 = 1
    MODIFIED_ETHER = 2


def load_lib() -> ctypes.CDLL:
    """Load (building on first use) the native library."""
    global _lib
    if _lib is not None:
        return _lib
    path = os.path.abspath(_LIB_PATH)
    if not os.path.exists(path):
        subprocess.run(["make", "-C", os.path.dirname(path)], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(path)
    lib.dtl_parse_mac.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.dtl_parse_mac.restype = ctypes.c_int
    for name in ("dtl_ip_valid",):
        fn = getattr(lib, name)
        fn.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                       ctypes.POINTER(ctypes.c_size_t)]
        fn.restype = ctypes.c_int
    for name in ("dtl_ether_valid", "dtl_modified_ether_valid"):
        fn = getattr(lib, name)
        fn.argtypes = [ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p,
                       ctypes.POINTER(ctypes.c_size_t)]
        fn.restype = ctypes.c_int
    lib.dtl_from_phy_new.argtypes = [ctypes.c_int, ctypes.c_char_p]
    lib.dtl_from_phy_new.restype = ctypes.c_void_p
    lib.dtl_from_phy_free.argtypes = [ctypes.c_void_p]
    lib.dtl_from_phy_process.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_long), ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_size_t),
    ]
    lib.dtl_from_phy_process.restype = ctypes.c_long
    lib.dtl_to_phy_frame.argtypes = [
        ctypes.c_int, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.c_size_t,
    ]
    lib.dtl_to_phy_frame.restype = ctypes.c_long
    _lib = lib
    return lib


def validate_packet(proto: Protocol, buf: bytes,
                    dst_mac: str = "00:00:00:00:00:00") -> tuple[bool, int]:
    """(valid, packet_len) — the reference validators' contract."""
    lib = load_lib()
    plen = ctypes.c_size_t(0)
    if proto == Protocol.IPV4_ONLY:
        ok = lib.dtl_ip_valid(buf, len(buf), ctypes.byref(plen))
    else:
        mac = ctypes.create_string_buffer(6)
        if lib.dtl_parse_mac(dst_mac.encode(), mac) != 0:
            raise ValueError(f"bad MAC: {dst_mac}")
        fn = (lib.dtl_ether_valid if proto == Protocol.ETHER_IPV4
              else lib.dtl_modified_ether_valid)
        ok = fn(buf, len(buf), mac.raw[:6], ctypes.byref(plen))
    return bool(ok), int(plen.value)


class FromPhy:
    """Streaming PHY->network deframer (ref from_phy_impl.cc:78-180)."""

    def __init__(self, proto: Protocol, dst_mac: str = "00:00:00:00:00:00"):
        self._lib = load_lib()
        self._h = self._lib.dtl_from_phy_new(int(proto), dst_mac.encode())
        if not self._h:
            raise ValueError(f"bad MAC: {dst_mac}")

    def process(self, data: bytes) -> list[bytes]:
        """Feed decoded modem bytes; returns completed packets."""
        # output must hold packets completing from the pending (jumbo)
        # buffer, which can be far larger than this call's chunk
        out = ctypes.create_string_buffer(len(data) + 65536 + 64)
        tags = (ctypes.c_long * 256)()
        n_tags = ctypes.c_size_t(0)
        produced = self._lib.dtl_from_phy_process(
            self._h, data, len(data), out, len(out), tags, 128,
            ctypes.byref(n_tags),
        )
        blob = out.raw[:produced]
        packets = []
        for i in range(n_tags.value):
            off, ln = tags[2 * i], tags[2 * i + 1]
            packets.append(blob[off : off + ln])
        return packets

    def close(self):
        if self._h:
            self._lib.dtl_from_phy_free(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


def to_phy_frame(proto: Protocol, pdu: bytes) -> bytes:
    """Frame one network PDU for the modem (ref to_phy_impl.cc:86-146)."""
    lib = load_lib()
    out = ctypes.create_string_buffer(len(pdu) + 2)
    n = lib.dtl_to_phy_frame(int(proto), pdu, len(pdu), out, len(out))
    if n < 0:
        raise ValueError("PDU too short / buffer too small")
    return out.raw[:n]
