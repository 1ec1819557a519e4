"""Live-IP-over-the-modem test: the reference's tun/tap testbed
(``docs/local_tuntap_test_env.md:25-69``) as a root-gated self-test —
real UDP sockets, a real tun device, the full convergence layer +
OFDM loopback in between."""

import os
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

needs_root = pytest.mark.skipif(
    os.geteuid() != 0 or not os.path.exists("/dev/net/tun"),
    reason="needs root + /dev/net/tun")


@needs_root
@pytest.mark.slow
def test_udp_echo_through_modem(tmp_path):
    out = tmp_path / "tun.json"
    r = subprocess.run(
        [sys.executable, os.path.join(HERE, "tools", "tun_bridge.py"),
         "--self-test", "--packets", "6", "--out", str(out)],
        capture_output=True, text=True, timeout=600, cwd=HERE)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    import json

    res = json.loads(out.read_text())
    assert res["ok"] is True and res["packets_echoed"] == 6
