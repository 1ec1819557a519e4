"""App-layer smoke tests: the CLI tools run end to end as subprocesses
(the reference's grc_run-launched example flowgraphs, SURVEY.md #45-49)."""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args):
    res = subprocess.run([sys.executable] + args, capture_output=True,
                         text=True, cwd=HERE, timeout=420)
    assert res.returncode == 0, res.stderr[-2000:]
    return res.stdout


def test_loopback_cli_with_overrides_and_ber(tmp_path):
    tx = tmp_path / "tx.dat"
    rx = tmp_path / "rx.dat"
    out = _run([
        "tools/run_modem.py", "loopback", "--frames", "8",
        "--frame-length", "10", "--snr-db", "25", "--cfo", "0.25",
        "--set", "cp_len=16", "--json",
        "--store-tx", str(tx), "--store-rx", str(rx),
    ])
    res = json.loads(out.strip().splitlines()[-1])
    assert res["crc_ok_rate"] == 1.0
    # offline scorer on the byte-compatible stores
    ber_out = _run(["tools/ber.py", str(tx), str(rx)])
    assert "ber" in ber_out.lower()


def test_full_duplex_cli(tmp_path):
    out = _run([
        "tools/run_modem.py", "full-duplex", "--rounds", "12",
        "--frame-length", "10", "--snr-db", "30", "--snr-db-reverse", "6",
        "--json",
    ])
    res = json.loads(out.strip().splitlines()[-1])
    assert res["a_tx_cnst_final"] >= 1
    assert res["b_crc_rate"] > 0.5
