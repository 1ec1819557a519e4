"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Sharding/collective tests need multiple devices; only one real TPU chip
is available, so tests force the CPU platform with 8 virtual devices
(the benchmark harness ``bench.py`` runs on the real chip separately).

The session's sitecustomize registers the axon TPU PJRT plugin at
interpreter start and forces ``jax_platforms=axon,cpu``, so the
``JAX_PLATFORMS`` env var alone is not enough — the config must be
updated after importing jax, before any backend is used.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# CLI tools default to the chip when one is attached; subprocesses
# spawned by tests must stay on the CPU platform (tools/run_modem.py
# honors this env override)
os.environ["RUN_MODEM_CPU"] = "1"

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="run tests marked slow (full gate, ~20 min)")
    parser.addoption("--runtpu", action="store_true", default=False,
                     help="run tests marked tpu (need the real chip)")


def pytest_collection_modifyitems(config, items):
    skip_slow = pytest.mark.skip(reason="slow: use --runslow")
    skip_tpu = pytest.mark.skip(reason="tpu: use --runtpu (bench lane)")
    for item in items:
        if "slow" in item.keywords and not config.getoption("--runslow"):
            item.add_marker(skip_slow)
        if "tpu" in item.keywords and not config.getoption("--runtpu"):
            item.add_marker(skip_tpu)
