"""Test configuration.

These env vars REQUEST a virtual 8-device CPU platform, and honor it on a
plain machine (CI). On the axon harness they are overridden by the
sitecustomize TPU plugin — the suite then runs on the 1 real chip, which
is fine (more realistic, slower); anything that truly needs CPU or
multiple virtual devices spawns a PYTHONPATH-scrubbed subprocess
(tests/test_parallel.py, __graft_entry__.dryrun_multichip).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# keep math deterministic-ish and quiet
os.environ.setdefault("JAX_ENABLE_X64", "0")
os.environ.setdefault("TERMDAW_COLOR", "0")

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running test (float64 fx oracles, golden renders, "
        "stress, multichip subprocess dryruns); `-m 'not slow'` is the "
        "<2 min CPU smoke tier (CLAUDE.md)",
    )


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
