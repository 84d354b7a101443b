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


def pytest_sessionstart(session):
    """Fail FAST when a sitecustomize-forced accelerator backend is down.

    On this harness a PYTHONPATH sitecustomize force-registers the TPU
    plugin over our JAX_PLATFORMS=cpu request, so the suite runs on the
    real chip — and during a tunnel outage every test would hang ~25 min
    in backend init. Probe the backend in a throwaway subprocess with a
    hard timeout and abort the session with the CPU recipe instead.
    Scrubbed-CPU runs (no sitecustomize on PYTHONPATH) skip the probe
    entirely."""
    import subprocess
    import sys
    from pathlib import Path

    if os.environ.get("TERMDAW_SKIP_BACKEND_GUARD") == "1":
        return
    forced = any(
        p and (Path(p) / "sitecustomize.py").exists()
        for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
    )
    if not forced:
        return
    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); print('ok')"],
            capture_output=True, text=True, timeout=150,
        )
        ok = proc.returncode == 0
        why = (proc.stderr or "").strip().splitlines()[-1:] or ["?"]
    except subprocess.TimeoutExpired:
        ok, why = False, ["backend init did not return within 150s"]
    if not ok:
        pytest.exit(
            "accelerator backend unavailable — the sitecustomize on "
            "PYTHONPATH forces the suite onto it and every test would "
            f"hang ({why[0]}). Run the CPU tier instead:\n  env -u "
            "PYTHONPATH JAX_PLATFORMS=cpu python -m pytest tests/ -q",
            returncode=3,
        )


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


def scrubbed_env(**overrides) -> dict:
    """A copy of the environment with the accelerator-forcing variables
    removed and a true CPU backend requested — the standard env for
    subprocess tests (bench runs, app drives, virtual-device meshes)."""
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")
    }
    env["JAX_PLATFORMS"] = "cpu"
    env["TERMDAW_COLOR"] = "0"
    env.update(overrides)
    return env
