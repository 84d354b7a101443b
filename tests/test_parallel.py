"""Multi-chip sharding tests.

The ambient axon sitecustomize (PYTHONPATH) breaks
--xla_force_host_platform_device_count, so dryrun_multichip self-scrubs:
it re-execs its body in a subprocess with PYTHONPATH stripped and
JAX_PLATFORMS=cpu. These tests call it exactly like the driver does —
from a polluted environment — to prove the self-scrubbing works.
"""

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _run_dryrun(n, capsys):
    sys.path.insert(0, str(REPO))
    import __graft_entry__ as ge

    ge.dryrun_multichip(n)
    out = capsys.readouterr().out
    assert "dryrun_multichip ok" in out


@pytest.mark.slow
def test_dryrun_multichip_4dev(capsys):
    _run_dryrun(4, capsys)


@pytest.mark.slow
def test_dryrun_multichip_8dev(capsys):
    """The driver runs 8 virtual devices; match it."""
    _run_dryrun(8, capsys)


def test_entry_compiles():
    """entry() must return a jittable fn + args (single device ok)."""
    import jax

    sys.path.insert(0, str(REPO))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    ns, audio = jax.jit(fn)(*args)
    assert audio.shape[1] == 2
    assert audio.shape[0] > 0


@pytest.mark.slow
def test_sharded_biquad_cascade_8dev():
    """The complex-cascade biquad (ops/filters.biquad_apply) under an
    8-device timeline shard matches single-device bit-tight; runs in a
    PYTHONPATH-scrubbed CPU subprocess like the dryrun."""
    import os
    import subprocess

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")
    }
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    proc = subprocess.run(
        [sys.executable, str(REPO / "tests" / "subproc" /
                             "sharded_biquad_check.py")],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "OK" in proc.stdout


@pytest.mark.slow
def test_mesh_default_render_8dev():
    """On a multi-device host, State.render/scan route through the device
    mesh BY DEFAULT (TERMDAW_MESH=0 opts out) and match the single-device
    render; scrubbed 8-virtual-device CPU subprocess."""
    import os
    import subprocess

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")
    }
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["TERMDAW_COLOR"] = "0"
    env.pop("TERMDAW_MESH", None)
    proc = subprocess.run(
        [sys.executable, str(REPO / "tests" / "subproc" /
                             "mesh_default_check.py")],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "OK mesh-default" in proc.stdout
