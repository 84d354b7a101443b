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
