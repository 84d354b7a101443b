"""Multi-chip sharding tests.

The ambient axon sitecustomize (PYTHONPATH) breaks
--xla_force_host_platform_device_count, so the virtual-mesh run happens in
a scrubbed subprocess, mirroring how the driver exercises
__graft_entry__.dryrun_multichip.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_dryrun_multichip_4dev():
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")
    }
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["TERMDAW_COLOR"] = "0"
    proc = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, '.');"
         "import __graft_entry__ as ge; ge.dryrun_multichip(4)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=560,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "dryrun_multichip ok" in proc.stdout


def test_entry_compiles():
    """entry() must return a jittable fn + args (single device ok)."""
    import jax

    sys.path.insert(0, str(REPO))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    ns, audio = jax.jit(fn)(*args)
    assert audio.shape[1] == 2
    assert audio.shape[0] > 0
