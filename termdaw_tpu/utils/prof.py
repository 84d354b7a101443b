"""Timing + profiling hooks (aux subsystem the reference lacks, SURVEY §5).

* TERMDAW_TIMING=1 — print wall-clock timings of refresh/compile/render/
  scan stages (BLUE values, reference logging convention).
* TERMDAW_PROFILE=<dir> — capture a jax.profiler trace around each render
  into <dir> (inspect with TensorBoard/Perfetto).
"""

from __future__ import annotations

import contextlib
import os
import time

from .term import DEFAULT, BLUE

TIMING = os.environ.get("TERMDAW_TIMING", "0") == "1"
PROFILE_DIR = os.environ.get("TERMDAW_PROFILE", "")


@contextlib.contextmanager
def span(name: str):
    """Timed span; prints when TERMDAW_TIMING=1."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if TIMING:
            dt = (time.perf_counter() - t0) * 1000.0
            print(f"{DEFAULT}timing: {name} = {BLUE}{dt:.1f} ms{DEFAULT}")


@contextlib.contextmanager
def device_trace(name: str):
    """jax.profiler trace capture when TERMDAW_PROFILE is set."""
    if not PROFILE_DIR:
        yield
        return
    import jax

    with jax.profiler.trace(PROFILE_DIR):
        yield
