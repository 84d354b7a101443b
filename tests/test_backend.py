"""Bounded backend init (VERDICT r3 item 2): a dead accelerator becomes a
clear diagnostic within the deadline — in the library (ensure_backend /
State.refresh) and in the real app (`python -m termdaw_tpu`), which must
fail FAST with an actionable message instead of hanging ~25 min in PJRT
init. The outage is simulated with TERMDAW_FAKE_BACKEND (env-injected
fake, never touches jax)."""

from __future__ import annotations

import os
import subprocess
import sys
import threading
import time
from pathlib import Path

import pytest

from termdaw_tpu.utils import backend as B

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture
def fresh_backend_state():
    saved = B._VERIFIED
    B._VERIFIED = False
    yield
    B._VERIFIED = saved


def test_hanging_probe_times_out(fresh_backend_state, capsys):
    t0 = time.monotonic()
    with pytest.raises(B.BackendUnavailable):
        B.ensure_backend(timeout_s=0.3,
                         probe=lambda: threading.Event().wait())
    assert time.monotonic() - t0 < 5.0
    err = capsys.readouterr().err
    assert "TERMDAW_PLATFORM=cpu" in err
    assert not B._VERIFIED


def test_failing_probe_reports_error(fresh_backend_state, capsys):
    def probe():
        raise RuntimeError("UNAVAILABLE: tunnel down")

    with pytest.raises(B.BackendUnavailable, match="tunnel down"):
        B.ensure_backend(timeout_s=5.0, probe=probe)
    assert "failed to initialize" in capsys.readouterr().err


def test_success_is_cached(fresh_backend_state):
    devs = B.ensure_backend(timeout_s=5.0, probe=lambda: ["fake-dev"])
    assert devs == ["fake-dev"]
    assert B._VERIFIED
    # second call must not even invoke the probe
    def exploding():
        raise AssertionError("probe re-ran after verification")

    assert B.ensure_backend(timeout_s=5.0, probe=exploding) is None


def test_refresh_aborts_on_outage(fresh_backend_state, tmp_path, capsys):
    """State.refresh under a simulated outage: no hang, loaded stays
    False, diagnostic printed (the library-path guard)."""
    from termdaw_tpu.config import Config
    from termdaw_tpu.engine.state import State

    (tmp_path / "project.toml").write_text(
        '[settings]\nmain = "project.lua"\n'
    )
    (tmp_path / "project.lua").write_text("set_length(0.1);")
    os.environ["TERMDAW_FAKE_BACKEND"] = "fail"
    try:
        st = State(Config.read(tmp_path / "project.toml"), str(tmp_path))
        st.refresh()
    finally:
        del os.environ["TERMDAW_FAKE_BACKEND"]
    assert not st.loaded
    assert "injected backend outage" in capsys.readouterr().err


def _app_project(tmp_path: Path) -> Path:
    d = tmp_path / "proj"
    d.mkdir()
    (d / "project.toml").write_text(
        '[settings]\nmain = "project.lua"\nbuffer_length = 1024\n'
        "project_samplerate = 48000\n"
    )
    import numpy as np

    from termdaw_tpu.fileio.wav import write_wav

    x = (0.6 * np.sin(np.arange(4800) * 0.05)).astype(np.float32)
    write_wav(d / "tone.wav", np.stack([x, x], 1), 48000, bits=16)
    (d / "project.lua").write_text("""
set_length(0.5);
set_output_file("outp.wav");
load_sample("tone", "tone.wav", "");
add_sampleloop("loop", 1.0, 0.0, "tone");
add_normalize("sum", 1.0, 0.0);
connect("loop", "sum");
set_output("sum");
""")
    return d


def _run_app(proj: Path, env_extra: dict, timeout: float,
             stdin: str = "quit\n"):
    env = dict(os.environ)
    env["TERMDAW_SINK"] = "null"
    env["TERMDAW_COLOR"] = "0"
    env.update(env_extra)
    return subprocess.run(
        [sys.executable, "-m", "termdaw_tpu", str(proj)],
        input=stdin, env=env, capture_output=True, text=True,
        timeout=timeout, cwd=str(REPO),
    )


def test_app_fails_fast_under_outage(tmp_path):
    """`python -m termdaw_tpu <dir>` under a hanging backend: exits
    rc=1 within seconds, with the RED diagnostic (VERDICT item 2's
    done-criterion)."""
    proj = _app_project(tmp_path)
    t0 = time.monotonic()
    proc = _run_app(
        proj,
        {"TERMDAW_FAKE_BACKEND": "hang", "TERMDAW_INIT_TIMEOUT_S": "2"},
        timeout=60,
    )
    assert proc.returncode == 1
    assert time.monotonic() - t0 < 30.0
    assert "did not initialize within 2" in proc.stderr
    assert "TERMDAW_PLATFORM=cpu" in proc.stderr


@pytest.mark.slow
def test_app_platform_cpu_fallback(tmp_path):
    """TERMDAW_PLATFORM=cpu re-execs onto the true CPU backend (dropping
    any sitecustomize-injected accelerator plugin) and a render completes
    there — the diagnostic's suggested escape hatch actually works."""
    proj = _app_project(tmp_path)
    proc = _run_app(
        proj, {"TERMDAW_PLATFORM": "cpu"}, timeout=300,
        stdin="render\nquit\n",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "backend ready: cpu" in proc.stdout
    assert "done rendering" in proc.stdout
    assert (proj / "outp.wav").exists()
