"""The shipped example projects must load and render headlessly.

Each example is refreshed from its real on-disk project (assets generated
by examples/_gen.py, exactly as the CLI's first-run hook does), then
rendered with the song truncated to a few windows so CI stays fast —
refresh/compile/render cover the full pipeline either way.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

# whole module renders real example projects (golden checks ~2 min each
# on CPU)
pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent
EXAMPLES = REPO / "examples"

sys.path.insert(0, str(EXAMPLES))


@pytest.fixture(scope="module")
def assets():
    import _gen

    return _gen.ensure()


def _load(name):
    from termdaw_tpu.config import Config
    from termdaw_tpu.engine.state import State

    wdir = EXAMPLES / name
    cfg = Config.read(wdir / "project.toml")
    st = State(cfg, str(wdir))
    st.refresh()
    assert st.loaded, f"example {name} failed to refresh"
    return st


@pytest.mark.parametrize(
    "name",
    ["project", "sample-project", "neg-adsr-env", "synth-adsr-fx",
     "generative"],
)
def test_example_renders(name, assets, tmp_path):
    st = _load(name)
    st.cs = 3  # truncate the 40 s song: 3 blocks exercise the full path
    st.output_file = str(tmp_path / "out.wav")
    st.render()
    from termdaw_tpu.fileio.wav import read_wav

    audio, spec = read_wav(tmp_path / "out.wav", scale=True)
    assert spec.channels == 2
    assert len(audio) > 0
    assert np.all(np.isfinite(audio))
    assert np.max(np.abs(audio)) > 1e-4, "example rendered silence"


@pytest.mark.parametrize(
    "name", ["project", "sample-project", "neg-adsr-env", "synth-adsr-fx"]
)
def test_example_matches_golden(name, assets, tmp_path, monkeypatch):
    """Renders must match the committed goldens (tools/make_goldens.py).
    A SAME-backend golden ({name}.{cpu|tpu}.wav) is compared at
    -90 dBFS — at most one 16-bit LSB (VERDICT r4 item 6); without one,
    the legacy cross-backend golden applies with the per-example
    GOLDEN_TOL_DBFS bound (TPU-vs-CPU f32 drift accumulates in the
    feedback effects; engine correctness is pinned separately by the
    f64 oracle suite). Goldens are single-device renders; the conftest's
    8-CPU mesh would take the sharded path, whose IIR boundary
    composition sits at ~1e-4 — exact sharded-vs-single checks live in
    dryrun_multichip / tests/subproc, so pin single-device here."""
    import math

    from termdaw_tpu.fileio.wav import read_wav
    from tools.make_goldens import (
        GOLDEN_BLOCKS, GOLDEN_TOL_DBFS, SAME_BACKEND_TOL_DBFS, backend_tag,
    )

    monkeypatch.setenv("TERMDAW_MESH", "0")

    golden = REPO / "tests" / "goldens" / f"{name}.{backend_tag()}.wav"
    if golden.exists():
        tol = SAME_BACKEND_TOL_DBFS
    else:  # pragma: no cover — all shipped backends have goldens
        golden = REPO / "tests" / "goldens" / f"{name}.wav"
        tol = GOLDEN_TOL_DBFS[name]
    st = _load(name)
    st.cs = GOLDEN_BLOCKS
    st.output_file = str(tmp_path / "out.wav")
    st.render()
    got, _ = read_wav(tmp_path / "out.wav", scale=True)
    want, _ = read_wav(golden, scale=True)
    assert got.shape == want.shape
    err = float(np.max(np.abs(got - want)))
    err_dbfs = 20.0 * math.log10(max(err, 1e-12))
    assert err_dbfs <= tol, (
        f"{name}: render deviates {err_dbfs:.1f} dBFS from golden "
        f"{golden.name} (bound {tol})"
    )


def test_stream_example_plays_packets(assets):
    """The stream example consumes generated packets and produces audio."""
    from termdaw_tpu.fileio.packets import encode_events, PacketDecoder

    st = _load("stream")
    ev = np.array(
        [[0.0, 0.05, 36.0, 1.0], [1.0, 0.30, 38.0, 0.9]], np.float32
    )
    blob = encode_events("kick", ev[:1]) + encode_events("snare", ev[1:])
    st.fb.append_streams(PacketDecoder().feed(blob))
    st.fb.set_time(0)
    audio = np.asarray(st.compiled.render_window(st.fb, 4))
    assert np.all(np.isfinite(audio))
    assert np.max(np.abs(audio)) > 1e-4
