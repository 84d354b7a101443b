"""Regenerate the committed golden renders for the shipped examples.

    JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/make_goldens.py   # CPU set
    python tools/make_goldens.py                                           # TPU set (on the chip)

Each golden is the first GOLDEN_BLOCKS blocks of the example's render
(16-bit WAV), committed under tests/goldens/ as {name}.{backend}.wav
(backend = cpu | tpu). tests/test_examples.py compares fresh renders
against the SAME-backend golden within SAME_BACKEND_TOL_DBFS (-90 dBFS,
i.e. at most one 16-bit LSB — VERDICT r4 item 6); when no same-backend
golden is committed it falls back to the legacy cross-backend
{name}.wav under GOLDEN_TOL_DBFS (loose enough for TPU-vs-CPU f32
transcendental/biquad drift). Regenerate ONLY when a render change is
intentional and documented.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "examples"))

# 96 blocks ~= 2.05 s at 48k/1024: long enough to reach each example's
# distinguishing content (neg-adsr-env's ducking only departs from the
# plain kick+pad mix at the SECOND kick hit, t=1.0 s; 12 blocks rendered
# neg-adsr-env and synth-adsr-fx byte-identical, i.e. covered nothing
# those examples exist to exercise)
GOLDEN_BLOCKS = 96
# Goldens are CPU-rendered; the suite also replays them on the TPU, and
# cross-backend f32 drift grows with rendered length in the FEEDBACK
# effects (reverb combs, compressor envelope follower, eq3/tape IIR):
# measured -64 to -65 dBFS over 96 blocks on the three fx-chain examples
# vs bit-exact CPU-vs-CPU. Engine correctness is pinned separately by the
# f64 oracle (<= -112 dBFS, tools/parity_report.py); the goldens exist to
# catch SEMANTIC regressions, which measure >= -40 dBFS, so the fx
# examples get a -55 dBFS bound and the drift-free example keeps -75.
GOLDEN_TOL_DBFS = {
    "project": -55.0,
    "sample-project": -55.0,
    "neg-adsr-env": -75.0,
    "synth-adsr-fx": -55.0,
}
# same-backend bound: at most one 16-bit LSB (1/32768 = -90.3 dBFS).
# Renders on one backend are deterministic per compiled program; the
# single-LSB allowance absorbs XLA toolchain rotation.
SAME_BACKEND_TOL_DBFS = -90.0
EXAMPLES = ["project", "sample-project", "neg-adsr-env", "synth-adsr-fx"]


def backend_tag() -> str:
    """cpu | tpu for golden file naming (anything accelerated is 'tpu' —
    the axon plugin spells the platform differently than a TPU VM)."""
    import jax

    return "cpu" if jax.default_backend() == "cpu" else "tpu"


def render_example(name: str, out_path: Path) -> None:
    from termdaw_tpu.config import Config
    from termdaw_tpu.engine.state import State

    wdir = REPO / "examples" / name
    st = State(Config.read(wdir / "project.toml"), str(wdir))
    st.refresh()
    assert st.loaded, name
    st.cs = GOLDEN_BLOCKS
    st.output_file = str(out_path)
    st.render()


def main() -> None:
    import numpy as np

    import _gen

    _gen.ensure()
    tag = backend_tag()
    gdir = REPO / "tests" / "goldens"
    gdir.mkdir(exist_ok=True)
    for name in EXAMPLES:
        out = gdir / f"{name}.{tag}.wav"
        render_example(name, out)
        print(f"wrote {out}")
    # guard the guard: every pair of goldens must actually differ, or the
    # golden window is too short to cover what distinguishes the examples
    from termdaw_tpu.fileio.wav import read_wav

    audio = {n: read_wav(gdir / f"{n}.{tag}.wav", scale=True)[0]
             for n in EXAMPLES}
    for i, a in enumerate(EXAMPLES):
        for b in EXAMPLES[i + 1:]:
            diff = float(np.max(np.abs(audio[a] - audio[b])))
            assert diff > 1e-3, (
                f"goldens {a} and {b} are indistinguishable (max diff "
                f"{diff:.2e}) — raise GOLDEN_BLOCKS"
            )
            print(f"  {a} vs {b}: max diff {diff:.3f}")


if __name__ == "__main__":
    main()
