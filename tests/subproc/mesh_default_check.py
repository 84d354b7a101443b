"""State.render must route through the device mesh BY DEFAULT on a
multi-device host (VERDICT r2 item 1: multi-chip as a product capability,
not a demo). Runs on 8 virtual CPU devices in a scrubbed subprocess:

* a full render with >1 visible device must call render_window_sharded
  (asserted by instrumentation) and produce the same WAV as a
  TERMDAW_MESH=0 single-device render of the same project;
* the 2-pass normalization scan routes through the mesh too.

Prints OK on success.
"""

import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

import jax  # noqa: E402

assert len(jax.devices()) >= 8, jax.devices()

from termdaw_tpu.config import Config  # noqa: E402
from termdaw_tpu.engine.state import State  # noqa: E402
from termdaw_tpu.fileio.wav import read_wav, write_wav  # noqa: E402
from termdaw_tpu.fileio.midi import write_midi  # noqa: E402
from termdaw_tpu.graph.compile import CompiledGraph  # noqa: E402

SR, BL = 8000, 256


def build(d: Path) -> State:
    d.mkdir(parents=True, exist_ok=True)
    t = np.arange(int(SR * 0.3)) / SR
    x = (0.6 * np.sin(2 * np.pi * 330 * t) * np.exp(-t * 6)).astype(
        np.float32
    )
    write_wav(d / "tone.wav", np.stack([x, x], 1), SR, bits=16)
    write_midi(d / "ev.mid",
               [(i * 0.37, 0.1, 36 + (i % 5), 90) for i in range(20)],
               bpm=120)
    (d / "project.toml").write_text(
        f'[settings]\nmain = "project.lua"\nbuffer_length = {BL}\n'
        f"project_samplerate = {SR}\n"
    )
    (d / "project.lua").write_text(f"""
set_length(8.0);
set_render_samplerate({SR});
set_render_bitdepth(16);
set_output_file("{d}/out.wav");
load_sample("tone", "{d}/tone.wav", "");
load_midi_floww("ev", "{d}/ev.mid");
add_sample_multi("m", 1.0, -20.0, "tone", "ev", -1);
add_sampleloop("bg", 0.4, 15.0, "tone");
add_adsr("env", 1.0, 0.0, 1.0, "ev", false, false, -1,
    {{ 1.0, 0.01, 0.3, 0.2, 0.3, 0.0, 0.0, 0.05, 1.0 }});
add_bandpass("band", 1.0, 0.0, 1.0, 3000, 40, true);
add_normalize("sum", 1.0, 0.0);
connect("m", "sum");
connect("bg", "env");
connect("env", "band");
connect("band", "sum");
set_output("sum");
""")
    st = State(Config.read(d / "project.toml"), str(d))
    st.refresh()
    assert st.loaded
    return st


def main() -> None:
    import os

    tmp = Path(tempfile.mkdtemp(prefix="mesh_default_"))

    sharded_calls = []
    orig = CompiledGraph.render_window_sharded

    def spy(self, fb, nb_total, mesh, is_scan=False, axis_name="sp"):
        sharded_calls.append((nb_total, is_scan))
        return orig(self, fb, nb_total, mesh, is_scan=is_scan,
                    axis_name=axis_name)

    CompiledGraph.render_window_sharded = spy

    # mesh-by-default render + scan
    st = build(tmp / "mesh")
    st.scan_exact()
    st.render()
    assert sharded_calls, "render did not route through the mesh"
    assert any(s for _, s in sharded_calls), "scan did not route"
    got, _ = read_wav(tmp / "mesh" / "out.wav", scale=True)

    CompiledGraph.render_window_sharded = orig

    # explicit opt-out renders single-device and matches
    os.environ["TERMDAW_MESH"] = "0"
    st2 = build(tmp / "single")
    st2.output_file = str(tmp / "single" / "out.wav")
    st2.scan_exact()
    st2.render()
    want, _ = read_wav(tmp / "single" / "out.wav", scale=True)

    assert got.shape == want.shape
    err = float(np.max(np.abs(got - want)))
    # quantized 16-bit output: the IIR boundary composition is ~1e-4-
    # relative; everything else is bit-exact
    assert err <= 2.0 / 32768.0, f"mesh render deviates: {err}"
    print(f"OK mesh-default render: {len(sharded_calls)} sharded windows, "
          f"max int16-scaled err {err * 32768:.2f} LSB")


if __name__ == "__main__":
    main()
