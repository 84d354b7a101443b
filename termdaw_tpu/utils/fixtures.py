"""Generated demo projects: hermetic stand-ins for the reference examples.

The reference's example Lua projects reference WAV/MIDI files on the
author's machine (SURVEY.md §4); these builders synthesize equivalent
fixtures (drum samples, MIDI patterns, a wavetable) and write a project in
the same shape, so tests, the benchmark harness, and the graft entry can
run the real end-to-end pipeline hermetically.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..config import Config
from ..engine.state import State
from ..fileio.midi import write_midi
from ..fileio.wav import write_wav
from ..fileio.wavetable import WaveTable, write_wavetable


def _drum(path, sr, dur, freq, decay, noise=0.0, seed=0):
    t = np.arange(int(sr * dur)) / sr
    body = np.exp(-t * decay) * np.sin(2 * np.pi * freq * t * np.exp(-t * 4))
    if noise > 0:
        rng = np.random.default_rng(seed)
        body = body + noise * np.exp(-t * decay * 2) * rng.standard_normal(
            len(t)
        )
    peak = np.max(np.abs(body))
    body = (0.9 * body / peak).astype(np.float32)
    write_wav(path, np.stack([body, body], 1), sr, bits=16)


def build_demo_project(
    workdir: str | Path,
    sr: int = 48000,
    bl: int = 1024,
    length_sec: float = 8.0,
    include_fx: bool = False,
    sample_sr: int | None = None,
) -> State:
    """Write a full demo project (samples, MIDI, wavetable, Lua, toml) and
    return a refreshed State. With include_fx=False the graph is fully
    shardable (no pluginfx)."""
    d = Path(workdir)
    d.mkdir(parents=True, exist_ok=True)
    ssr = sample_sr if sample_sr is not None else sr
    _drum(d / "kick.wav", ssr, 0.18, 55.0, 28.0)
    _drum(d / "snare.wav", ssr, 0.15, 190.0, 35.0, noise=0.6, seed=1)
    _drum(d / "hat.wav", ssr, 0.06, 6000.0, 80.0, noise=1.0, seed=2)

    beats = []
    snares = []
    hats = []
    bass = []
    chords = []
    step = 0.5
    n_bars = max(1, int(length_sec / 2.0))
    for bar in range(n_bars):
        t0 = bar * 2.0
        beats += [(t0, 0.1, 36, 110), (t0 + 1.0, 0.1, 36, 100)]
        snares += [(t0 + 0.5, 0.1, 38, 100), (t0 + 1.5, 0.1, 38, 105)]
        hats += [(t0 + i * 0.25, 0.05, 42, 70 + (i % 2) * 20)
                 for i in range(8)]
        root = [45, 41, 43, 48][bar % 4]
        bass += [(t0, 0.9, root - 12, 100), (t0 + 1.0, 0.9, root - 5, 90)]
        chords += [(t0, 1.8, root + 12, 70), (t0, 1.8, root + 16, 60),
                   (t0, 1.8, root + 19, 65)]
    write_midi(d / "kick.mid", beats, bpm=120)
    write_midi(d / "snare.mid", snares, bpm=120)
    write_midi(d / "hat.mid", hats, bpm=120)
    write_midi(d / "bass.mid", bass, bpm=120)
    write_midi(d / "chords.mid", chords, bpm=120)
    write_wavetable(d / "table.wt", WaveTable.default())

    fx_load = fx_graph = fx_wire = ""
    final_in = "band"
    if include_fx:
        # one effect per recurrence family so full-graph checks (incl.
        # the multichip dryrun) exercise every sharded scan type:
        # feedback combs + allpasses (reverb), max-decay + one-pole
        # (compressor), biquad pole-cascade (eq3), static-D comb (delay)
        fx_load = """
load_lv2("verb", "native:reverb");
load_lv2("comp", "native:compressor");
load_lv2("eq", "native:eq3");
load_lv2("del", "native:delay");
parameter("comp", "Attack", 30.0);
parameter("comp", "Ratio", 3.0);
parameter("eq", "low freq", 180.0);
parameter("eq", "low gain", -3.0);
parameter("eq", "high gain", 2.0);
parameter("del", "time", 120.0);
parameter("del", "feedback", 0.35);
"""
        fx_graph = """
add_lv2fx("fxverb", 1.0, 0.0, 0.4, "verb");
add_lv2fx("fxcomp", 1.0, 0.0, 1.0, "comp");
add_lv2fx("fxeq", 1.0, 0.0, 1.0, "eq");
add_lv2fx("fxdel", 1.0, 0.0, 0.3, "del");
"""
        fx_wire = """
connect("band", "fxverb");
connect("fxverb", "fxcomp");
connect("fxcomp", "fxeq");
connect("fxeq", "fxdel");
"""
        final_in = "fxdel"

    (d / "project.lua").write_text(f"""
set_length({length_sec});
set_render_samplerate(44100);
set_render_bitdepth(16);
set_output_file("{d}/outp.wav");

load_sample("kick", "{d}/kick.wav", "");
load_sample("snare", "{d}/snare.wav", "");
load_sample("hat", "{d}/hat.wav", "");
load_midi_floww("kick", "{d}/kick.mid");
load_midi_floww("snare", "{d}/snare.mid");
load_midi_floww("hat", "{d}/hat.mid");
load_midi_floww("bass", "{d}/bass.mid");
load_midi_floww("chords", "{d}/chords.mid");
load_resource("tbl", "{d}/table.wt");
{fx_load}
add_sample_lerp("kick", 1.2, 0.0, "kick", "kick", -1, 40);
add_sample_multi("snare", 0.9, 0.0, "snare", "snare", -1);
add_sample_lerp("hat", 0.4, 40.0, "hat", "hat", -1, 40);

hit_adsr = {{ 0.001, 0.02, 0.0, 0.0, 0.0, 0.0 }};
note_adsr = {{ 0.01, 0.1, 0.8, 5.0, 0.2, 0.5 }};
add_synth("bass", 0.5, 0.0, "bass", 0.4, 0.3, hit_adsr,
          1.0, 0.8, note_adsr, 0.0, {{}});
add_sampsyn("chords", 0.35, -20.0, "chords", note_adsr, "tbl");

add_adsr("duck", 1.0, 0.0, 1.0, "kick", false, false, -1,
         {{ 1.0, 0.01, 0.4, 0.25, 0.4, 0.0, 0.0, 0.05, 1.0 }});
add_bandpass("band", 1.0, 0.0, 1.0, 8000, 30, true);
{fx_graph}
add_normalize("sum", 1.0, 0.0);

connect("kick", "sum");
connect("snare", "sum");
connect("hat", "sum");
connect("bass", "duck");
connect("chords", "duck");
connect("duck", "band");
{fx_wire}
connect("{final_in}", "sum");

set_output("sum");
""")
    (d / "project.toml").write_text(
        f'[project]\nname = "demo"\n[settings]\nmain = "project.lua"\n'
        f"buffer_length = {bl}\nproject_samplerate = {sr}\n"
    )
    st = State(Config.read(d / "project.toml"), str(d))
    st.refresh()
    return st
