"""Parity evidence: engine renders vs the independent float64 per-frame
oracle (tests/oracle.py — shares no engine code), one entry per BASELINE
config shape, reported as dBFS of the worst deviation against full scale.

    python tools/parity_report.py [round_tag]   # writes PARITY_<tag>.json

Configs are scaled down (per-frame Python oracle is slow) but keep each
BASELINE config's graph shape. The fx config (4) has no per-frame oracle
(the effect suite is first-party, not in the reference); its evidence is
window-chaining invariance — a one-shot render vs small chained windows
must agree through every carried state (fx tails, IIR, normalize maxima).

dBFS semantics: engine audio is float32, the oracle float64, so the
reported number upper-bounds algorithmic divergence; it includes the
engine's legitimate f32 rounding (which the f32 reference shares).
"""

from __future__ import annotations

import json
import math
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

from termdaw_tpu.utils.jaxcache import enable_persistent_compile_cache

enable_persistent_compile_cache()

from termdaw_tpu.config import Config  # noqa: E402
from termdaw_tpu.engine.state import State  # noqa: E402
from termdaw_tpu.engine import state as state_mod  # noqa: E402
from termdaw_tpu.fileio.wav import read_wav, write_wav  # noqa: E402
from termdaw_tpu.fileio.wavetable import WaveTable, write_wavetable  # noqa: E402
from tests import oracle as O  # noqa: E402

SR = 4000
BL = 128
N_BLOCKS = 24
LEN_SEC = N_BLOCKS * BL / SR


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def dbfs(err: float) -> float:
    return round(20.0 * math.log10(max(err, 1e-12)), 1)


def metrics(got: np.ndarray, expect_q: np.ndarray) -> dict:
    """Per-config error metrics.

    max: worst single sample. rms: energy-weighted. sustained_max: worst
    error that is NOT an isolated one-frame spike (each frame's error is
    capped by its louder neighbor) — envelope-segment boundaries resolve
    by comparing a float time against a segment edge, and when a frame
    lands EXACTLY on an edge, f32 (engine, like the f32 reference) and
    f64 (oracle) may pick different segments for that one frame; the
    reference itself resolves these races by its accumulated per-block
    f32 clock error, so no reimplementation matches them sample-for-
    sample. Such races are single frames by construction."""
    err = np.max(np.abs(got - expect_q), axis=1)
    nbr = np.maximum(
        np.concatenate([[0.0], err[:-1]]), np.concatenate([err[1:], [0.0]])
    )
    sustained = np.minimum(err, nbr)
    spikes = int(np.sum((err > 1e-4) & (sustained <= 1e-4)))
    return {
        "max_err_dbfs": dbfs(float(err.max())),
        "rms_err_dbfs": dbfs(float(np.sqrt(np.mean(err**2)))),
        "sustained_max_err_dbfs": dbfs(float(sustained.max())),
        "isolated_boundary_race_frames": spikes,
    }


def drum(sr, dur=0.06, freq=120.0):
    t = np.arange(int(sr * dur)) / sr
    x = (np.exp(-t * 50) * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    x = 0.9 * x / np.max(np.abs(x))
    return np.stack([x, x], 1)


def events(rng, n, notes=(36, 48, 60), with_offs=True):
    rows = []
    for _ in range(n):
        t_on = rng.uniform(0.0, LEN_SEC * 0.8)
        note = float(rng.choice(notes))
        vel = float(rng.uniform(0.3, 1.0))
        rows.append((0.0, t_on, note, vel))
        if with_offs:
            rows.append((0.0, t_on + rng.uniform(0.02, 0.3), note, 0.0))
    rows.sort(key=lambda r: r[1])
    return np.asarray(rows, np.float32)


def build(d: Path, lua_body: str, streams: dict[str, np.ndarray]):
    d.mkdir(parents=True, exist_ok=True)
    write_wav(d / "smp.wav", drum(SR), SR, bits=32)
    decl = "".join(f'declare_stream("{n}");\n' for n in streams)
    (d / "project.toml").write_text(
        f'[settings]\nmain = "project.lua"\nbuffer_length = {BL}\n'
        f"project_samplerate = {SR}\n"
    )
    (d / "project.lua").write_text(f"""
set_length({LEN_SEC});
set_render_samplerate({SR});
set_render_bitdepth(32);
set_output_file("out.wav");
load_sample("smp", "smp.wav", "");
{decl}{lua_body}
""")
    st = State(Config.read(d / "project.toml"), str(d))
    st.refresh()
    assert st.loaded
    for name, ev in streams.items():
        st.fb.flowws[st.fb.get_index(name)] = ev
    return st


def engine_audio(st):
    st.render()
    audio, _ = read_wav(Path(st.wdir) / "out.wav", scale=True)
    return audio


def err_vs_oracle(got, expect):
    amp = float(2**31 - 1)
    q = np.trunc(np.clip(expect * amp, -(2.0**31), 2147483520.0)) / 2.0**31
    return metrics(got, q)


def bank_sample(st):
    return st.sb.get_sample(0).as_array().astype(np.float64)


def config1(d, rng):
    """2 sample loops -> normalize (BASELINE config 1 shape)."""
    st = build(d, """
add_sampleloop("a", 1.0, -10.0, "smp");
add_sampleloop("b", 0.8, 10.0, "smp");
add_normalize("n", 1.0, 0.0);
connect("a", "n");
connect("b", "n");
set_output("n");
""", {})
    got = engine_audio(st)
    smp = bank_sample(st)
    verts = {
        "a": O.SampleLoop(smp, gain=1.0, angle=-10.0),
        "b": O.SampleLoop(smp, gain=0.8, angle=10.0),
        "n": O.Normalize(),
    }
    expect = O.oracle_render(
        verts, [("a", "n"), ("b", "n")], "n", {}, SR, BL, N_BLOCKS
    )
    return err_vs_oracle(got, expect)


def config2(d, rng):
    """ADSR envelope ducking a loop on hits (neg-adsr-env shape)."""
    ev = events(rng, 8, with_offs=False)
    conf = [1.0, 0.01, 0.3, 0.2, 0.3, 0.0, 0.0, 0.05, 1.0]
    carr = "{" + ", ".join(str(x) for x in conf) + "}"
    st = build(d, f"""
add_sample_lerp("k", 1.0, 0.0, "smp", "ev", -1, 40);
add_sampleloop("bg", 1.0, 0.0, "smp");
add_adsr("env", 1.0, 0.0, 1.0, "ev", false, false, -1, {carr});
add_normalize("n", 1.0, 0.0);
connect("k", "n");
connect("bg", "env");
connect("env", "n");
set_output("n");
""", {"ev": ev})
    got = engine_audio(st)
    smp = bank_sample(st)
    fl = O.OracleFloww(ev, SR, BL)
    verts = {
        "k": O.SampleLerp(smp, "ev", lerp_len=40),
        "bg": O.SampleLoop(smp),
        "env": O.Adsr("ev", conf, use_off=False, use_max=False, wet=1.0),
        "n": O.Normalize(),
    }
    expect = O.oracle_render(
        verts, [("k", "n"), ("bg", "env"), ("env", "n")], "n",
        {"ev": fl}, SR, BL, N_BLOCKS,
    )
    return err_vs_oracle(got, expect)


def config3(d, rng):
    """Synth + wavetable synth through a band-pass (config 3 shape)."""
    ev = events(rng, 6, notes=(48, 55))
    ev2 = events(rng, 5, notes=(60, 64, 67))
    w = 256
    xw = np.arange(w) / w
    waves = np.stack([
        np.sin(2 * np.pi * xw) + 0.3 * np.sin(6 * np.pi * xw),
        np.sin(2 * np.pi * xw),
    ]).astype(np.float32)
    times = np.asarray([0.0, 0.35], np.float32)
    d.mkdir(parents=True, exist_ok=True)
    write_wavetable(d / "t.wt", WaveTable(times, waves))
    hit = [0.0, 0.001, 1.0, 0.02, 0.0, 0.0, 0.0, 0.0, 0.0]
    note = [0.0, 0.01, 1.0, 0.08, 0.7, 0.4, 0.3, 0.12, 0.0]
    st = build(d, """
load_resource("tbl", "t.wt");
add_synth("s", 0.5, 0.0, "ev", 0.4, 0.3, {0.001, 0.02, 0.0, 0.0, 0.0, 0.0},
    1.0, 0.8, {0.01, 0.08, 0.7, 0.4, 0.3, 0.12}, 0.0, {});
add_sampsyn("w", 0.5, 0.0, "ev2", {0.01, 0.08, 0.7, 0.4, 0.3, 0.12}, "tbl");
add_bandpass("b", 1.0, 0.0, 1.0, 800, 60, true);
add_normalize("n", 1.0, 0.0);
connect("s", "b");
connect("w", "b");
connect("b", "n");
set_output("n");
""", {"ev": ev, "ev2": ev2})
    got = engine_audio(st)
    flowws = {
        "ev": O.OracleFloww(ev, SR, BL),
        "ev2": O.OracleFloww(ev2, SR, BL),
    }
    verts = {
        "s": O.Synth("ev", (0.4, 0.3, hit), (1.0, 0.8, note), (0.0, 0.0, hit),
                     gain=0.5),
        "w": O.SampSyn("ev2", note, times, waves, gain=0.5),
        "b": O.BandPass(800.0, 60.0, True, SR, wet=1.0),
        "n": O.Normalize(),
    }
    expect = O.oracle_render(
        verts, [("s", "b"), ("w", "b"), ("b", "n")], "n",
        flowws, SR, BL, N_BLOCKS,
    )
    return err_vs_oracle(got, expect)


def config4(d, rng):
    """FX chain (no per-frame oracle): window-chaining invariance — one
    8-block-window render vs 3-block-window render must agree through
    every carried state (fx tails, scans, normalize maxima)."""
    ev = events(rng, 10)
    body = """
load_lv2("verb", "native:reverb");
load_lv2("comp", "native:compressor");
load_lv2("dly", "native:delay");
parameter("dly", "time", 90.0);
parameter("dly", "feedback", 0.7);
add_sample_multi("m", 1.0, 5.0, "smp", "ev", -1);
add_lv2fx("f1", 1.0, 0.0, 0.6, "verb");
add_lv2fx("f2", 1.0, 0.0, 1.0, "comp");
add_lv2fx("f3", 1.0, 0.0, 0.5, "dly");
add_normalize("n", 1.0, 0.0);
connect("m", "f1");
connect("f1", "f2");
connect("f2", "f3");
connect("f3", "n");
set_output("n");
"""
    outs = []
    for sub, wb in (("a", 8), ("b", 3)):
        st = build(d / sub, body, {"ev": ev})
        old = state_mod.RENDER_WINDOW_BLOCKS
        state_mod.RENDER_WINDOW_BLOCKS = wb
        try:
            outs.append(engine_audio(st))
        finally:
            state_mod.RENDER_WINDOW_BLOCKS = old
    return metrics(outs[0], outs[1])


def config5(d, rng):
    """Many SampleMulti tracks -> normalize (stream-mix shape; exercises
    the fused voice-mix kernel against the per-frame oracle)."""
    n_tracks = 8
    streams, verts, edges = {}, {}, []
    lines = ['add_normalize("n", 1.0, 0.0);']
    flowws = {}
    for i in range(n_tracks):
        ev = events(rng, 4, with_offs=False)
        streams[f"s{i}"] = ev
        flowws[f"s{i}"] = O.OracleFloww(ev, SR, BL)
        angle = (i / n_tracks) * 160.0 - 80.0
        gain = 0.6 + 0.05 * i
        lines.append(
            f'add_sample_multi("t{i}", {gain}, {angle:.2f}, "smp", "s{i}", -1);'
        )
        lines.append(f'connect("t{i}", "n");')
        edges.append((f"t{i}", "n"))
    lines.append('set_output("n");')
    st = build(d, "\n".join(lines), streams)
    got = engine_audio(st)
    smp = bank_sample(st)
    for i in range(n_tracks):
        angle = (i / n_tracks) * 160.0 - 80.0
        verts[f"t{i}"] = O.SampleMulti(
            smp, f"s{i}", gain=0.6 + 0.05 * i, angle=angle
        )
    verts["n"] = O.Normalize()
    expect = O.oracle_render(verts, edges, "n", flowws, SR, BL, N_BLOCKS)
    m = err_vs_oracle(got, expect)
    m["fused_kernel"] = bool(st.compiled.fused_groups)
    return m


def _shaped(sr, bl, nblocks):
    """Temporarily swap the module shape constants (the builders and the
    oracle flowws read them as globals)."""
    import contextlib

    @contextlib.contextmanager
    def cm():
        global SR, BL, N_BLOCKS, LEN_SEC
        old = (SR, BL, N_BLOCKS, LEN_SEC)
        SR, BL, N_BLOCKS = sr, bl, nblocks
        LEN_SEC = nblocks * bl / sr
        try:
            yield
        finally:
            SR, BL, N_BLOCKS, LEN_SEC = old

    return cm()


def main():
    full = "--full" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    tag = args[0] if args else "r02"
    import tempfile

    rng = np.random.default_rng(20260816)
    tmp = Path(tempfile.mkdtemp(prefix="termdaw_parity_"))
    report = {
        "semantics": (
            "engine_f32 vs float64 per-frame oracle (tests/oracle.py — an "
            "independent reimplementation of the reference semantics), in "
            "dBFS against full scale. sustained_max excludes isolated "
            "one-frame envelope-segment boundary races (see "
            "tools/parity_report.py:metrics — the f32 reference resolves "
            "those by its own accumulated clock error, so they are not "
            "reproducible by ANY reimplementation; since round 3 both "
            "engine and oracle replay the reference's accumulated f32 "
            "clocks exactly, so the raw max is the contract metric and "
            "race counts are expected to be 0). config4 has no "
            "per-frame oracle (first-party fx): its number is window-"
            "chaining invariance (8-block vs 3-block windows). "
            "config*_full_48k entries (present with --full) run the same "
            "graphs at production shape 48k/1024 over a full-length "
            "timeline."
        ),
        "sr": SR, "bl": BL, "blocks": N_BLOCKS,
    }
    import jax

    report["backend"] = jax.default_backend()
    # bank per-config results so a mid-run backend outage still leaves an
    # artifact naming what succeeded (the bench learned this in round 4:
    # claims without captured artifacts don't count)
    out = REPO / f"PARITY_{tag}.json"
    for name, fn in [
        ("config1_sampleloops", config1),
        ("config2_negadsr", config2),
        ("config3_synths_bandpass", config3),
        ("config4_fx_chain_invariance", config4),
        ("config5_multitrack_fused", config5),
    ]:
        try:
            report[name] = m = fn(tmp / name, rng)
        except Exception as e:  # noqa: BLE001 — keep the partial artifact
            report[name] = m = {"error": f"{type(e).__name__}: {e}"}
        log(f"{name}: {m}")
        out.write_text(json.dumps(report, indent=1))
    if full:
        # production-shape entries (VERDICT r2 item 5): 48 kHz / 1024-frame
        # blocks over a full-length timeline, where the reference's
        # accumulated f32 clocks drift by multiple frames and f32 phase
        # rounding dominates — the regime the toy shapes cannot exercise.
        # The per-frame python oracle makes these minutes-long; run with
        # --full (they are evidence artifacts, not CI).
        for name, fn, sr2, bl2, nb2 in [
            ("config1_full_48k", config1, 48000, 1024, 1875),   # 40 s
            ("config3_full_48k", config3, 48000, 1024, 564),    # ~12 s
        ]:
            try:
                with _shaped(sr2, bl2, nb2):
                    report[name] = m = fn(tmp / name, rng)
                m["sr"] = sr2
                m["bl"] = bl2
                m["blocks"] = nb2
            except Exception as e:  # noqa: BLE001
                report[name] = m = {"error": f"{type(e).__name__}: {e}"}
            log(f"{name}: {m}")
            out.write_text(json.dumps(report, indent=1))
    out.write_text(json.dumps(report, indent=1))
    print(json.dumps(report))
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
