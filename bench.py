"""Benchmark harness: renders the BASELINE configs on the real chip.

Prints ONE JSON line:
    {"metric": ..., "value": xRT, "unit": "x_realtime_48k", "vs_baseline": r}

Headline metric (BASELINE.json): rendered audio seconds per wall second
(xRT vs the 48 kHz project rate) for the sample-project-style graph —
2 sample loops -> normalize -> 16-bit 44.1 kHz WAV render, 40 s song —
measured end-to-end over State.render() (event baking, device render,
48k->44.1k sinc resample, quantize, WAV write). vs_baseline is the ratio
against the 500x-realtime driver target. Status goes to stderr; secondary
config timings are included in the JSON as "extra".
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time
from pathlib import Path

os.environ.setdefault("TERMDAW_COLOR", "0")

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def build_sample_project(d: Path, length_sec: float, sr: int, bl: int):
    """BASELINE config 1: kick/snare sample loops -> normalize -> 16-bit
    44.1 kHz render (reference README.md example shape)."""
    sys.path.insert(0, str(Path(__file__).parent))
    from termdaw_tpu.config import Config
    from termdaw_tpu.engine.state import State
    from termdaw_tpu.utils.fixtures import _drum

    d.mkdir(parents=True, exist_ok=True)
    _drum(d / "kick.wav", sr, 0.5, 55.0, 10.0)
    _drum(d / "snare.wav", sr, 0.4, 190.0, 12.0, noise=0.5, seed=7)
    (d / "project.lua").write_text(f"""
set_length({length_sec});
set_render_samplerate(44100);
set_render_bitdepth(16);
set_output_file("{d}/outp.wav");
load_sample("kick", "{d}/kick.wav", "");
load_sample("snare", "{d}/snare.wav", "");
add_sampleloop("kick", 1.0, -10.0, "kick");
add_sampleloop("snare", 0.8, 10.0, "snare");
add_normalize("sum", 1.0, 0.0);
connect("kick", "sum");
connect("snare", "sum");
set_output("sum");
""")
    (d / "project.toml").write_text(
        f'[settings]\nmain = "project.lua"\nbuffer_length = {bl}\n'
        f"project_samplerate = {sr}\n"
    )
    st = State(Config.read(d / "project.toml"), str(d))
    st.refresh()
    assert st.loaded
    return st


def time_renders(st, n: int) -> list[float]:
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        st.render()
        times.append(time.perf_counter() - t0)
    return times


def main() -> None:
    length_sec = float(os.environ.get("BENCH_LENGTH_SEC", "40"))
    sr, bl = 48000, 1024
    reps = int(os.environ.get("BENCH_REPS", "5"))

    from termdaw_tpu.engine import state as state_mod

    tmp = Path(tempfile.mkdtemp(prefix="termdaw_bench_"))
    extra = {}

    # headline: sample-project config
    log(f"building sample-project config ({length_sec}s @ {sr} Hz)...")
    st = build_sample_project(tmp / "c1", length_sec, sr, bl)
    log("warmup (compile)...")
    t0 = time.perf_counter()
    st.render()
    compile_s = time.perf_counter() - t0
    log(f"warmup render (incl compile): {compile_s:.1f}s")
    times = time_renders(st, reps)
    p50 = statistics.median(times)
    xrt = length_sec / p50
    log(f"headline: p50 {p50*1e3:.1f} ms for {length_sec}s -> {xrt:.0f}x RT")
    extra["headline_p50_ms"] = round(p50 * 1e3, 2)
    extra["headline_compile_s"] = round(compile_s, 1)

    # device-only render rate (excludes the PCM fetch + WAV write — the
    # steady-state end-to-end time is bound by shipping the finished audio
    # over this environment's TPU tunnel, not by the chip)
    from termdaw_tpu.engine.state import _finish_render

    def device_render():
        st.fb.set_time(st.compiled.get_time())
        wins = []
        left = st.cs
        while left > 0:
            nb = min(left, state_mod.RENDER_WINDOW_BLOCKS)
            wins.append(st.compiled.render_window(st.fb, nb))
            st.fb.advance_blocks(nb)
            left -= nb
        out = _finish_render(tuple(wins), sr, 44100, 16)
        out.block_until_ready()
        st.compiled.set_time(0)

    device_render()
    dev_times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        device_render()
        dev_times.append(time.perf_counter() - t0)
    dev_p50 = statistics.median(dev_times)
    extra["device_only_p50_ms"] = round(dev_p50 * 1e3, 2)
    extra["device_only_xrt"] = round(length_sec / dev_p50, 1)
    log(f"device-only: p50 {dev_p50*1e3:.1f} ms -> "
        f"{length_sec/dev_p50:.0f}x RT")

    # config 2: full demo graph (all vertex kinds + native fx chain)
    try:
        from termdaw_tpu.utils.fixtures import build_demo_project

        st2 = build_demo_project(
            tmp / "c2", sr=sr, bl=bl, length_sec=length_sec, include_fx=True
        )
        st2.render()
        times2 = time_renders(st2, max(2, reps // 2))
        p50_2 = statistics.median(times2)
        extra["fullgraph_p50_ms"] = round(p50_2 * 1e3, 2)
        extra["fullgraph_xrt"] = round(length_sec / p50_2, 1)
        log(f"full graph: p50 {p50_2*1e3:.1f} ms -> {length_sec/p50_2:.0f}x RT")
    except Exception as e:  # pragma: no cover
        log(f"full-graph config failed: {e}")
        extra["fullgraph_error"] = str(e)

    # config 5: 64-track streaming mix, 96k->48k import resample, 32-bit
    try:
        t0 = time.perf_counter()
        st3 = build_stream_mix(tmp / "c5", length_sec, sr, bl, n_tracks=64)
        st3.render()
        times3 = time_renders(st3, max(2, reps // 2))
        p50_3 = statistics.median(times3)
        extra["stream64_p50_ms"] = round(p50_3 * 1e3, 2)
        extra["stream64_xrt"] = round(length_sec / p50_3, 1)
        log(f"64-track stream mix: p50 {p50_3*1e3:.1f} ms -> "
            f"{length_sec/p50_3:.0f}x RT")
    except Exception as e:  # pragma: no cover
        log(f"stream-mix config failed: {e}")
        extra["stream64_error"] = str(e)

    result = {
        "metric": "render_throughput_sample_project",
        "value": round(xrt, 1),
        "unit": "x_realtime_48k",
        "vs_baseline": round(xrt / 500.0, 3),
        "extra": extra,
    }
    print(json.dumps(result))


def build_stream_mix(d: Path, length_sec: float, sr: int, bl: int,
                     n_tracks: int):
    """BASELINE config 5: n streamed tracks of one-shot players over a
    96 kHz sample (import-resampled), normalize, 32-bit render."""
    from termdaw_tpu.config import Config
    from termdaw_tpu.engine.state import State
    from termdaw_tpu.fileio.packets import encode_events, PacketDecoder
    from termdaw_tpu.utils.fixtures import _drum

    d.mkdir(parents=True, exist_ok=True)
    _drum(d / "hit.wav", 96000, 0.08, 400.0, 40.0, noise=0.4, seed=3)
    lines = [
        f"set_length({length_sec});",
        f"set_render_samplerate({sr});",
        "set_render_bitdepth(32);",
        f'set_output_file("{d}/mix.wav");',
        f'load_sample("hit", "{d}/hit.wav", "");',
        'add_normalize("sum", 1.0, 0.0);',
    ]
    for i in range(n_tracks):
        angle = (i / n_tracks) * 180.0 - 90.0
        lines += [
            f'declare_stream("s{i}");',
            f'add_sample_multi("t{i}", 1.0, {angle:.2f}, "hit", "s{i}", -1);',
            f'connect("t{i}", "sum");',
        ]
    lines.append('set_output("sum");')
    (d / "project.lua").write_text("\n".join(lines))
    (d / "project.toml").write_text(
        f'[settings]\nmain = "project.lua"\nbuffer_length = {bl}\n'
        f"project_samplerate = {sr}\n"
    )
    st = State(Config.read(d / "project.toml"), str(d))
    st.refresh()
    assert st.loaded
    rng = np.random.default_rng(11)
    blob = b""
    for i in range(n_tracks):
        times = np.sort(
            rng.uniform(0.0, length_sec * 0.95, size=32)
        ).astype(np.float32)
        ev = np.stack(
            [np.zeros(32, np.float32), times,
             np.full(32, 36.0, np.float32),
             rng.uniform(0.4, 1.0, 32).astype(np.float32)], axis=1,
        )
        blob += encode_events(f"s{i}", ev)
    st.fb.append_streams(PacketDecoder().feed(blob))
    return st


if __name__ == "__main__":
    main()
