"""Stress + regression tests.

* BASELINE config 5 (scaled for CPU): many-track streaming mix with
  96k->48k sample import resampling, normalize, 32-bit render.
* Golden-stats regression: the demo project's render statistics are pinned
  (loose tolerances — robust across backends, catches real regressions).
"""

import numpy as np
import pytest

# whole module is heavyweight (golden render ~7 min on CPU)
pytestmark = pytest.mark.slow

from termdaw_tpu.config import Config
from termdaw_tpu.engine.state import State
from termdaw_tpu.fileio.packets import encode_events, PacketDecoder
from termdaw_tpu.fileio.wav import write_wav, read_wav


class TestManyTrackStream:
    def test_16_track_stream_mix(self, tmp_path):
        sr, bl = 16000, 256
        n_tracks = 12
        # one 32k-rate sample -> import-resamples to 16k
        t = np.arange(int(32000 * 0.05)) / 32000
        hit = (np.exp(-t * 80) * np.sin(2 * np.pi * 500 * t)).astype(np.float32)
        write_wav(tmp_path / "hit.wav", np.stack([hit, hit], 1), 32000,
                  bits=16)

        lines = [
            "set_length(0.75);",
            "set_render_samplerate(16000);",
            "set_render_bitdepth(32);",
            f'set_output_file("{tmp_path}/mix.wav");',
            f'load_sample("hit", "{tmp_path}/hit.wav", "");',
            'add_normalize("sum", 1.0, 0.0);',
        ]
        for i in range(n_tracks):
            angle = (i / n_tracks) * 180.0 - 90.0
            lines += [
                f'declare_stream("s{i}");',
                f'add_sample_multi("t{i}", 1.0, {angle}, "hit", "s{i}", -1);',
                f'connect("t{i}", "sum");',
            ]
        lines.append('set_output("sum");')
        (tmp_path / "project.lua").write_text("\n".join(lines))
        (tmp_path / "project.toml").write_text(
            f'[settings]\nmain = "project.lua"\nbuffer_length = {bl}\n'
            f"project_samplerate = {sr}\n"
        )
        st = State(Config.read(tmp_path / "project.toml"), str(tmp_path))
        st.refresh()
        assert st.loaded

        # feed each track a burst of hits via the packet protocol
        rng = np.random.default_rng(7)
        blob = b""
        for i in range(n_tracks):
            times = np.sort(rng.uniform(0.0, 0.7, size=8)).astype(np.float32)
            ev = np.stack(
                [np.zeros(8, np.float32), times,
                 np.full(8, 36.0, np.float32),
                 rng.uniform(0.5, 1.0, 8).astype(np.float32)], axis=1,
            )
            blob += encode_events(f"s{i}", ev)
        pkts = PacketDecoder().feed(blob)
        msgs = st.fb.append_streams(pkts)
        assert msgs == []
        st.render()

        audio, spec = read_wav(tmp_path / "mix.wav", scale=True)
        assert spec.bits_per_sample == 32
        assert audio.shape[0] == st.cs * bl
        assert not np.any(np.isnan(audio))
        assert 0.5 < np.max(np.abs(audio)) <= 1.0 + 1e-6  # normalized mix
        # stereo spread: channels must differ (tracks panned across field)
        assert np.max(np.abs(audio[:, 0] - audio[:, 1])) > 0.05


class TestGoldenStats:
    def test_demo_project_statistics_pinned(self, tmp_path):
        """Regression pin for the full demo graph (every vertex kind + fx).

        Statistics chosen to be stable across backends/float reordering but
        sensitive to semantic regressions (envelope gating, mixing, filter
        response, normalization)."""
        from termdaw_tpu.utils.fixtures import build_demo_project

        st = build_demo_project(
            tmp_path, sr=8000, bl=256, length_sec=2.0, include_fx=True
        )
        assert st.loaded
        st.scan_exact()
        st.render()
        audio, spec = read_wav(st.output_file, scale=True)
        assert spec.sample_rate == 44100  # render sr from the fixture
        peak = float(np.max(np.abs(audio)))
        rms = float(np.sqrt(np.mean(audio**2)))
        # spectral split (filter + mix balance); note: psr < render_sr means
        # no resample happens — chunks are written unchanged under the
        # declared higher rate (reference state.rs:562-574)
        n = audio.shape[0]
        spec_l = np.abs(np.fft.rfft(audio[:, 0]))
        freqs = np.fft.rfftfreq(n, 1 / spec.sample_rate)
        low = float(np.sum(spec_l[freqs < 1000.0]))
        high = float(np.sum(spec_l[freqs >= 1000.0]))
        ratio = low / max(high, 1e-9)

        # pinned from the first verified render (CPU, 2026-08-16, 2s song:
        # peak 1.0, rms ~0.15, low/high ratio ~0.86); tolerances are wide
        # enough for cross-backend float noise but catch semantic breaks
        assert 0.9 <= peak <= 1.001, peak
        assert 0.05 <= rms <= 0.35, rms
        assert 0.4 <= ratio <= 2.0, ratio
        assert not np.any(np.isnan(audio))


class TestChainChurn:
    def test_feed_render_cycles_keep_chain_memory_bounded(
            self, tmp_path, monkeypatch):
        """A generative session alternating stream feeds and renders
        churns the prebaked/recorded chains (every feed bumps the
        content version, every stateful render records): the byte
        budget accounting and the stale-bank purge must keep chain
        memory bounded across 30 cycles, with every render finite."""
        from termdaw_tpu.fileio.midi import write_midi
        from termdaw_tpu.utils.fixtures import _drum

        monkeypatch.setenv("TERMDAW_MESH", "0")
        d = tmp_path / "churn"
        d.mkdir()
        _drum(d / "hit.wav", 8000, 0.05, 300.0, 30.0)
        write_midi(d / "hits.mid", [(0.2, 0.1, 36, 100)], bpm=120)
        (d / "project.lua").write_text(f"""
set_length(2.0);
set_render_samplerate(8000);
set_render_bitdepth(16);
set_output_file("{d}/o.wav");
load_sample("hit", "{d}/hit.wav", "");
load_midi_floww("hits", "{d}/hits.mid");
declare_stream("live");
add_sample_lerp("lerp", 1.0, 0.0, "hit", "hits", -1, 40);
add_sample_multi("m", 1.0, 0.0, "hit", "live", -1);
add_normalize("sum", 1.0, 0.0);
connect("lerp", "sum");
connect("m", "sum");
set_output("sum");
""")
        (d / "project.toml").write_text(
            '[settings]\nmain = "project.lua"\nbuffer_length = 256\n'
            "project_samplerate = 8000\n"
        )
        st = State(Config.read(d / "project.toml"), str(d))
        st.refresh()
        assert st.loaded
        cg = st.compiled
        rng = np.random.default_rng(17)
        for cycle in range(30):
            ev = np.array(
                [[0.0, float(rng.uniform(0.1, 1.8)), 36.0, 0.8]],
                np.float32,
            )
            st.fb.append_streams(PacketDecoder().feed(
                encode_events("live", ev)
            ))
            st.fb.set_time(st.compiled.get_time())
            chunks = st.render_device(issue_fetch=False)
            assert all(np.all(np.isfinite(np.asarray(c))) for c in chunks)
            st.compiled.set_time(0)
            assert len(cg._recorded) <= cg._REC_MAX
            assert cg._prebake_used <= cg._prebake_budget
        # the seed-chain memo must not have grown one entry per feed's
        # worth of stored windows beyond the budget either
        assert cg._prebake_used >= 0
