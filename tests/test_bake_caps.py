"""Bake-table cap stability: jit program layouts must not depend on which
events land in a window (VERDICT r2 item 2).

The reference has no compile step, so nothing to cite; the TPU engine's
contract is that a graph's compiled window programs are a function of the
graph spec + window size only. These tests exercise the host-side layout
machinery directly (pure numpy — no device programs are built), plus the
oldest-voice-steal overflow policy (SURVEY.md §7).
"""

import numpy as np
import pytest

from termdaw_tpu.graph import bake as B
from termdaw_tpu.graph.compile import _pack_bakes
from termdaw_tpu.banks.flowwbank import FlowwBank
from termdaw_tpu.engine.state import render_chunk_blocks


class TestBlockTableCaps:
    def test_cap_pins_width(self):
        starts = np.array([0, 10, 20], np.int64)
        ends = starts + 5
        idx = B.block_table(starts, ends, 0, 4, 16, p_cap=8)
        assert idx.shape == (4, 8)

    def test_cap_pins_width_when_empty(self):
        idx = B.block_table(np.zeros(0, np.int64), np.zeros(0, np.int64),
                            0, 4, 16, p_cap=8)
        assert idx.shape == (4, 8)
        idx2 = B.block_table(np.array([9999], np.int64),
                             np.array([10005], np.int64), 0, 4, 16, p_cap=8)
        assert idx2.shape == (4, 8)

    def test_overflow_grows_without_steal(self):
        n = 5
        starts = np.zeros(n, np.int64)
        ends = np.full(n, 64, np.int64)
        idx = B.block_table(starts, ends, 0, 2, 32, p_cap=2)
        assert idx.shape[1] == 8  # pow2(5)
        assert set(idx[0][idx[0] >= 0].tolist()) == set(range(n))

    def test_overflow_steals_oldest(self):
        # 5 concurrent voices, cap 2, steal: keep the LAST 2 per block
        n = 5
        starts = np.arange(n, dtype=np.int64)  # staggered trigger order
        ends = starts + 64
        idx = B.block_table(starts, ends, 0, 1, 32, p_cap=2, steal=True)
        assert idx.shape == (1, 2)
        kept = set(idx[0].tolist())
        assert kept == {3, 4}  # newest voices survive; oldest stolen


class TestClockFold:
    def test_cumsum_matches_sequential_f32_fold(self):
        """The whole f32-parity scheme rests on np.cumsum(dtype=float32)
        accumulating in the same order as the reference's sequential
        `t = f32(t + delta)` fold (extensions.rs:526-527). That is an
        implementation property of numpy's add.accumulate — pin it."""
        for sr, bl in ((48000, 1024), (44100, 256), (8000, 256)):
            delta = B.f32_div(bl, sr)
            for start in (np.float32(0.0), -B.f32_div(500, sr),
                          np.float32(123.456)):
                n = 4000
                got = B.clock_fold(start, n, delta)
                t = np.float32(start)
                for j in range(n):
                    assert got[j] == t, (sr, bl, float(start), j)
                    t = np.float32(t + delta)


    def test_batched_fold_matches_per_row_clock_fold(self):
        """batched_clock_fold (one 2-D f32 cumsum for every note) must be
        elementwise-identical to per-note clock_fold on its segment and
        exactly zero outside it — np.add.accumulate is sequential per
        lane, and the leading zeros are exact (f32(0+v0) == v0)."""
        rng = np.random.default_rng(3)
        nb = 375
        delta = B.f32_div(1024, 48000)
        k0 = rng.integers(0, nb - 1, 200)
        hi = np.minimum(nb - 1, k0 + rng.integers(0, nb, 200))
        v0 = rng.uniform(-2, 2, 200).astype(np.float32)
        got = B.batched_clock_fold(k0, v0, hi, nb, delta)
        for r in range(200):
            want = B.clock_fold(v0[r], hi[r] - k0[r] + 1, delta)
            assert np.array_equal(got[r, k0[r]:hi[r] + 1], want), r
            assert not got[r, :k0[r]].any(), r
            assert not got[r, hi[r] + 1:].any(), r


class TestCapped:
    def test_capped_floor_and_growth(self):
        assert B._capped(3, None) == 4
        assert B._capped(3, 16) == 16
        assert B._capped(33, 16) == 64
        assert B._capped(0, None) == 1


def _make_state(tmp_path, n_tracks=6, length_sec=4.0, sr=8000, bl=256,
                seed=0):
    """Small stream-driven project with deliberately bursty event density
    (the shape that minted per-window program variants in round 2)."""
    from termdaw_tpu.config import Config
    from termdaw_tpu.engine.state import State
    from termdaw_tpu.utils.fixtures import _drum
    from termdaw_tpu.fileio.packets import encode_events, PacketDecoder

    d = tmp_path / "proj"
    d.mkdir(exist_ok=True)
    _drum(d / "hit.wav", sr, 0.05, 300.0, 30.0)
    lines = [
        f"set_length({length_sec});",
        f"set_render_samplerate({sr});",
        "set_render_bitdepth(16);",
        f'set_output_file("{d}/outp.wav");',
        f'load_sample("hit", "{d}/hit.wav", "");',
        'add_normalize("sum", 1.0, 0.0);',
    ]
    for i in range(n_tracks):
        lines += [
            f'declare_stream("s{i}");',
            f'add_sample_multi("t{i}", 1.0, 0.0, "hit", "s{i}", -1);',
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
    rng = np.random.default_rng(seed)
    blob = b""
    for i in range(n_tracks):
        # bursty: all of track i's events land in one random half-second
        t0 = rng.uniform(0.0, length_sec - 0.6)
        times = np.sort(rng.uniform(t0, t0 + 0.5, size=12)).astype(np.float32)
        ev = np.stack(
            [np.zeros(12, np.float32), times, np.full(12, 36.0, np.float32),
             rng.uniform(0.4, 1.0, 12).astype(np.float32)], axis=1,
        )
        blob += encode_events(f"s{i}", ev)
    st.fb.append_streams(PacketDecoder().feed(blob))
    return st


class TestStableLayouts:
    def test_one_layout_across_all_windows(self, tmp_path):
        """After seed_caps, every render window of a bursty multi-track
        project packs to the SAME layout -> one jitted program."""
        st = _make_state(tmp_path)
        cg = st.compiled
        st.fb.set_time(0)
        cg.set_time(0)
        step = render_chunk_blocks(st.cs)
        cg.seed_caps(st.fb, st.cs, step)
        layouts = set()
        left, t = st.cs, 0
        while left > 0:
            nb = min(left, step)
            bakes, nc = cg._bake_all(st.fb, t, nb, fused=cg.use_pallas)
            _, _, layout = _pack_bakes(bakes)
            layouts.add((nb, layout))
            cg.carries.update(nc)
            st.fb.advance_blocks(nb)
            t += nb * cg.bl
            left -= nb
        n_window_sizes = len({nb for nb, _ in layouts})
        assert len(layouts) == n_window_sizes  # one layout per window size

    def test_program_cache_fixed_over_randomized_schedules(self, tmp_path):
        """Many randomized schedules of the SAME project -> the packed
        layout set stays fixed once caps are seeded (jit keys = layouts,
        so the program cache cannot grow). Cap stickiness is scoped per
        project dir, so every rebuild uses the same dir — the real
        refresh/stream-append story."""
        layouts = set()
        for seed in range(4):
            st = _make_state(tmp_path, seed=seed)
            cg = st.compiled
            st.fb.set_time(0)
            step = render_chunk_blocks(st.cs)
            cg.seed_caps(st.fb, st.cs, step)
            left, t = st.cs, 0
            while left > 0:
                nb = min(left, step)
                bakes, nc = cg._bake_all(st.fb, t, nb, fused=cg.use_pallas)
                _, _, layout = _pack_bakes(bakes)
                layouts.add((nb, layout))
                cg.carries.update(nc)
                st.fb.advance_blocks(nb)
                t += nb * cg.bl
                left -= nb
        # all randomized schedules share the cap-pinned layouts; caps are
        # sticky across the State rebuilds via the module high-water map
        n_window_sizes = 1
        assert len(layouts) <= n_window_sizes + 1  # allow one growth step

    def test_voice_cap_steals_and_pins(self, tmp_path, monkeypatch):
        monkeypatch.setenv("TERMDAW_VOICE_CAP", "2")
        st = _make_state(tmp_path)
        cg = st.compiled
        assert cg.voice_cap == 2
        st.fb.set_time(0)
        step = render_chunk_blocks(st.cs)
        cg.seed_caps(st.fb, st.cs, step)
        bakes, _ = cg._bake_all(st.fb, 0, min(st.cs, step))
        for key, tbl in bakes.items():
            if "idx" in tbl:
                assert tbl["idx"].shape[1] <= 2

    @staticmethod
    def _dense_events(st, n_per_track=10, burst_sec=0.04):
        """Overwrite every stream with one dense burst so each member's
        natural per-block polyphony far exceeds a cap of 2."""
        for i, name in enumerate(st.fb.names):
            times = (0.5 + np.linspace(0, burst_sec, n_per_track)).astype(
                np.float32
            )
            st.fb.flowws[i] = np.stack(
                [np.zeros(n_per_track, np.float32), times,
                 np.full(n_per_track, 36.0, np.float32),
                 np.full(n_per_track, 0.8, np.float32)], axis=1,
            )
        st.fb.version += 1  # invalidate the event-frame / pool caches

    @staticmethod
    def _fused_member_counts(st):
        """Max live-voice count over (block, member) cells of every fused
        group table in the first window."""
        cg = st.compiled
        assert cg.fused_groups, "fused groups must form for this test"
        st.fb.set_time(0)
        step = render_chunk_blocks(st.cs)
        cg.seed_caps(st.fb, st.cs, step)
        bakes, _ = cg._bake_all(st.fb, 0, min(st.cs, step), fused=True)
        fkeys = [k for k in bakes if k.startswith("fused")]
        assert fkeys
        worst = 0
        for k in fkeys:
            begins = np.asarray(bakes[k]["begins"])
            member = np.asarray(bakes[k]["member"])
            live = begins > 0
            for kb in range(begins.shape[0]):
                for m in np.unique(member[kb][live[kb]]):
                    worst = max(worst, int(np.sum(
                        live[kb] & (member[kb] == m)
                    )))
        return worst

    def test_voice_cap_steals_on_fused_path(self, tmp_path, monkeypatch):
        """TERMDAW_VOICE_CAP must bound the fused Pallas path's merged
        voice table too (per member vertex, oldest-steal), not just the
        per-vertex block tables."""
        monkeypatch.setenv("TERMDAW_PALLAS_INTERPRET", "1")
        # precondition: uncapped, some (block, member) cell exceeds 2
        (tmp_path / "nocap").mkdir()
        st0 = _make_state(tmp_path / "nocap")
        self._dense_events(st0)
        assert self._fused_member_counts(st0) > 2
        monkeypatch.setenv("TERMDAW_VOICE_CAP", "2")
        (tmp_path / "cap").mkdir()
        st = _make_state(tmp_path / "cap")
        self._dense_events(st)
        assert st.compiled.voice_cap == 2
        assert self._fused_member_counts(st) == 2


class TestTimeTablePinned:
    def test_one_ttab_shape_across_all_windows(self, tmp_path):
        """seed_caps pins the frame->seconds table to the full song length:
        every window then passes the SAME pow2-rounded table shape to jit
        (before the fix, a long render walked 2^k brackets and minted one
        program per bracket despite identical window sizes)."""
        from termdaw_tpu.graph.compile import time_table

        st = _make_state(tmp_path, length_sec=4.0)
        cg = st.compiled
        step = 8  # force several windows whose end frames straddle pow2s
        cg.seed_caps(st.fb, st.cs, step)
        assert cg._ttab_min_frames == st.cs * cg.bl
        shapes = set()
        left, t = st.cs, 0
        while left > 0:
            nb = min(left, step)
            shapes.add(int(time_table(
                cg.sr, max(t + nb * cg.bl, cg._ttab_min_frames)
            ).shape[0]))
            t += nb * cg.bl
            left -= nb
        assert len(shapes) == 1
        # unpinned, the same walk spans more than one bracket (the bug)
        raw = {int(time_table(cg.sr, e).shape[0])
               for e in (8 * cg.bl, st.cs * cg.bl)}
        assert len(raw) == 2


class TestSeedCapsPreservesState:
    def test_fb_cursor_and_carries_untouched(self, tmp_path):
        st = _make_state(tmp_path)
        cg = st.compiled
        st.fb.set_time(3 * 256)
        frame_before = st.fb.frame
        starts_before = list(st.fb.start_indices)
        carries_before = {k: repr(v) for k, v in cg.carries.items()}
        cg.seed_caps(st.fb, st.cs, render_chunk_blocks(st.cs))
        assert st.fb.frame == frame_before
        assert st.fb.start_indices == starts_before
        assert {k: repr(v) for k, v in cg.carries.items()} == carries_before


class TestProgramCacheLru:
    def test_bounded_lru_eviction(self, monkeypatch):
        """_PROGRAM_CACHE is a bounded LRU: compiled programs pin their
        CompiledGraph (device sample buffers), so dead-spec entries must
        eventually evict."""
        from termdaw_tpu.graph import compile as C

        monkeypatch.setattr(C, "_PROGRAM_CACHE", {})
        monkeypatch.setattr(C, "_PROGRAM_CACHE_CAP", 3)
        for k in "abc":
            C._cache_put(k, k)
        assert C._cache_get("a") == "a"  # refreshes 'a' to most-recent
        C._cache_put("d", "d")           # evicts 'b', the oldest
        assert C._cache_get("b") is None
        assert C._cache_get("a") == "a"
        assert C._cache_get("d") == "d"

    def test_evicted_programs_release_their_graph(self, tmp_path,
                                                  monkeypatch):
        """Compiled programs pin CompiledGraph (device sample buffers)
        via their closures; once evicted, the old graph must become
        collectable — the HBM-leak scenario across topology-changing
        refreshes."""
        import gc
        import weakref

        from termdaw_tpu.config import Config
        from termdaw_tpu.engine.state import State
        from termdaw_tpu.graph import compile as C
        from termdaw_tpu.utils.fixtures import _drum

        monkeypatch.setattr(C, "_PROGRAM_CACHE", {})
        # small cap so each new topology fully evicts the previous
        # graph's programs (a render mints ~2: render + scan window)
        monkeypatch.setattr(C, "_PROGRAM_CACHE_CAP", 2)
        d = tmp_path / "p"
        d.mkdir()
        sr, bl = 8000, 256
        _drum(d / "hit.wav", sr, 0.05, 300.0, 30.0)
        (d / "project.toml").write_text(
            f'[settings]\nmain = "project.lua"\nbuffer_length = {bl}\n'
            f"project_samplerate = {sr}\n"
        )
        refs = []
        for n in range(2, 7):  # 5 distinct topologies
            lines = [
                "set_length(0.5);",
                f"set_render_samplerate({sr});",
                f'set_output_file("{d}/o.wav");',
                f'load_sample("hit", "{d}/hit.wav", "");',
                'add_normalize("sum", 1.0, 0.0);',
            ]
            for i in range(n):
                lines += [
                    f'add_sampleloop("t{i}", 1.0, 0.0, "hit");',
                    f'connect("t{i}", "sum");',
                ]
            lines.append('set_output("sum");')
            (d / "project.lua").write_text("\n".join(lines))
            st = State(Config.read(d / "project.toml"), str(d))
            st.refresh()
            assert st.loaded
            st.render()
            refs.append(weakref.ref(st.compiled))
            del st
        assert len(C._PROGRAM_CACHE) <= 2
        for _ in range(3):
            gc.collect()
        # the OLD graphs must be collectable once their programs evict
        # (JAX runtime internals may briefly pin the most recent one or
        # two beyond the newest; before the LRU, NONE ever released)
        dead = sum(1 for r in refs[:-1] if r() is None)
        assert dead >= len(refs) - 2, f"only {dead} old graphs released"


class TestWindowCost:
    def test_cost_analysis_of_compiled_window(self, tmp_path):
        """window_cost (the bench roofline hook) returns XLA's cost dict
        for the exact cached program without advancing time or minting a
        new program (graph/compile.py:window_cost)."""
        from termdaw_tpu.graph import compile as gc
        from termdaw_tpu.engine.state import render_chunk_blocks

        st = _make_state(tmp_path)
        step = render_chunk_blocks(st.cs)
        st.compiled.seed_caps(st.fb, st.cs, step)
        st.compiled.set_time(0)
        st.fb.set_time(0)
        st.compiled.render_window(st.fb, step)  # compile + dispatch once
        st.compiled.set_time(0)
        st.fb.set_time(0)
        keys_before = set(gc._PROGRAM_CACHE.keys())
        ca = st.compiled.window_cost(st.fb, step)
        assert st.compiled.get_time() == 0  # no time advance
        assert set(gc._PROGRAM_CACHE.keys()) == keys_before
        if ca is not None:  # None allowed only on fallback jit paths
            assert float(ca.get("flops", 0.0)) > 0.0


class TestPrebakedChain:
    """seed_caps pass 2 (round 5): renders of an unchanged schedule are
    served from the prebaked window chain — bit-identically, with zero
    per-window host bakes — and anything that invalidates the chain
    (schedule feed, seek, disabled prebake) falls back to live baking
    with identical output."""

    @staticmethod
    def _render_np(st):
        import numpy as np

        st.fb.set_time(st.compiled.get_time())
        chunks = st.render_device(issue_fetch=False)
        out = np.concatenate([np.asarray(c) for c in chunks])
        st.compiled.set_time(0)
        return out

    @staticmethod
    def _count_bakes(cg):
        """Wrap cg._bake_all with a call counter."""
        calls = {"n": 0}
        orig = cg._bake_all

        def wrapped(*a, **k):
            calls["n"] += 1
            return orig(*a, **k)

        cg._bake_all = wrapped
        return calls

    def test_repeat_render_serves_prebaked_bit_identically(
            self, tmp_path, monkeypatch):
        import numpy as np

        # the prebaked chain covers the single-device grid (the real-TPU
        # bench path); under the conftest's 8-CPU mesh render_device
        # would take the sharded live-bake path instead
        monkeypatch.setenv("TERMDAW_MESH", "0")
        # 20 s at 8 kHz / 256 = 625 blocks -> two windows (512 + 113):
        # the second window exercises the chain lineage (expect pointer)
        st = _make_state(tmp_path, length_sec=20.0)
        r1 = self._render_np(st)
        calls = self._count_bakes(st.compiled)
        # the Normalize vertex's running max legitimately grows across
        # renders (reference extensions.rs:321-329 self-adapting
        # semantics) — reset it so render 2's only variable is the bake
        st.compiled.reset_normalize_vertices()
        r2 = self._render_np(st)
        assert calls["n"] == 0, "second render must not re-bake anything"
        assert np.array_equal(r1, r2)
        # the chain is served window-by-window in order
        pb = st.compiled._prebaked
        assert pb is not None and len(pb["index"]) >= 2

    def test_prebake_off_is_bit_identical(self, tmp_path, monkeypatch):
        import numpy as np

        monkeypatch.setenv("TERMDAW_MESH", "0")
        st = _make_state(tmp_path, seed=3)
        on1 = self._render_np(st)
        on2 = self._render_np(st)
        monkeypatch.setenv("TERMDAW_PREBAKE", "0")
        st2 = _make_state(tmp_path, seed=3)
        assert st2.compiled._prebake_on is False
        off1 = self._render_np(st2)
        off2 = self._render_np(st2)
        assert np.array_equal(on1, off1)
        assert np.array_equal(on2, off2)

    def test_feed_invalidates_and_matches_live(self, tmp_path, monkeypatch):
        import numpy as np

        from termdaw_tpu.fileio.packets import encode_events, PacketDecoder

        def feed(st):
            ev = np.array([[0.0, 1.2, 36.0, 0.9], [0.0, 2.1, 36.0, 0.7]],
                          np.float32)
            st.fb.append_streams(PacketDecoder().feed(
                encode_events("s0", ev)
            ))

        monkeypatch.setenv("TERMDAW_MESH", "0")
        st = _make_state(tmp_path, seed=5)
        base = self._render_np(st)
        feed(st)  # version bump -> stale chain must NOT be served
        fed = self._render_np(st)
        assert not np.array_equal(base, fed), "new events must be audible"
        # ground truth: same project + same feed with prebake disabled
        monkeypatch.setenv("TERMDAW_PREBAKE", "0")
        st2 = _make_state(tmp_path, seed=5)
        base2 = self._render_np(st2)
        feed(st2)
        fed2 = self._render_np(st2)
        assert np.array_equal(base, base2)
        assert np.array_equal(fed, fed2)

    def test_seek_breaks_chain_and_matches_live(self, tmp_path, monkeypatch):
        import numpy as np

        monkeypatch.setenv("TERMDAW_MESH", "0")
        st = _make_state(tmp_path, seed=7)
        self._render_np(st)  # seed + first render
        # seek to a mid-timeline frame, render one window live
        bl = st.config.settings.buffer_length
        st.compiled.set_time(4 * bl)
        st.fb.set_time(4 * bl)
        calls = self._count_bakes(st.compiled)
        w1 = np.asarray(st.compiled.render_window(st.fb, 2))
        assert calls["n"] == 1, "an off-grid window must live-bake"
        monkeypatch.setenv("TERMDAW_PREBAKE", "0")
        st2 = _make_state(tmp_path, seed=7)
        self._render_np(st2)
        st2.compiled.set_time(4 * bl)
        st2.fb.set_time(4 * bl)
        w2 = np.asarray(st2.compiled.render_window(st2.fb, 2))
        assert np.array_equal(w1, w2)

    def test_budget_bounds_chain_with_live_tail(self, tmp_path, monkeypatch):
        """TERMDAW_PREBAKE_MB bounds the stored chain: windows past the
        budget live-bake, and the output still matches a fully-live
        render bit-exactly (the chain prefix hands off mid-render)."""
        import numpy as np

        monkeypatch.setenv("TERMDAW_MESH", "0")
        # ~0 MB budget: at most one window is stored
        monkeypatch.setenv("TERMDAW_PREBAKE_MB", "0.000001")
        st = _make_state(tmp_path, seed=9, length_sec=20.0)
        r1 = self._render_np(st)
        pb = st.compiled._prebaked
        assert pb is not None and len(pb["wins"]) <= 1, (
            "budget must stop the chain after the first window"
        )
        monkeypatch.setenv("TERMDAW_PREBAKE", "0")
        st2 = _make_state(tmp_path, seed=9, length_sec=20.0)
        assert np.array_equal(r1, self._render_np(st2))

    def test_stateful_carries_serve_recorded_chain(self, tmp_path,
                                                   monkeypatch):
        """Carries that stay legitimately stateful across renders (a
        SampleLerp voice holding its last trigger — reference
        extensions.rs:383-421) miss the fresh-start seed chain, but they
        reach a STEADY state: render 2 is live-baked and RECORDED, and
        renders 3+ serve the recording (zero bakes), bit-identically."""
        import numpy as np

        from termdaw_tpu.config import Config
        from termdaw_tpu.engine.state import State
        from termdaw_tpu.utils.fixtures import _drum
        from termdaw_tpu.fileio.midi import write_midi

        monkeypatch.setenv("TERMDAW_MESH", "0")
        d = tmp_path / "lerp"
        d.mkdir()
        _drum(d / "hit.wav", 8000, 0.05, 300.0, 30.0)
        write_midi(d / "hits.mid",
                   [(0.2, 0.1, 36, 100), (1.1, 0.1, 36, 90),
                    (2.3, 0.1, 36, 80)], bpm=120)
        (d / "project.lua").write_text(f"""
set_length(4.0);
set_render_samplerate(8000);
set_render_bitdepth(16);
set_output_file("{d}/o.wav");
load_sample("hit", "{d}/hit.wav", "");
load_midi_floww("hits", "{d}/hits.mid");
add_sample_lerp("lerp", 1.0, 0.0, "hit", "hits", -1, 40);
add_normalize("sum", 1.0, 0.0);
connect("lerp", "sum");
set_output("sum");
""")
        (d / "project.toml").write_text(
            '[settings]\nmain = "project.lua"\nbuffer_length = 256\n'
            "project_samplerate = 8000\n"
        )
        st = State(Config.read(d / "project.toml"), str(d))
        st.refresh()
        assert st.loaded
        self._render_np(st)             # render 1: seed chain serves
        st.compiled.reset_normalize_vertices()
        r2 = self._render_np(st)        # render 2: live-baked + recorded
        assert st.compiled._recorded, "render 2 must have been recorded"
        calls = self._count_bakes(st.compiled)
        st.compiled.reset_normalize_vertices()
        r3 = self._render_np(st)        # render 3: served from recording
        assert calls["n"] == 0, "steady-state render must not re-bake"
        assert np.array_equal(r2, r3)



    def test_seek_after_served_render_keeps_chain_intact(
            self, tmp_path, monkeypatch):
        """Served carry deltas are ALIASED into the live engine (carries
        are immutable values -- every engine change rebinds). The one
        historical in-place mutation site, set_time's SampSyn clock
        remap, now rebinds too: a seek right after a served render must
        leave the chain's stored objects bit-untouched (with an in-place
        remap + aliasing they would shift by dt), and later renders must
        match a prebake-disabled ground truth exactly."""
        import numpy as np

        from termdaw_tpu.config import Config
        from termdaw_tpu.engine.state import State
        from termdaw_tpu.fileio.midi import write_midi
        from termdaw_tpu.fileio.wavetable import WaveTable, write_wavetable

        monkeypatch.setenv("TERMDAW_MESH", "0")

        def build(sub):
            d = tmp_path / sub
            d.mkdir()
            # a note held past the schedule end leaves the SampSyn carry
            # non-empty after the render -- the served seed chain's final
            # delta then aliases a live NotesCarry, which the seek remaps
            write_midi(d / "m.mid", [(0.1, 9.0, 60, 100)], bpm=120)
            write_wavetable(d / "t.wt", WaveTable.default())
            (d / "project.lua").write_text(f"""
set_length(4.0);
set_render_samplerate(8000);
set_render_bitdepth(16);
set_output_file("{d}/o.wav");
load_midi_floww("m", "{d}/m.mid");
load_resource("tbl", "{d}/t.wt");
add_sampsyn("syn", 0.8, 0.0, "m", {{0.01, 0.1, 0.8, 5.0, 0.2, 0.5}}, "tbl");
add_normalize("sum", 1.0, 0.0);
connect("syn", "sum");
set_output("sum");
""")
            (d / "project.toml").write_text(
                '[settings]\nmain = "project.lua"\nbuffer_length = 256\n'
                "project_samplerate = 8000\n"
            )
            st = State(Config.read(d / "project.toml"), str(d))
            st.refresh()
            assert st.loaded
            return st

        st = build("syn")
        # render 1 serves the seed chain; do NOT reset time yet -- the
        # engine's own set_time(0) reset IS the remap under test
        st.fb.set_time(st.compiled.get_time())
        r1 = np.concatenate([
            np.asarray(c) for c in st.render_device(issue_fetch=False)
        ])
        # the live carry must alias a stored chain object for this
        # regression guard to be meaningful
        pb = st.compiled._prebaked
        assert pb is not None
        stored_notes = [
            c for w in pb["wins"] for c in w[3].values()
            if getattr(c, "notes", None)
        ]
        live = list(st.compiled.carries.values())
        assert any(
            any(c is lv for lv in live) for c in stored_notes
        ), "served delta should alias stored carry objects"
        snap = [
            (n.on_f, n.off_f, n.dead_f, n.env_t, n.rel_t)
            for c in stored_notes for n in c.notes
        ]
        st.compiled.set_time(0)  # SampSyn clock remap (dt = -total)
        st.fb.set_time(0)
        assert snap == [
            (n.on_f, n.off_f, n.dead_f, n.env_t, n.rel_t)
            for c in stored_notes for n in c.notes
        ], "seek must not mutate chain-stored carries"
        r2 = self._render_np(st)      # starts from the remapped carry

        # ground truth: identical project + identical op sequence with
        # the chain machinery off entirely
        monkeypatch.setenv("TERMDAW_PREBAKE", "0")
        st2 = build("syn_live")
        g1 = self._render_np(st2)
        g2 = self._render_np(st2)
        assert np.array_equal(r1, g1)
        assert np.array_equal(r2, g2)

    def test_unfresh_index_matches_brute_force(self, tmp_path, monkeypatch):
        """The incremental _unfresh index (chain-serve eligibility rides
        on it) must equal a from-scratch freshness scan at every state
        transition: refresh, served render, live render, seek, off-grid
        window, stream feed."""
        import numpy as np

        from termdaw_tpu.config import Config
        from termdaw_tpu.engine.state import State
        from termdaw_tpu.fileio.midi import write_midi
        from termdaw_tpu.fileio.packets import encode_events, PacketDecoder
        from termdaw_tpu.graph.compile import _FRESH_CARRIES
        from termdaw_tpu.utils.fixtures import _drum

        def brute(cg):
            return {
                vi for vi, c in cg.carries.items()
                if _FRESH_CARRIES.get(cg.statics[vi].kind) != c
            }

        def check(cg, where):
            assert cg._unfresh == brute(cg), where
            assert cg._carries_fresh() == (not brute(cg)), where

        monkeypatch.setenv("TERMDAW_MESH", "0")
        d = tmp_path / "inv"
        d.mkdir()
        _drum(d / "hit.wav", 8000, 0.05, 300.0, 30.0)
        # notes held across window boundaries + a lerp retrigger: several
        # kinds end renders legitimately stateful
        write_midi(d / "hits.mid",
                   [(0.2, 0.8, 36, 100), (1.4, 2.4, 40, 90)], bpm=120)
        (d / "project.lua").write_text(f"""
set_length(4.0);
set_render_samplerate(8000);
set_render_bitdepth(16);
set_output_file("{d}/o.wav");
load_sample("hit", "{d}/hit.wav", "");
load_midi_floww("hits", "{d}/hits.mid");
declare_stream("live");
add_sample_multi("m", 1.0, 0.0, "hit", "live", -1);
add_sample_lerp("lerp", 1.0, 0.0, "hit", "hits", -1, 40);
add_synth("syn", 0.5, 0.0, "hits",
    0.4, 0.3, {{0.001, 0.02, 0.0, 0.0, 0.0, 0.0}},
    1.0, 0.8, {{0.01, 0.1, 0.8, 0.5, 0.2, 0.5}},
    0.5, {{0.01, 0.1, 0.8, 0.5, 0.2, 0.5}});
add_adsr("env", 1.0, 0.0, 1.0, "hits", false, true, -1,
    {{0.01, 0.1, 0.8, 0.4, 0.2, 0.6}});
add_normalize("sum", 1.0, 0.0);
connect("m", "sum");
connect("lerp", "env");
connect("env", "sum");
connect("syn", "sum");
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
        check(cg, "after refresh")
        self._render_np(st)
        check(cg, "after render 1 (+closing set_time)")
        self._render_np(st)
        check(cg, "after render 2 (recorded path)")
        bl = st.config.settings.buffer_length
        cg.set_time(5 * bl)
        st.fb.set_time(5 * bl)
        check(cg, "after mid-timeline seek")
        cg.render_window(st.fb, 3)
        check(cg, "after off-grid live window")
        ev = np.array([[0.0, 3.2, 36.0, 0.9]], np.float32)
        st.fb.append_streams(PacketDecoder().feed(encode_events("live", ev)))
        cg.set_time(0)
        st.fb.set_time(0)
        self._render_np(st)
        check(cg, "after feed + re-render")

    def test_feed_purges_stale_recorded_chains(self, tmp_path, monkeypatch):
        """A content-version bump can never revert, so recorded chains
        from older bank versions are purged (releasing their byte-budget
        share) as soon as a new recording starts — they must not wait
        for LRU eviction while holding device memory."""
        import numpy as np

        from termdaw_tpu.config import Config
        from termdaw_tpu.engine.state import State
        from termdaw_tpu.fileio.midi import write_midi
        from termdaw_tpu.fileio.packets import encode_events, PacketDecoder
        from termdaw_tpu.utils.fixtures import _drum

        monkeypatch.setenv("TERMDAW_MESH", "0")
        d = tmp_path / "purge"
        d.mkdir()
        _drum(d / "hit.wav", 8000, 0.05, 300.0, 30.0)
        write_midi(d / "hits.mid", [(0.2, 0.1, 36, 100)], bpm=120)
        (d / "project.lua").write_text(f"""
set_length(4.0);
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
        self._render_np(st)   # seed chain serves (fresh)
        self._render_np(st)   # stateful lerp -> live + RECORDED (v1)
        assert cg._recorded and cg._prebake_used > 0
        v1_banks = {r["bank"] for r in cg._recorded}
        # feed -> version v2; next stateful render records under v2 and
        # must purge the v1 chain
        ev = np.array([[0.0, 1.5, 36.0, 0.7]], np.float32)
        st.fb.append_streams(PacketDecoder().feed(encode_events("live", ev)))
        self._render_np(st)
        banks_now = {r["bank"] for r in cg._recorded}
        assert banks_now, "the v2 render must have recorded"
        assert not (v1_banks & banks_now), "stale-bank chains must purge"

    def test_refresh_releases_replaced_graphs_chains(self, tmp_path,
                                                     monkeypatch):
        """The program cache can pin a replaced CompiledGraph; its chains
        are pure cache and must be dropped at refresh so they never hold
        device memory from the pin."""
        monkeypatch.setenv("TERMDAW_MESH", "0")
        st = _make_state(tmp_path, seed=21)
        self._render_np(st)  # builds the seed chain
        old = st.compiled
        assert old._prebaked is not None
        st.refresh()
        assert old._prebaked is None
        assert not old._recorded and old._prebake_used == 0
