"""Graph compiler: DAG declarations -> one jitted XLA window program.

This replaces the reference's per-block recursive interpreter
(graph.rs:98-121 + the per-frame kernels of extensions.rs): after each
refresh the reachable subgraph is topo-sorted (post-order DFS identical to
the reference's run_vertex recursion, so input-summation order matches) and
traced into a single jitted function

    fn(num_state, params, bakes, samples, wavetables, fx_params, t0)
        -> (num_state', audio [nb*bl, 2])

per (window size nb, is_scan) pair. Everything data-like is traced —
gain/angle/wet vectors, effect parameters, event tables, the window start
t0 — so tweaking values or re-baking events never recompiles; only
topology / static dims (sample lengths, padded table sizes) key the cache.

Numeric state that must flow between windows lives in `num_state` (a pytree
on device): Normalize running maxima, BandPass IIR states, effect delay
tails. Event/voice bookkeeping stays host-side as bake carries
(graph/bake.py); `set_time` remaps their absolute frames so voice clocks
behave exactly like the reference's set_time partial reset
(extensions.rs:196-204 — Synth/DebugSine notes cleared, BandPass re-primed,
SampleMulti/SampleLerp/Adsr/SampSyn state carried).
"""

from __future__ import annotations

import os

from dataclasses import dataclass, replace
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from . import graph as G
from . import bake as B
from ..banks.flowwbank import FlowwBank
from ..ops import mix, sampler, synthv, envelope, filters
from ..ops.filters import BandPassState


def _pack_bakes(bakes: dict[str, dict[str, np.ndarray]]):
    """Pack every bake array into one int32 + one float32 buffer.

    Each host->device upload pays a fixed dispatch/transfer round-trip on
    the TPU tunnel (~tens of ms measured); a full-graph render window was
    shipping ~40 small tables. Two buffers + a static slicing layout keep
    it at two. The layout (offsets/shapes) is static exactly when the jit
    cache key is, so it rides the cache key."""
    ints: list[np.ndarray] = []
    floats: list[np.ndarray] = []
    layout: list[tuple] = []
    i_off = f_off = 0
    for vkey in sorted(bakes):
        for field in sorted(bakes[vkey]):
            a = np.asarray(bakes[vkey][field])
            if a.dtype in (np.int32, np.dtype(np.int32)):
                layout.append((vkey, field, "i", i_off, a.shape))
                ints.append(a.reshape(-1))
                i_off += a.size
            else:
                layout.append((vkey, field, "f", f_off, a.shape))
                floats.append(a.reshape(-1).astype(np.float32))
                f_off += a.size
    ints_buf = np.concatenate(ints) if ints else np.zeros(1, np.int32)
    floats_buf = np.concatenate(floats) if floats else np.zeros(1, np.float32)
    return ints_buf, floats_buf, tuple(layout)


# SINGLE source of truth for which vertex kinds carry host-side bake
# state and what their carry class is. _fresh_carry, the pristine-check
# instances, and (via isinstance) _copy_carry all derive from it — a new
# carry kind added here is automatically covered everywhere, and one
# added elsewhere fails CLOSED (no chain serve, deepcopy on the copy
# path) instead of silently serving stale or aliased prebaked state.
_CARRY_CLASSES: dict[str, type] = {
    G.SAMPLEMULTI: B.MultiCarry,
    G.SAMPLELERP: B.LerpCarry,
    G.DEBUGSINE: B.SineCarry,
    G.SYNTH: B.NotesCarry,
    G.SAMPSYN: B.NotesCarry,
    G.ADSR: B.AdsrCarry,
}

# reference instances for the "is this carry still pristine" check (all
# carry classes are dataclasses with structural equality); compared
# against, never handed out
_FRESH_CARRIES = {k: cls() for k, cls in _CARRY_CLASSES.items()}


def _copy_carry(c):
    """Store-side snapshot copy of a carry (_record_window): stored
    chains never alias objects captured FROM the live engine, keeping
    them valid even if an in-place mutation ever slipped back in. The
    serve side aliases known kinds out (carries are immutable values —
    every engine change rebinds, see _classify_delta); unknown carry
    types are deep-copied on both sides (fail closed)."""
    if isinstance(c, B.MultiCarry):
        return B.MultiCarry(list(c.voices))
    if isinstance(c, B.SineCarry):
        return B.SineCarry(list(c.notes))
    if isinstance(c, B.NotesCarry):
        return B.NotesCarry([replace(n) for n in c.notes])
    if isinstance(c, (B.LerpCarry, B.AdsrCarry)):
        return replace(c)
    import copy

    return copy.deepcopy(c)


def _unpack_bakes(ints_buf, floats_buf, layout):
    bakes: dict[str, dict[str, jnp.ndarray]] = {}
    for vkey, field, kind, off, shape in layout:
        size = int(np.prod(shape)) if shape else 1
        buf = ints_buf if kind == "i" else floats_buf
        arr = jax.lax.slice_in_dim(buf, off, off + size).reshape(shape)
        bakes.setdefault(vkey, {})[field] = arr
    return bakes


# jitted window programs shared across CompiledGraph instances: keyed by
# the graph spec + window size + scan flag + bake layouts, so a refresh
# with unchanged topology/static config never recompiles. BOUNDED (LRU):
# each program's closure pins its CompiledGraph — including the
# device-resident sample/wavetable buffers — and entries whose spec
# changed can never hit again, so an unbounded cache leaks HBM across a
# long interactive session of topology-changing refreshes.
_PROGRAM_CACHE: dict = {}
_PROGRAM_CACHE_CAP = max(
    8, int(os.environ.get("TERMDAW_PROGRAM_CACHE", "128") or "128")
)


class _SpecKey:
    """Hash-caching wrapper for the (large) program-spec tuple.

    The per-window program lookup hashes its cache key twice; Python
    tuples do not cache hashes, so at 256+ vertices that re-hashed every
    _VertexStatic dataclass each window (~1 ms of a dispatch-bound
    config's ~3 ms host budget). Equality still compares the underlying
    tuples, so cross-refresh program reuse is unchanged; repr delegates
    so the persistent AOT cache key string is unchanged too."""

    __slots__ = ("spec", "_hash")

    def __init__(self, spec: tuple) -> None:
        self.spec = spec
        self._hash = hash(spec)

    def __hash__(self) -> int:
        return self._hash

    def __eq__(self, other) -> bool:
        return self is other or (
            isinstance(other, _SpecKey) and self.spec == other.spec
        )

    def __repr__(self) -> str:
        return repr(self.spec)


def _cache_get(key):
    fn = _PROGRAM_CACHE.get(key)
    if fn is not None:
        _PROGRAM_CACHE[key] = _PROGRAM_CACHE.pop(key)  # LRU: move to end
    return fn


def _cache_put(key, fn):
    _PROGRAM_CACHE[key] = fn
    while len(_PROGRAM_CACHE) > _PROGRAM_CACHE_CAP:
        _PROGRAM_CACHE.pop(next(iter(_PROGRAM_CACHE)))

# device-resident frame->seconds tables, keyed by (sr, pow2 length).
# The reference computes time = (t+i) as f32 / sr as f32 with a TRUE f32
# division; this TPU has no f32 divider (XLA lowers /. to a reciprocal
# approximation measured 1 ulp off on 57% of integer/sr quotients), and
# at second-scale oscillator phases that 1 ulp is ~-77 dBFS. numpy's
# division IS correctly rounded, so the table is computed host-side once
# and windows dynamic-slice it on device. ~4 MB per minute of timeline.
_TIME_TABLES: dict[tuple, jnp.ndarray] = {}


def time_table(sr: int, n_frames: int) -> jnp.ndarray:
    n2 = 1 << max(12, (int(n_frames) - 1).bit_length())
    key = (sr, n2)
    tab = _TIME_TABLES.get(key)
    if tab is None:
        f = np.arange(n2, dtype=np.int64).astype(np.float32)  # (t+i) as f32
        tab = jnp.asarray(f / np.float32(sr))                 # true f32 div
        _TIME_TABLES[key] = tab
        # drop smaller tables for the same sr (strict prefixes)
        for k in [k for k in _TIME_TABLES if k[0] == sr and k[1] < n2]:
            del _TIME_TABLES[k]
    return tab

# sticky bake-table caps across refreshes, keyed by (vertex name, kind):
# a refresh that keeps a vertex reuses its caps, so the rebuilt graph's
# window layouts — and thus its compiled programs — match the old ones
_CAP_HWM: dict[tuple, dict[str, int]] = {}


def _caps_from_table(kind: str, tbl: dict) -> dict[str, int]:
    """Observed layout sizes of one baked table (the cap fields)."""
    if kind in (G.SAMPLEMULTI, G.DEBUGSINE, G.SYNTH, G.SAMPSYN):
        return {"p": int(tbl["idx"].shape[1]),
                "n": int(tbl["vels"].shape[0])}
    if kind == G.SAMPLELERP:
        return {"e": int(tbl["p_starts"].shape[0]),
                "b": int(tbl["bounds"].shape[0])}
    if kind == G.ADSR:
        return {"e": int(tbl["p_vel"].shape[0]),
                "b": int(tbl["bounds"].shape[0])}
    if kind == "fused":
        return {"pf": int(tbl["begins"].shape[1])}
    return {}


def _merge_caps(into: dict[str, int], new: dict[str, int]) -> None:
    for k, v in new.items():
        into[k] = max(into.get(k, 0), v)


@dataclass(frozen=True, eq=True)
class _VertexStatic:
    """Per-vertex compile-time configuration resolved at build.

    Hashable: it is part of the cross-refresh program-cache key (hot reload
    must not recompile when the topology/static config is unchanged)."""

    kind: str
    sample_pos: int | None = None      # position in the samples tuple
    sample_len: int = 0
    floww_index: int | None = None
    note: int | None = None
    lerp_len: int = 0
    confs: tuple = ()                  # AdsrConf tuple(s)
    osc_static: tuple = ()             # synth osc (vol, z) pairs
    use_off: bool = False
    use_max: bool = False
    pass_mode: bool = False
    lgamma: float = 0.0
    hgamma: float = 0.0
    wt_pos: int | None = None          # position in the wavetables tuple
    release_sec: float = 0.0           # synth-family note retention
    fx_kind: str = ""                  # key into ops.fx.EFFECTS
    fx_plugin_index: int = 0
    fx_static: tuple = ()              # ((name, value), ...) bound at build


class CompiledGraph:
    def __init__(
        self,
        graph: G.Graph,
        sample_bank,
        wavetables: dict[int, Any],  # vertex index -> WaveTable
        plugin_host,
        bl: int,
        sr: int,
        cap_scope: str = "",
    ) -> None:
        self.graph = graph
        self.bl = bl
        self.sr = sr
        # cap-stickiness scope: caps persist across refreshes of the SAME
        # project (keyed by its working dir), not across unrelated projects
        # built in one process — cross-project leakage would pad another
        # project's bake layouts and change its compiled-program identity
        # vs a fresh process (defeating the on-disk AOT executable cache)
        self.cap_scope = cap_scope
        self.plugin_host = plugin_host
        self.order = graph.topo_order()
        self.in_edges = [list(e) for e in graph.in_edges]
        self.output = graph.output_vertex
        self.t = graph.t

        # device-resident constants
        self.samples: list[jnp.ndarray] = []
        self.samples_padded: dict[int, jnp.ndarray] = {}  # pos -> [2, L+2bl]
        host_padded: dict[int, np.ndarray] = {}  # numpy; uploaded once below
        sample_pos: dict[int, int] = {}
        self.wavetables: list[tuple[jnp.ndarray, jnp.ndarray]] = []
        self.pallas_interpret = (
            os.environ.get("TERMDAW_PALLAS_INTERPRET", "0") == "1"
        )
        self.use_pallas = self.pallas_interpret or (
            jax.default_backend() == "tpu"
            and os.environ.get("TERMDAW_PALLAS", "1") == "1"
        )
        # read once at build; part of the program-cache spec and pinned
        # while tracing (ADVICE r2: a mid-process env toggle must not serve
        # a stale compiled program). The exact lane only applies
        # single-device (documented in docs/manual.md).
        self.exact_biquad = filters.exact_biquad_env()

        self.statics: dict[int, _VertexStatic] = {}
        for vi in self.order:
            v = graph.vertices[vi]
            kw: dict[str, Any] = {"kind": v.kind}
            p = v.params
            if v.kind in (G.SAMPLELOOP, G.SAMPLEMULTI, G.SAMPLELERP):
                si = p["sample_index"]
                if si not in sample_pos:
                    sample_pos[si] = len(self.samples)
                    arr = sample_bank.get_sample(si).as_array()
                    self.samples.append(jnp.asarray(arr))
                kw["sample_pos"] = sample_pos[si]
                kw["sample_len"] = len(sample_bank.get_sample(si))
                if v.kind == G.SAMPLEMULTI and kw["sample_pos"] not in (
                    host_padded
                ):
                    # pad HOST-side (numpy) and upload once below: an
                    # eager jnp.pad here pays a per-op remote compile +
                    # dispatch on every refresh (CLAUDE.md: everything
                    # JAX must run under jit). Layout matches
                    # ops/pallas_voices.make_padded_sample.
                    harr = sample_bank.get_sample(si).as_array()
                    host_padded[kw["sample_pos"]] = np.pad(
                        np.asarray(harr, np.float32).T,
                        ((0, 0), (bl, bl + 256)),
                    )
            if v.kind in (
                G.SAMPLEMULTI, G.SAMPLELERP, G.DEBUGSINE, G.SYNTH,
                G.SAMPSYN, G.ADSR,
            ):
                kw["floww_index"] = p["floww_index"]
                kw["note"] = p.get("note")
            if v.kind == G.SAMPLELERP:
                kw["lerp_len"] = p["lerp_len"]
            if v.kind == G.SYNTH:
                kw["osc_static"] = (
                    (p["sq_vol"], p["sq_z"]),
                    (p["tf_vol"], p["tf_z"]),
                    (p["tr_vol"], 0.0),
                )
                kw["confs"] = (p["sq_conf"], p["tf_conf"], p["tr_conf"])
                # effective release (extensions.rs:469-477): max release_sec
                # over oscillators with volume > 0
                rel = 0.0
                if p["sq_vol"] > 0.0:
                    rel = p["sq_conf"].release_sec
                if p["tf_vol"] > 0.0:
                    rel = max(rel, p["tf_conf"].release_sec)
                if p["tr_vol"] > 0.0:
                    rel = max(rel, p["tr_conf"].release_sec)
                kw["release_sec"] = rel
            if v.kind == G.SAMPSYN:
                kw["confs"] = (p["conf"],)
                kw["release_sec"] = p["conf"].release_sec
                wt = wavetables[vi]
                kw["wt_pos"] = len(self.wavetables)
                self.wavetables.append(
                    (jnp.asarray(wt.times), jnp.asarray(wt.waves))
                )
            if v.kind == G.ADSR:
                kw["confs"] = (p["conf"],)
                kw["use_off"] = p["use_off"]
                kw["use_max"] = p["use_max"]
            if v.kind == G.BANDPASS:
                kw["pass_mode"] = p["pass_mode"]
                kw["lgamma"] = filters.gamma_from_cutoff(p["cut_low"], sr)
                kw["hgamma"] = filters.gamma_from_cutoff(p["cut_high"], sr)
            if v.kind == G.PLUGINFX:
                from ..ops.fx import static_values

                plug = plugin_host.get(p["plugin_index"])
                kw["fx_plugin_index"] = p["plugin_index"]
                kw["fx_kind"] = plug.effect.kind
                # static params (delay-line lengths, biquad coefs) bind here;
                # they are part of the program-cache spec, so changing one at
                # refresh recompiles, as it must
                kw["fx_static"] = tuple(sorted(static_values(
                    plug.effect, plugin_host.param_values(p["plugin_index"])
                ).items()))
            self.statics[vi] = _VertexStatic(**kw)

        # fused SampleMulti groups: all SAMPLEMULTI vertices whose ONLY
        # consumer is the same summing vertex fold into one stereo voice-mix
        # kernel call at that consumer (per-vertex pan/gain folds into
        # per-voice channel amps — mix.post is linear per channel). A
        # 64-track mix becomes 1 kernel invocation instead of 64. Semantics
        # unchanged (extensions.rs:343-381); input-summation order inside
        # the group commutes up to f32 rounding.
        consumers: dict[int, list[int]] = {vi: [] for vi in self.order}
        for vi in self.order:
            for j in self.in_edges[vi]:
                consumers[j].append(vi)
        self.fused_groups: dict[int, tuple[int, ...]] = {}
        if self.use_pallas:
            cand: dict[int, list[int]] = {}
            for vi in self.order:
                if (
                    self.statics[vi].kind == G.SAMPLEMULTI
                    and vi != self.output
                    and len(consumers[vi]) == 1
                ):
                    cand.setdefault(consumers[vi][0], []).append(vi)
            self.fused_groups = {
                c: tuple(ms) for c, ms in cand.items() if len(ms) >= 2
            }
        self._fused_members = frozenset(
            m for ms in self.fused_groups.values() for m in ms
        )
        # per-group concat-buffer layout: unique sample positions in member
        # order, each segment's base offset within the concatenated padded
        # buffer (segments keep make_padded_sample's layout)
        self._fused_layout: dict[int, tuple[tuple[int, ...], dict[int, int]]] = {}
        for c, ms in self.fused_groups.items():
            poses: list[int] = []
            for m in ms:
                p = self.statics[m].sample_pos
                if p not in poses:
                    poses.append(p)
            bases, off = {}, 0
            for p in poses:
                bases[p] = off
                off += int(host_padded[p].shape[1])
            self._fused_layout[c] = (tuple(poses), bases)

        # cross-refresh program-cache key: the jitted window programs depend
        # only on this signature (plus window size / scan flag / bake
        # layouts), so a refresh that doesn't change the topology or static
        # vertex config reuses every compiled program — hot reload stays hot
        # (the reference's refresh has no compile step to amortize;
        # state.rs:50-471)
        self.spec = _SpecKey((
            bl, sr, self.use_pallas, self.pallas_interpret,
            self.exact_biquad,
            tuple(self.order),
            tuple(tuple(self.in_edges[vi]) for vi in self.order),
            self.output,
            tuple(self.statics[vi] for vi in self.order),
            tuple(int(s.shape[0]) for s in self.samples),
            tuple(tuple(w.shape for w in wt) for wt in self.wavetables),
            len(graph.vertices),
        ))

        # traced per-vertex scalar params, indexed by vertex id
        self._gains = jnp.asarray(
            [graph.vertices[i].gain for i in range(len(graph.vertices))],
            jnp.float32,
        )
        self._angles = jnp.asarray(
            [graph.vertices[i].angle for i in range(len(graph.vertices))],
            jnp.float32,
        )
        self._wets = jnp.asarray(
            [graph.vertices[i].wet for i in range(len(graph.vertices))],
            jnp.float32,
        )

        # numeric device state + host bake carries
        self.num_state: dict[str, Any] = {}
        self.carries: dict[int, Any] = {}
        for vi in self.order:
            st = self.statics[vi]
            if st.kind == G.NORMALIZE:
                self.num_state[f"{vi}.max"] = jnp.float32(0.0)
                self.num_state[f"{vi}.scan_max"] = jnp.float32(0.0)
            elif st.kind == G.BANDPASS:
                self.num_state[f"{vi}.bp"] = BandPassState.init()
            elif st.kind == G.PLUGINFX:
                from ..ops.fx import EFFECTS

                self.num_state[f"{vi}.fx"] = (
                    EFFECTS[st.fx_kind].init_state(sr, dict(st.fx_static))
                )
            else:
                c = self._fresh_carry(st.kind)
                if c is not None:
                    self.carries[vi] = c
        # incremental freshness index: vi is in _unfresh iff carries[vi]
        # differs from its kind's fresh value (unknown kinds: always in,
        # fail closed). Maintained at every carry assignment site —
        # _carries_fresh/_carries_equal were full O(carries) scans per
        # render (~1 ms at 1024 tracks) re-deriving this from scratch.
        self._unfresh: set[int] = set()
        self._rebuild_unfresh()
        # static per-kind vertex lists for set_time: only unfresh carries
        # plus SampleLerp (always remapped) need visiting, and only
        # BandPass vertices need the filter re-prime
        self._lerp_vis = tuple(
            vi for vi in self.order
            if self.statics[vi].kind == G.SAMPLELERP
        )
        self._bandpass_vis = tuple(
            vi for vi in self.order
            if self.statics[vi].kind == G.BANDPASS
        )

        # sticky per-vertex bake-table caps (VERDICT r2 item 2): table
        # layouts pad to these, so jit program layouts do not depend on
        # which events land in a window. Seeded from _CAP_HWM (cross-
        # refresh stickiness), raised by seed_caps()'s full-schedule
        # prebake at render start, and grown on the pow2 ladder if a
        # window ever overflows. TERMDAW_VOICE_CAP=n instead HARD-caps
        # per-block polyphony with documented oldest-voice steal
        # (SURVEY §7 overflow policy).
        vc = os.environ.get("TERMDAW_VOICE_CAP", "")
        self.voice_cap = int(vc) if vc.isdigit() and int(vc) > 0 else None
        self.bake_caps: dict[str, dict[str, int]] = {}
        for vi in self.order:
            st = self.statics[vi]
            hw = _CAP_HWM.get((self.cap_scope, graph.names[vi], st.kind))
            if hw:
                self.bake_caps[str(vi)] = dict(hw)
        for c in self.fused_groups:
            hw = _CAP_HWM.get((self.cap_scope, graph.names[c], "fused"))
            if hw:
                self.bake_caps[f"fused{c}"] = dict(hw)

        # padded channel-major copies (Pallas voice kernel) in a stable
        # order so they can ride the call as traced args. Multi-sample
        # fused groups get their concatenated buffer built ONCE here (a
        # device array passed like any other sample) instead of
        # re-concatenating inside the traced window program on every
        # window execution. All layout work happens in numpy; each buffer
        # is ONE upload (no eager device ops at build).
        for pos, hp in host_padded.items():
            self.samples_padded[pos] = jnp.asarray(hp)
        for c, (poses, _bases) in self._fused_layout.items():
            if len(poses) > 1:
                self.samples_padded[("fused", c)] = jnp.asarray(
                    np.concatenate([host_padded[p] for p in poses], axis=1)
                )
        self.padded_order = tuple(
            sorted(self.samples_padded, key=lambda k: (isinstance(k, tuple), k))
        )

        # prebaked render chain (seed_caps pass 2): per-window packed bake
        # tables + end carries for the full schedule, served by
        # render_window when schedule/grid/carry lineage match. At 1024
        # tracks the per-window host bake was ~80% of render wall time
        # (measured r5: 23 ms of a 28 ms c7 render, device idle) — for an
        # unchanged schedule it is pure recomputation of what seed_caps
        # already walked.
        self._prebaked: dict | None = None
        self._prebake_on = (
            os.environ.get("TERMDAW_PREBAKE", "1") == "1"
        )
        self._prebake_budget = float(
            os.environ.get("TERMDAW_PREBAKE_MB", "256")
        ) * 1e6
        # RECORDED chains (round 5): stateful carries (a SampleLerp
        # voice holding its last trigger, Adsr/SampSyn clocks) make
        # repeat renders miss the fresh-start seed chain — but they
        # reach a steady state (the same post-render carry values every
        # render, reference semantics). So live-baked windows are
        # recorded keyed by a SNAPSHOT of their starting carries and
        # served when a later render starts from equal state —
        # bit-exact replay of what the live bake computed. Bounded by
        # the shared byte budget and an LRU of _REC_MAX chains.
        self._recorded: list[dict] = []
        self._rec_active: dict | None = None
        self._prebake_used = 0

        # packed effect-param vector, keyed by PluginHost.version (the
        # pack walked the full vertex order every window; on a 1024-track
        # graph with zero fx vertices that was ~0.4 ms/render of nothing)
        self._fx_cache: tuple | None = None
        # per-fused-group pooled event arrays, keyed by FlowwBank version
        self._pool_cache: dict[int, tuple] = {}
        # per-(consumer, member) processed event arrays, keyed by the
        # member's events array identity (see _group_pool)
        self._member_pool_cache: dict[tuple[int, int], tuple] = {}
        # per-consumer sample_len/base vectors (see _fused_member_vecs)
        self._fused_vecs: dict[int, tuple] = {}

    @staticmethod
    def _fresh_carry(kind: str):
        cls = _CARRY_CLASSES.get(kind)
        return cls() if cls is not None else None

    def _record_caps(self, key: str, name_key: tuple, kind: str, tbl) -> None:
        caps = self.bake_caps.setdefault(key, {})
        _merge_caps(caps, _caps_from_table(kind, tbl))
        if self.voice_cap is not None and "p" in caps:
            caps["p"] = min(caps["p"], self.voice_cap)
        _CAP_HWM[name_key] = dict(caps)

    def seed_caps(
        self, fb: FlowwBank, total_blocks: int, step: int,
        fused: bool | None = None, prebake: bool | None = None,
    ) -> None:
        """Pre-bake the full known event schedule over the render window
        grid and pin every bake-table cap at the observed maxima, so the
        actual render mints ONE table layout per window size instead of
        re-specializing the jitted program on each window's event density
        (VERDICT r2 item 2). Cheap (host numpy, proportional to event
        count); idempotent; leaves graph/floww state untouched. Call
        whenever the schedule may have grown (render start, stream
        append). `prebake=False` skips the chain-storing second pass —
        pass it when rendering will take the SHARDED path, which always
        live-bakes (the stored chain would be pure waste: a second full
        host bake plus device uploads that can never be served)."""
        # pin the frame->seconds table to the full song length too: its
        # power-of-2-rounded shape rides the jit trace signature, so letting
        # it grow window-by-window (2^19 -> 2^20 -> 2^21 over a 40 s render)
        # mints a fresh compiled program per size bracket even though the
        # window size never changed
        if total_blocks > 0:
            self._ttab_min_frames = max(
                getattr(self, "_ttab_min_frames", 0),
                total_blocks * self.bl,
            )
        if total_blocks <= 0 or not self.carries:
            return
        fused = self.use_pallas if fused is None else fused
        do_prebake = self._prebake_on and prebake is not False
        # fb.uid, not id(fb): the allocator can reuse a collected bank's
        # address, and a false memo hit here silently skips cap seeding
        # (bringing back the per-window program re-specialization).
        # do_prebake rides the sig: a schedule first seeded for the
        # sharded path (no chain) must still build its chain when a
        # single-device render later asks for one.
        sig = (fb.uid, fb.version, total_blocks, step, fused, do_prebake)
        if getattr(self, "_seeded_sigs", None) is None:
            self._seeded_sigs = set()
        if sig in self._seeded_sigs:
            return  # schedule unchanged since the last seed — nothing new
        saved_frame = fb.frame
        fb.set_time(0)
        try:
            carries = {
                vi: self._fresh_carry(self.statics[vi].kind)
                for vi in self.carries
            }
            t, left = 0, total_blocks
            while left > 0:
                nb = min(left, step)
                _, nc = self._bake_all(
                    fb, t, nb, fused=fused, carries=carries
                )
                carries.update(nc)
                fb.advance_blocks(nb)
                t += nb * self.bl
                left -= nb
            # pass 2 (round 5): re-bake the same grid — caps are now
            # pinned, so every table has its final layout — and STORE
            # each window's packed buffers (uploaded to device once) +
            # end carries. render_window serves these for an unchanged
            # schedule instead of re-baking: the per-window host bake
            # was ~80% of a 1024-track render's wall clock, pure
            # recomputation of this very walk.
            if do_prebake:
                fb.set_time(0)
                carries = {
                    vi: self._fresh_carry(self.statics[vi].kind)
                    for vi in self.carries
                }
                index: dict[tuple, int] = {}
                wins: list[tuple] = []
                # the byte budget is SHARED with recorded chains: release
                # the old seed chain's share before building its successor
                if self._prebaked is not None:
                    self._prebake_used -= self._prebaked.get("bytes", 0)
                    self._prebaked = None
                t, left, used = 0, total_blocks, 0
                while left > 0 and self._prebake_used + used \
                        <= self._prebake_budget:
                    nb = min(left, step)
                    bakes, nc = self._bake_all(
                        fb, t, nb, fused=fused, carries=carries
                    )
                    ints_buf, floats_buf, layout = _pack_bakes(bakes)
                    used += ints_buf.nbytes + floats_buf.nbytes
                    index[(t, fb.frame, nb)] = len(wins)
                    # store the SPARSE carry delta vs the window's start
                    # state: lineage guarantees the live carries equal
                    # that start state at serve time, so unchanged
                    # entries (the vast majority — empty voice lists on
                    # a 1024-track mix) need no update at all
                    delta = {
                        vi: c for vi, c in nc.items()
                        if c != carries.get(vi)
                    }
                    wins.append((
                        jnp.asarray(ints_buf), jnp.asarray(floats_buf),
                        layout, delta, *self._classify_delta(delta),
                    ))
                    carries = dict(carries)
                    carries.update(nc)
                    fb.advance_blocks(nb)
                    t += nb * self.bl
                    left -= nb
                self._prebake_used += used
                self._prebaked = {
                    "bank": (fb.uid, fb.version), "fused": fused,
                    "index": index, "wins": wins, "expect": None,
                    "bytes": used,
                }
        finally:
            # an interrupt mid-prebake must not leave the bank's cursor
            # desynced from graph time (the next render would bake
            # events anchored at the wrong frame)
            fb.set_time(saved_frame)
        self._seeded_sigs.add(sig)

    def _classify_carry(self, vi: int, c) -> None:
        """Keep the _unfresh index exact at an assignment of carries[vi].
        A kind missing from the registry classifies unfresh forever (the
        fail-closed rule from _carries_fresh)."""
        f = _FRESH_CARRIES.get(self.statics[vi].kind)
        if f is None or c != f:
            self._unfresh.add(vi)
        else:
            self._unfresh.discard(vi)

    def _rebuild_unfresh(self) -> None:
        self._unfresh.clear()
        for vi, c in self.carries.items():
            self._classify_carry(vi, c)

    def _classify_delta(self, delta: dict) -> tuple:
        """Chain-build-time classification of a stored carry delta:
        (fresh set, unfresh set, needs-copy set). Serving then applies
        the delta with three C-speed set operations instead of a
        per-entry dataclass-eq + isinstance walk (which was ~0.7 ms per
        1024-track render). Sound because stored values are immutable
        from the engine's perspective: aliased kinds are never mutated
        in place, and copy-on-serve kinds compare equal to their copies."""
        fresh, unfresh, copies = set(), set(), set()
        for vi, c in delta.items():
            f = _FRESH_CARRIES.get(self.statics[vi].kind)
            if f is not None and c == f:
                fresh.add(vi)
            else:
                unfresh.add(vi)
            if not isinstance(
                c, (B.MultiCarry, B.SineCarry, B.LerpCarry, B.AdsrCarry,
                    B.NotesCarry)
            ):
                copies.add(vi)  # unknown kinds only: copy on serve
                # (every known carry is an immutable value — the engine
                # rebinds on change, never mutates; set_time's SampSyn
                # remap was the last in-place site and now rebinds too)
        return frozenset(fresh), frozenset(unfresh), frozenset(copies)

    def _apply_carries(self, new_carries: dict) -> None:
        """The one write path into self.carries outside set_time: binds
        the new values and keeps the freshness index exact. Carries are
        immutable values engine-wide (every change rebinds — bake builds
        fresh objects, set_time's SampSyn remap rebinds), so
        assignment-site classification is sufficient, and set_time's own
        rebinds (which bypass this) cannot flip freshness: they map
        non-empty states to non-empty states."""
        carries = self.carries
        for vi, c in new_carries.items():
            carries[vi] = c
            self._classify_carry(vi, c)

    def _carries_fresh(self) -> bool:
        """True when every live carry equals a fresh one — the prebaked
        chain's window 0 can then be served (the chain was seeded from
        fresh carries). A render that ends with surviving voices (or an
        Adsr clock mid-cell) honestly fails this and live-bakes, exactly
        like the reference's stateful consecutive renders. A carried
        kind missing from the registry fails CLOSED (never serves)."""
        return not self._unfresh

    def _carries_equal(self, snapshot: dict,
                       snap_unfresh: frozenset | None = None) -> bool:
        """Live carries == snapshot. With the snapshot's own recorded
        unfresh set, only unfresh entries need comparing: carries share
        one key set per CompiledGraph, and an entry absent from BOTH
        unfresh sets equals the same fresh value on each side; unequal
        sets mean some entry is fresh on exactly one side."""
        if snap_unfresh is None:  # defensive full scan (no recorded set)
            for vi, c in self.carries.items():
                if c != snapshot.get(vi):
                    return False
            return True
        if self._unfresh != snap_unfresh:
            return False
        return all(self.carries[vi] == snapshot[vi] for vi in self._unfresh)

    def _prebake_take(self, fb: FlowwBank, t0: int, nb: int):
        """Serve one window from a prebaked/recorded chain when the
        schedule (bank uid+version), fused mode, window grid position,
        AND carry lineage all match; None means live-bake. Lineage:
        either the previous window was served from the same chain (the
        live carries ARE its output), or this is the chain's window 0
        and the live carries equal its recorded start state (pristine
        for the seed chain, a snapshot for recorded chains). Served
        deltas are ALIASED for every known carry kind — carries are
        immutable values (the engine rebinds on change, never mutates),
        so a stored object can safely live in self.carries; unknown
        kinds are copied (fail closed)."""
        if not self._prebake_on:
            return None
        bank = (fb.uid, fb.version)
        key = (t0, fb.frame, nb)
        chains = ([self._prebaked] if self._prebaked is not None else [])
        chains += list(reversed(self._recorded))  # newest first
        for ch in chains:
            if ch["fused"] != self.use_pallas or ch["bank"] != bank:
                continue
            i = ch["index"].get(key)
            if i is None:
                continue
            if ch["expect"] != i:
                if i != 0:
                    continue
                start = ch.get("start")
                ok = (self._carries_fresh() if start is None
                      else self._carries_equal(
                          start, ch.get("start_unfresh")
                      ))
                if not ok:
                    continue
            ints_buf, floats_buf, layout, delta, fresh_d, unfresh_d, \
                copy_vis = ch["wins"][i]
            ch["expect"] = i + 1
            if copy_vis:  # only in-place-mutable kinds need copies
                delta = {
                    vi: (_copy_carry(c) if vi in copy_vis else c)
                    for vi, c in delta.items()
                }
            return ints_buf, floats_buf, layout, delta, fresh_d, unfresh_d
        return None

    _REC_MAX = 4       # recorded chains kept (LRU)
    _REC_MIN_NB = 64   # only render-scale windows are worth recording

    def _record_window(self, fb: FlowwBank, t0: int, nb: int,
                       ints_buf, floats_buf, layout, new_carries) -> None:
        """Record one live-baked window into the active recording chain
        (started with a snapshot of the CURRENT pre-window carries).
        Called before self.carries is updated. Deltas and snapshots are
        copies — carries are immutable values engine-wide, so this is
        pure defense in depth: if an in-place mutation ever slipped back
        in, stored chains would still hold their own objects."""
        if not self._prebake_on or nb < self._REC_MIN_NB:
            return
        used = ints_buf.nbytes + floats_buf.nbytes
        if self._prebake_used + used > self._prebake_budget:
            self._rec_finish()
            return
        bank = (fb.uid, fb.version)
        rec = self._rec_active
        if (rec is None or rec["bank"] != bank
                or rec["next"] != (t0, fb.frame)):
            self._rec_finish()
            # a version bump never reverts: recorded chains from older
            # bank versions can never serve again — drop them so they
            # stop holding device memory and budget
            stale = [r for r in self._recorded if r["bank"] != bank]
            for r in stale:
                self._recorded.remove(r)
                self._prebake_used -= r.get("bytes", 0)
            rec = self._rec_active = {
                "bank": bank, "fused": self.use_pallas,
                "start": {
                    vi: _copy_carry(c) for vi, c in self.carries.items()
                },
                "start_unfresh": frozenset(self._unfresh),
                "index": {}, "wins": [], "expect": None, "bytes": 0,
            }
        delta = {
            vi: _copy_carry(c) for vi, c in new_carries.items()
            if c != self.carries.get(vi)
        }
        rec["index"][(t0, fb.frame, nb)] = len(rec["wins"])
        rec["wins"].append((
            jnp.asarray(ints_buf), jnp.asarray(floats_buf), layout, delta,
            *self._classify_delta(delta),
        ))
        rec["next"] = (t0 + nb * self.bl, fb.frame + nb * self.bl)
        rec["bytes"] += used
        self._prebake_used += used

    def _rec_finish(self) -> None:
        """Archive the active recording (if it captured anything) so
        later renders starting from the same carry state can serve it."""
        rec = self._rec_active
        self._rec_active = None
        if rec and rec["wins"]:
            rec.pop("next", None)
            self._recorded.append(rec)
            while len(self._recorded) > self._REC_MAX:
                old = self._recorded.pop(0)
                self._prebake_used -= old.get("bytes", 0)

    def _reset_chain_expects(self) -> None:
        """A live-baked window means the live carries diverged from
        every chain's lineage: only a matching window-0 re-entry may
        serve now."""
        if self._prebaked is not None:
            self._prebaked["expect"] = None
        for rec in self._recorded:
            rec["expect"] = None

    def _break_prebake_chain(self) -> None:
        """External state change (seek, sharded window): reset chain
        lineage AND close the active recording — its continuity is
        broken."""
        self._reset_chain_expects()
        self._rec_finish()

    def release_chains(self) -> None:
        """Drop every prebaked/recorded chain (device buffers included).
        Called when this graph is replaced at refresh: the program cache
        may keep pinning the instance through compiled closures, and the
        chains are pure cache — they must not hold HBM from there."""
        self._prebaked = None
        self._recorded.clear()
        self._rec_active = None
        self._prebake_used = 0
        if getattr(self, "_seeded_sigs", None) is not None:
            self._seeded_sigs.clear()  # a future seed must rebuild

    # -- normalization controls (reference graph.rs:195-220) ---------------
    def reset_normalize_vertices(self) -> None:
        for vi in self.order:
            if self.statics[vi].kind == G.NORMALIZE:
                self.num_state[f"{vi}.max"] = jnp.float32(1e-6)

    def reset_scan_normalize_vertices(self) -> None:
        for vi in self.order:
            if self.statics[vi].kind == G.NORMALIZE:
                self.num_state[f"{vi}.scan_max"] = jnp.float32(0.0)

    def apply_scan_normalize_vertices(self) -> None:
        for vi in self.order:
            if self.statics[vi].kind == G.NORMALIZE:
                self.num_state[f"{vi}.max"] = self.num_state[f"{vi}.scan_max"]

    def get_normalization_values(self) -> list[tuple[str, float]]:
        out = []
        for vi in self.order:
            if self.statics[vi].kind == G.NORMALIZE:
                out.append(
                    (self.graph.names[vi],
                     float(self.num_state[f"{vi}.max"]))
                )
        return out

    # -- time control -------------------------------------------------------
    def set_time(self, t: int) -> None:
        """Reference extensions.rs:196-204 partial reset: clear DebugSine and
        Synth notes, re-prime BandPass; SampleMulti/SampleLerp/Adsr/SampSyn
        voice clocks keep their elapsed time (absolute frames remapped)."""
        dt = t - self.t
        # only unfresh carries can need work (every branch is a no-op on
        # a fresh carry) — except SampleLerp, whose anchor remap applies
        # even to a pristine carry (it then becomes unfresh, exactly as
        # the full-scan loop behaved). At 1024 fresh tracks this loop
        # visited every carry to do nothing (~0.4 ms/render).
        for vi in self._unfresh.union(self._lerp_vis):
            carry = self.carries[vi]
            kind = self.statics[vi].kind
            if kind == G.DEBUGSINE:
                if carry.notes:
                    self.carries[vi] = B.SineCarry()
                    self._unfresh.discard(vi)
            elif kind == G.SYNTH:
                if carry.notes:
                    self.carries[vi] = B.NotesCarry()
                    self._unfresh.discard(vi)
            elif kind == G.SAMPLEMULTI:
                if carry.voices:  # stays unfresh (still non-empty)
                    self.carries[vi] = B.MultiCarry(
                        [(s + dt, v) for s, v in carry.voices]
                    )
            elif kind == G.SAMPLELERP:
                c = replace(
                    carry,
                    primary_start=carry.primary_start + dt,
                    ghost_start=carry.ghost_start + dt,
                )
                self.carries[vi] = c
                self._classify_carry(vi, c)
            elif kind == G.SAMPSYN:
                # the clock remap rebinds a NEW NotesCarry for non-empty
                # carries and leaves a fresh (empty) carry untouched, so
                # freshness cannot flip. This was the engine's single
                # in-place carry mutation; with it gone, carries are
                # immutable values everywhere — every change rebinds —
                # so chain serves may alias stored objects
                # (see _classify_delta) instead of copying per window
                if carry.notes:
                    self.carries[vi] = B.NotesCarry([
                        replace(
                            n,
                            on_f=n.on_f + dt,
                            off_f=(None if n.off_f is None
                                   else n.off_f + dt),
                            dead_f=(n.dead_f + dt
                                    if n.dead_f < B.INF_FRAME
                                    else n.dead_f),
                        )
                        for n in carry.notes
                    ])
            elif kind == G.ADSR:
                pass  # cell clocks are time-relative values; they carry
                # through seeks unchanged (the reference's set_time does
                # not reset Adsr state, extensions.rs:196-204)
        for vi in self._bandpass_vis:
            self.num_state[f"{vi}.bp"] = BandPassState.init()
        self.t = t
        self.graph.t = t
        self._break_prebake_chain()

    def change_time(self, delta: int, plus: bool) -> int:
        new_t = self.t + delta if plus else self.t - min(delta, self.t)
        self.set_time(new_t)
        return new_t

    def get_time(self) -> int:
        return self.t

    # -- rendering ----------------------------------------------------------
    def render_window(
        self, fb: FlowwBank, nb: int, is_scan: bool = False
    ) -> jnp.ndarray:
        """Render `nb` blocks starting at the current graph time. The floww
        bank cursor must already sit at the same frame (the engine aligns
        them). Advances graph time and all carried state. Returns device
        audio [nb*bl, 2]."""
        t0 = self.t
        served = self._prebake_take(fb, t0, nb)
        if served is not None:
            ints_buf, floats_buf, layout, new_carries, fresh_d, \
                unfresh_d = served
        else:
            fresh_d = None
            self._reset_chain_expects()
            bakes, new_carries = self._bake_all(
                fb, t0, nb, fused=self.use_pallas
            )
            ints_buf, floats_buf, layout = _pack_bakes(bakes)
            # record the live window so a later render starting from the
            # SAME carry state (stateful carries reach a steady state
            # after one render) can serve it instead of re-baking
            self._record_window(
                fb, t0, nb, ints_buf, floats_buf, layout, new_carries
            )
        fx_vec, fx_layout = self._pack_fx()
        ttab = time_table(
            self.sr,
            max(t0 + nb * self.bl, getattr(self, "_ttab_min_frames", 0)),
        )

        fn = self._get_fn(nb, is_scan, layout, fx_layout)
        with filters.exact_biquad_scope(self.exact_biquad):
            new_state, audio = fn.call_pinned(
                self.num_state,
                (self._gains, self._angles, self._wets),
                ints_buf,
                floats_buf,
                fx_vec,
                tuple(self.samples),
                tuple(self.samples_padded[p] for p in self.padded_order),
                tuple(self.wavetables),
                np.int32(t0),
                ttab,
            )
        self.num_state = new_state
        if fresh_d is None:
            self._apply_carries(new_carries)  # live bake: classify each
        else:
            # served delta: classification was precomputed at chain build
            self.carries.update(new_carries)
            self._unfresh.difference_update(fresh_d)
            self._unfresh.update(unfresh_d)
        self.t = t0 + nb * self.bl
        self.graph.t = self.t
        return audio

    def window_cost(self, fb: FlowwBank, nb: int,
                    is_scan: bool = False) -> dict | None:
        """XLA's cost analysis of the exact compiled window program that
        `render_window(fb, nb)` would dispatch at the current time, or
        None when unavailable (fallback jit path, backend without cost
        analysis). Used by the bench's roofline accounting — it answers
        "how many flops / bytes does one window cost" with the compiler's
        own count instead of a hand model. Does not advance time or
        carried state. NOTE: "bytes accessed" is XLA's logical count
        (gathers/scans are inflated vs physical HBM traffic); treat the
        derived bandwidth as an upper estimate."""
        t0 = self.t
        bakes, _ = self._bake_all(fb, t0, nb, fused=self.use_pallas)
        ints_buf, floats_buf, layout = _pack_bakes(bakes)
        fx_vec, fx_layout = self._pack_fx()
        fn = self._get_fn(nb, is_scan, layout, fx_layout)
        compiled = getattr(fn, "_compiled", None)
        if compiled is None:
            return None
        try:
            ca = compiled.cost_analysis()
        except Exception:
            return None
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else None
        if not ca:
            return None
        out = dict(ca)
        try:
            ma = compiled.memory_analysis()
            out["_mem"] = {
                "arg_bytes": int(ma.argument_size_in_bytes),
                "out_bytes": int(ma.output_size_in_bytes),
                "temp_bytes": int(ma.temp_size_in_bytes),
                "peak_bytes": int(ma.peak_memory_in_bytes),
            }
        except Exception:
            pass  # physical-bytes floor simply absent from the roofline
        return out

    def _pack_fx(self) -> tuple[np.ndarray, tuple]:
        """Traced effect parameters as one f32 vector + static layout.
        Static params (EffectDef.static_params) are excluded — they were
        bound into _VertexStatic.fx_static at build. Memoized against
        PluginHost.version: the layout is static per CompiledGraph and the
        values only change through the host's mutators."""
        from ..ops.fx import EFFECTS

        ver = getattr(self.plugin_host, "version", None)
        if (self._fx_cache is not None and ver is not None
                and self._fx_cache[0] == ver):
            return self._fx_cache[1], self._fx_cache[2]
        vals: list[float] = []
        layout: list[tuple] = []
        for vi in self.order:
            if self.statics[vi].kind != G.PLUGINFX:
                continue
            pv = self.plugin_host.param_values(
                self.statics[vi].fx_plugin_index
            )
            skip = EFFECTS[self.statics[vi].fx_kind].static_params
            for name in sorted(pv):
                if name in skip:
                    continue
                layout.append((str(vi), name, len(vals)))
                vals.append(float(pv[name]))
        vec = np.asarray(vals, np.float32) if vals else np.zeros(1, np.float32)
        lay = tuple(layout)
        self._fx_cache = (ver, vec, lay)
        return vec, lay

    # -- sharded rendering (sequence parallelism over the timeline) ---------
    def render_window_sharded(
        self, fb: FlowwBank, nb_total: int, mesh, is_scan: bool = False,
        axis_name: str = "sp",
    ) -> jnp.ndarray:
        """Render `nb_total` blocks with the block axis sharded over `mesh`.

        The reference is strictly serial (SURVEY.md §2e); this is the
        TPU-native scaling story: generators are pure functions of the
        global frame index so each device renders its block range
        independently; the only cross-device data is tiny — per-block
        maxima for Normalize's causal prefix (all_gather over ICI), the
        affine/max-decay/complex-cascade scan summaries of the IIR filters and
        effects (exclusive_total boundary composition), per-residue-class
        summaries for feedback delay lines, and small input halos for the
        delayed reads (prev_frames). Numeric state stays replicated.
        """
        from jax.sharding import PartitionSpec as P

        n_dev = mesh.shape[axis_name]
        if nb_total % n_dev != 0:
            raise ValueError(f"nb_total {nb_total} not divisible by {n_dev}")
        nb_local = nb_total // n_dev

        t0 = self.t
        bakes, new_carries = self._bake_all(
            fb, t0, nb_total, fused=self.use_pallas
        )

        # per-block tables shard their block rows; instance/segment columns
        # and scalars replicate
        _ROW_SHARDED = {
            "idx", "begins", "vel", "member", "env_ads0", "env_rel0",
            "p_t0", "g_t0",
        }

        def bake_spec(tbl):
            return {
                k: P(axis_name, None) if k in _ROW_SHARDED else P()
                for k in tbl
            }

        # traced effect params: {vkey: {name: f32}}, replicated
        fx_vec, fx_layout = self._pack_fx()
        fx_params: dict[str, dict] = {}
        for vkey, name, pos in fx_layout:
            fx_params.setdefault(vkey, {})[name] = np.float32(fx_vec[pos])

        ttab_len = int(
            time_table(
                self.sr,
                max(t0 + nb_total * self.bl,
                    getattr(self, "_ttab_min_frames", 0)),
            ).shape[0]
        )
        key = (self.spec, "sharded", nb_total, is_scan, n_dev, fx_layout,
               ttab_len)
        sharded_fn = _cache_get(key)
        if sharded_fn is None:
            state_spec = jax.tree.map(lambda _: P(), self.num_state)
            in_specs = (
                state_spec,
                (P(), P(), P()),
                {k: bake_spec(tbl) for k, tbl in bakes.items()},
                tuple(P(None, None) for _ in self.samples),
                tuple(P(None, None) for _ in self.padded_order),
                tuple((P(None), P(None, None)) for _ in self.wavetables),
                jax.tree.map(lambda _: P(), fx_params),
                P(),
                P(),
            )
            out_specs = (state_spec, P(axis_name, None, None))
            fn = jax.shard_map(
                partial(
                    self._program, nb=nb_local, is_scan=is_scan,
                    axis_name=axis_name, block_shaped_out=True,
                ),
                mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                check_vma=False,
            )
            sharded_fn = jax.jit(fn)
            _cache_put(key, sharded_fn)

        new_state, audio = sharded_fn(
            self.num_state,
            (self._gains, self._angles, self._wets),
            bakes,
            tuple(self.samples),
            tuple(self.samples_padded[p] for p in self.padded_order),
            tuple(self.wavetables),
            fx_params,
            jnp.int32(t0),
            time_table(
                self.sr,
                max(t0 + nb_total * self.bl,
                    getattr(self, "_ttab_min_frames", 0)),
            ),
        )
        self.num_state = new_state
        self._apply_carries(new_carries)
        self.t = t0 + nb_total * self.bl
        self.graph.t = self.t
        self._break_prebake_chain()  # sharded windows bake live
        return audio.reshape(nb_total * self.bl, 2)

    def _bake_all(
        self, fb: FlowwBank, t0: int, nb: int, fused: bool = False,
        carries: dict[int, Any] | None = None,
    ):
        """Host-side event baking for a window (shared by both paths).
        With fused=True (the single-device Pallas path), each SampleMulti
        group's per-vertex tables are additionally merged into one COMPACT
        voice table (only voices that actually intersect each block) — the
        kernel's work becomes proportional to live voices, not to
        vertices x padded slots. Table shapes pad to the sticky
        `bake_caps` (raised here on overflow) so layouts — and jit keys —
        stay constant across windows."""
        bakes: dict[str, dict[str, jnp.ndarray]] = {}
        new_carries: dict[int, Any] = {}
        steal = self.voice_cap is not None
        names = self.graph.names
        t1 = t0 + nb * self.bl
        for vi, carry in (carries or self.carries).items():
            st = self.statics[vi]
            key = str(vi)
            caps = self.bake_caps.get(key)
            if steal:
                caps = dict(caps or {})
                caps["p"] = min(
                    caps.get("p", self.voice_cap), self.voice_cap
                )
            if fused and vi in self._fused_members:
                continue  # baked per-GROUP below (pooled light path)
            if st.kind == G.SAMPLEMULTI:
                drum = fb.bake_drum(st.floww_index, nb).filter_note(st.note)
                tbl, nc = B.bake_sample_multi(
                    drum, carry, t0, nb, self.bl, st.sample_len, caps, steal
                )
            elif st.kind == G.SAMPLELERP:
                drum = fb.bake_drum(st.floww_index, nb).filter_note(st.note)
                tbl, nc = B.bake_sample_lerp(
                    drum, carry, t0, nb, self.bl, st.lerp_len, caps
                )
            elif st.kind == G.DEBUGSINE:
                simple = fb.bake_simple(st.floww_index, nb)
                tbl, nc = B.bake_debug_sine(
                    simple, carry, t0, nb, self.bl, caps, steal
                )
            elif st.kind in (G.SYNTH, G.SAMPSYN):
                simple = fb.bake_simple(st.floww_index, nb)
                tbl, nc = B.bake_notes(
                    simple, carry, t0, nb, self.bl, self.sr, st.release_sec,
                    caps, steal,
                )
            elif st.kind == G.ADSR:
                if st.use_off:
                    simple = fb.bake_simple(st.floww_index, nb)
                    tbl, nc = B.bake_adsr_off(
                        simple, carry, st.confs[0], self.sr, t0, nb, self.bl,
                        st.note, caps,
                    )
                else:
                    drum = fb.bake_drum(st.floww_index, nb).filter_note(st.note)
                    tbl, nc = B.bake_adsr_drum(
                        drum, carry, t0, nb, self.bl, self.sr, caps
                    )
            else:  # pragma: no cover
                continue
            bakes[key] = tbl  # numpy; upload happens packed (see _pack_bakes)
            new_carries[vi] = nc
            self._record_caps(
                key, (self.cap_scope, names[vi], st.kind), st.kind, tbl
            )
        if fused:
            for consumer, members in self.fused_groups.items():
                voices, group_carries = self._bake_fused_group(
                    fb, consumer, members, t0, t1, carries or self.carries
                )
                new_carries.update(group_carries)
                tbl = self._merge_group(voices, consumer, members, t0, nb)
                bakes[f"fused{consumer}"] = tbl
                self._record_caps(
                    f"fused{consumer}",
                    (self.cap_scope, names[consumer], "fused"), "fused", tbl,
                )
        return bakes, new_carries

    def _group_pool(self, fb: FlowwBank, consumer: int, members):
        """Frame-sorted pooled event arrays (frames, vels, member-id) for a
        fused group, cached per FlowwBank content version.

        Valid only when every member floww is time-sorted: then the drum
        cursor semantics reduce to "events with frame in the window"
        (banks/flowwbank.bake_drum's sorted fast path), so one pooled
        searchsorted replaces per-member replays — the per-member Python
        loop dominated 256-track host bake time. Per-member quirks bake
        into the pool: ON filtering, first-ON-per-frame dedupe (BEFORE the
        note filter — a same-frame other-note hit swallows the slot,
        reference floww.rs:99-121 + extensions.rs:353-356), then the
        consumer's note filter."""
        # key on (bank uid, version): version counters are per-bank, so a
        # DIFFERENT bank at the same version must not hit this cache
        cached = self._pool_cache.get(consumer)
        if cached is not None and cached[0] == (fb.uid, fb.version):
            return cached[1]
        fl, vl, ml = [], [], []
        for mi, m in enumerate(members):
            st = self.statics[m]
            i = st.floww_index
            if i >= len(fb.flowws):
                continue
            if not fb._frames_sorted(i):
                self._pool_cache[consumer] = ((fb.uid, fb.version), None)
                return None
            ev = fb.flowws[i]
            # per-member memo keyed on the events array IDENTITY: a live
            # feed replaces only the fed streams' arrays, so rebuilding
            # every member's masks per version bump made each feed O(all
            # members); now it is O(changed members) + one concat/argsort
            memo = self._member_pool_cache.get((consumer, mi))
            if memo is not None and memo[0] is ev:
                f, v = memo[1], memo[2]
            else:
                f = fb._event_frames(i)
                on = ev[:, 3] > 0.001
                f, n, v = f[on], ev[on, 2], ev[on, 3]
                keep = np.ones(len(f), bool)
                if len(f) > 1:
                    keep[1:] = f[1:] != f[:-1]
                f, n, v = f[keep], n[keep], v[keep]
                if st.note is not None:
                    nf = np.abs(n - np.float32(st.note)) < 0.01
                    f, v = f[nf], v[nf]
                v = v.astype(np.float32)
                self._member_pool_cache[(consumer, mi)] = (ev, f, v)
            fl.append(f)
            vl.append(v)
            ml.append(np.full(len(f), mi, np.int32))
        if fl:
            f = np.concatenate(fl)
            order = np.argsort(f, kind="stable")
            pool = (
                f[order],
                np.concatenate(vl)[order],
                np.concatenate(ml)[order],
            )
        else:
            pool = (
                np.zeros(0, np.int64), np.zeros(0, np.float32),
                np.zeros(0, np.int32),
            )
        self._pool_cache[consumer] = ((fb.uid, fb.version), pool)
        return pool

    def _bake_fused_group(
        self, fb: FlowwBank, consumer: int, members, t0: int, t1: int,
        carries,
    ):
        """Window voice arrays (starts, vels, member-id) + new carries for
        one fused group, in member-major order (each member: carry voices
        then window events chronologically — the same slot order as the
        per-vertex formulation). The fused kernel consumes only the MERGED
        table, so no per-vertex block_table/upload happens at all."""
        pool = self._group_pool(fb, consumer, members)
        if pool is not None:
            # drum windows anchor at the floww cursor (the engine keeps it
            # aligned with graph time t0)
            pf, pv, pm = pool
            lo = int(np.searchsorted(pf, fb.frame, "left"))
            hi = int(np.searchsorted(pf, fb.frame + (t1 - t0), "left"))
            wf, wv, wm = pf[lo:hi], pv[lo:hi], pm[lo:hi]
            order = np.argsort(wm, kind="stable")  # member-major
            wf, wv, wm = wf[order], wv[order], wm[order]
        else:  # unsorted floww(s): per-member replay fallback
            fl, vl, ml = [], [], []
            for mi, m in enumerate(members):
                st = self.statics[m]
                drum = fb.bake_drum(st.floww_index, nb_blocks := (
                    (t1 - t0) // self.bl
                )).filter_note(st.note)
                fl.append(drum.frames)
                vl.append(drum.vels.astype(np.float32))
                ml.append(np.full(len(drum.frames), mi, np.int32))
            wf = np.concatenate(fl) if fl else np.zeros(0, np.int64)
            wv = np.concatenate(vl) if vl else np.zeros(0, np.float32)
            wm = np.concatenate(ml) if ml else np.zeros(0, np.int32)
        # prepend each member's carry voices (list order) ahead of its
        # window events WITHOUT a per-member split/concat pass (that loop
        # plus 2x np.split was ~half the 1024-track window bake): stable
        # argsort by member id on [all carries | all window events] keeps
        # every member's carries (first segment) before its window events
        # and preserves intra-segment order — the per-member slot order
        # bit-exactly
        carry_f: list[np.ndarray] = []
        carry_v: list[np.ndarray] = []
        carry_m: list[np.ndarray] = []
        for mi, m in enumerate(members):
            cvs = carries[m].voices
            if cvs:
                carry_f.append(np.asarray([x[0] for x in cvs], np.int64))
                carry_v.append(np.asarray([x[1] for x in cvs], np.float32))
                carry_m.append(np.full(len(cvs), mi, np.int32))
        wf = wf.astype(np.int64, copy=False)
        wm = wm.astype(np.int32, copy=False)
        if carry_f:
            af = np.concatenate(carry_f + [wf])
            av = np.concatenate(carry_v + [wv])
            am = np.concatenate(carry_m + [wm])
            order = np.argsort(am, kind="stable")
            af, av, am = af[order], av[order], am[order]
        else:
            af, av, am = wf, wv, wm
        slen_vec, _ = self._fused_member_vecs(consumer, members)
        new_carries: dict[int, Any] = {m: B.MultiCarry() for m in members}
        alive = np.nonzero(af + slen_vec[am] > t1)[0]
        if len(alive):
            am_a, af_a, av_a = am[alive], af[alive], av[alive]
            uniq, first = np.unique(am_a, return_index=True)
            bounds = np.append(first, len(am_a))
            for j, u in enumerate(uniq):
                sl = slice(int(bounds[j]), int(bounds[j + 1]))
                new_carries[members[int(u)]] = B.MultiCarry([
                    (int(s), float(v))
                    for s, v in zip(af_a[sl], av_a[sl])
                ])
        return (af, av, am), new_carries

    def _fused_member_vecs(self, consumer: int, members):
        """Per-member sample_len / concat-buffer base offsets as vectors,
        built once per group (statics are immutable per CompiledGraph;
        rebuilding these per window was an O(members) Python pass)."""
        v = self._fused_vecs.get(consumer)
        if v is None:
            _, bases = self._fused_layout[consumer]
            v = (
                np.asarray(
                    [self.statics[m].sample_len for m in members], np.int64
                ),
                np.asarray(
                    [bases[self.statics[m].sample_pos] for m in members],
                    np.int64,
                ),
            )
            self._fused_vecs[consumer] = v
        return v

    def _merge_group(self, voices, consumer: int, members, t0: int, nb: int):
        """Compact merged voice table for one fused group (host numpy).

        Consumes the merged member-major (starts, vels, member-id) voice
        arrays from _bake_fused_group and emits (begins [nb,Pf] in
        concat-buffer coords, vel [nb,Pf], member [nb,Pf] index into
        `members`), keeping only voices whose sample span intersects the
        block; Pf is the cap-pinned max live count. Exact: dropped slots
        read zeros / have vel 0. Activity is computed as per-voice
        segmented block ranges, O(active pairs) (the per-member loop and
        later the dense [nb, V] mask each dominated the 256/1024-track
        host bake in turn). Slot order per block = member order, then
        trigger order within a member — matching the per-member
        formulation bit-exactly."""
        bl = self.bl
        caps = self.bake_caps.get(f"fused{consumer}") or {}
        starts, vels, mid = voices
        V = len(starts)
        if V == 0:
            w = max(caps.get("pf", 1), 1)
            return {
                "begins": np.zeros((nb, w), np.int32),
                "vel": np.zeros((nb, w), np.float32),
                "member": np.zeros((nb, w), np.int32),
            }
        slen_vec, base_vec = self._fused_member_vecs(consumer, members)
        slen = slen_vec[mid]
        base = base_vec[mid]
        block_starts = t0 + np.arange(nb, dtype=np.int64) * bl
        # active blocks per voice as segmented ranges (the dense [nb, V]
        # mask + nonzero cost ~50 ms/window at 1024 tracks; this is
        # O(active pairs)). Voice p is live in block k iff
        # starts[p] < b0 + bl and b0 < starts[p] + slen[p], b0 = t0+k*bl.
        starts = starts.astype(np.int64, copy=False)
        k0 = np.maximum(0, -(-(starts - bl + 1 - t0) // bl))
        k1 = np.minimum(nb - 1, (starts + slen - 1 - t0) // bl)
        cnt = np.clip(k1 - k0 + 1, 0, None)
        total = int(cnt.sum())
        if total:
            pp = np.repeat(np.arange(V), cnt)
            seg0 = np.cumsum(cnt) - cnt
            kk = k0[pp] + (np.arange(total, dtype=np.int64)
                           - np.repeat(seg0, cnt))
            # row-major (block-major) order with voice order preserved
            # within a block — exactly what np.nonzero on the dense mask
            # produced (stable sort keeps pp ascending per block)
            order = np.argsort(kk, kind="stable")
            kk, pp = kk[order], pp[order]
        else:
            kk = pp = np.zeros(0, np.int64)
        if not len(kk):
            w = max(caps.get("pf", 1), 1)
            return {
                "begins": np.zeros((nb, w), np.int32),
                "vel": np.zeros((nb, w), np.float32),
                "member": np.zeros((nb, w), np.int32),
            }
        if self.voice_cap is not None:
            # TERMDAW_VOICE_CAP applies PER MEMBER VERTEX, same policy as
            # block_table's oldest-voice steal: within each (block,
            # member) keep only the NEWEST voice_cap voices. (kk, pp) is
            # row-major with pp in member-major trigger order, so the
            # (block, member) key is sorted and newest = highest pos.
            gm = mid[pp].astype(np.int64)
            gkey = kk.astype(np.int64) * len(members) + gm
            first = np.searchsorted(gkey, gkey, "left")
            last = np.searchsorted(gkey, gkey, "right")
            pos_in = np.arange(len(kk)) - first
            keep = pos_in >= (last - first) - self.voice_cap
            kk, pp = kk[keep], pp[keep]
            if not len(kk):
                w = max(caps.get("pf", 1), 1)
                return {
                    "begins": np.zeros((nb, w), np.int32),
                    "vel": np.zeros((nb, w), np.float32),
                    "member": np.zeros((nb, w), np.int32),
                }
        b = np.clip(
            block_starts[kk] - starts[pp] + bl, 0, slen[pp] + bl
        ) + base[pp]
        counts = np.bincount(kk, minlength=nb)
        pf = B._capped(int(counts.max()), caps.get("pf"))
        pos = np.arange(len(kk)) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        begins = np.zeros((nb, pf), np.int32)
        vel = np.zeros((nb, pf), np.float32)
        member = np.zeros((nb, pf), np.int32)
        begins[kk, pos] = b
        vel[kk, pos] = vels[pp]
        member[kk, pos] = mid[pp]
        return {"begins": begins, "vel": vel, "member": member}

    # -- program construction -------------------------------------------------
    def _get_fn(self, nb: int, is_scan: bool, layout: tuple, fx_layout: tuple):
        key = (self.spec, nb, is_scan, layout, fx_layout)
        fn = _cache_get(key)
        if fn is None:

            def packed(num_state, params, ints_buf, floats_buf, fx_vec,
                       samples, samples_padded, wts, t0, ttab):
                bakes = _unpack_bakes(ints_buf, floats_buf, layout)
                fx_params: dict[str, dict] = {}
                for vkey, name, pos in fx_layout:
                    fx_params.setdefault(vkey, {})[name] = fx_vec[pos]
                return self._program(
                    num_state, params, bakes, samples, samples_padded, wts,
                    fx_params, t0, nb=nb, is_scan=is_scan, ttab=ttab,
                )

            from ..utils.aotcache import AotProgram

            fn = AotProgram(jax.jit(packed), repr(key))
            _cache_put(key, fn)
        return fn

    def _fused_mix(
        self, consumer: int, members, bakes, params, nb: int,
        samples_padded,
    ) -> jnp.ndarray:
        """One stereo voice-mix kernel call for a whole SampleMulti group.

        The bake stage already merged the members' voices into one compact
        per-block table (see _merge_group) — kernel work scales with live
        voices, not vertices. Per-vertex pan/gain (traced) folds into
        per-voice channel amps here; vertices over different samples read
        one concatenated padded buffer via per-segment base offsets."""
        from ..ops.pallas_voices import sample_multi_pallas_stereo

        gains, angles, _ = params
        poses, _bases = self._fused_layout[consumer]
        if len(poses) == 1:
            buf = samples_padded[self.padded_order.index(poses[0])]
        else:
            # prebuilt at graph build (see padded_order setup) — the
            # concat must NOT happen inside the traced program, where it
            # would re-materialize every window
            buf = samples_padded[self.padded_order.index(("fused", consumer))]
        tbl = bakes[f"fused{consumer}"]
        amps = jnp.stack(
            [mix.post_amps(angles[m], gains[m]) for m in members]
        )  # [V, 2]
        member = tbl["member"]
        return sample_multi_pallas_stereo(
            buf,
            tbl["begins"],
            tbl["vel"] * amps[member, 0],
            tbl["vel"] * amps[member, 1],
            nb, self.bl, interpret=self.pallas_interpret,
        )

    def _program(
        self, num_state, params, bakes, samples, samples_padded, wts,
        fx_params, t0, ttab=None,
        *, nb: int, is_scan: bool, axis_name: str | None = None,
        block_shaped_out: bool = False,
    ):
        gains, angles, wets = params
        bl, sr = self.bl, self.sr
        if ttab is None:  # compile-check path; renders always pass it
            ttab = time_table(sr, int(nb * bl * 2))
        T = nb * bl
        if axis_name is None:
            frames = t0 + jnp.arange(T, dtype=jnp.int32)
        else:
            dev = jax.lax.axis_index(axis_name).astype(jnp.int32)
            frames = t0 + dev * T + jnp.arange(T, dtype=jnp.int32)
        time2d = jax.lax.dynamic_slice(ttab, (frames[0],), (T,)).reshape(
            nb, bl
        )
        ib = jax.lax.slice(ttab, (0,), (bl,))  # f32(i)/f32(sr), i in block
        bufs: dict[int, jnp.ndarray] = {}
        ns = dict(num_state)
        # the fused SampleMulti kernel and the per-vertex Pallas path both
        # run under timeline sharding: their bake tables shard by block
        # rows, so each device mixes its own block range (VERDICT r2
        # item 1 — multi-chip must not lose the single biggest fast path)
        fused_on = self.use_pallas

        for vi in self.order:
            st = self.statics[vi]
            kind = st.kind
            if fused_on and vi in self._fused_members:
                continue  # mixed directly at the consumer (fused kernel)
            ins = []
            for j in self.in_edges[vi]:
                if fused_on and j in self._fused_members:
                    members = self.fused_groups[vi]
                    if j == members[0]:
                        ins.append(self._fused_mix(
                            vi, members, bakes, params, nb, samples_padded,
                        ))
                    continue
                ins.append(bufs[j])
            if G.HAS_INPUT[kind]:
                x = mix.sum_inputs(ins) if ins else jnp.zeros((T, 2), jnp.float32)
            else:
                x = None
            key = str(vi)

            if kind == G.SUM:
                out = x
            elif kind == G.NORMALIZE:
                xr = x.reshape(nb, bl, 2)
                if is_scan:
                    outr, scan_max = mix.normalize_scan(
                        xr, ns[f"{vi}.max"], ns[f"{vi}.scan_max"],
                        axis_name=axis_name,
                    )
                    ns[f"{vi}.scan_max"] = scan_max
                else:
                    outr, mx = mix.normalize_live(
                        xr, ns[f"{vi}.max"], axis_name=axis_name
                    )
                    ns[f"{vi}.max"] = mx
                out = outr.reshape(T, 2)
            elif kind == G.SAMPLELOOP:
                out = sampler.sample_loop(samples[st.sample_pos], frames)
            elif kind == G.SAMPLEMULTI:
                if self.use_pallas:
                    from ..ops.pallas_voices import (
                        compute_begin_vel, sample_multi_pallas,
                    )

                    begins, vvels = compute_begin_vel(
                        bakes[key], frames[0], nb, bl, st.sample_len
                    )
                    padded = samples_padded[
                        self.padded_order.index(st.sample_pos)
                    ]
                    out = sample_multi_pallas(
                        padded, begins, vvels, nb, bl,
                        interpret=self.pallas_interpret,
                    )
                else:
                    out = sampler.sample_multi(
                        samples[st.sample_pos], bakes[key], frames, nb, bl
                    )
            elif kind == G.SAMPLELERP:
                out = sampler.sample_lerp(
                    samples[st.sample_pos], bakes[key], frames, st.lerp_len
                )
            elif kind == G.DEBUGSINE:
                out = synthv.debug_sine(
                    bakes[key], frames, nb, bl, sr, time2d=time2d
                )
            elif kind == G.SYNTH:
                (sqv, sqz), (tfv, tfz), (trv, _) = st.osc_static
                sqc, tfc, trc = st.confs
                out = synthv.synth(
                    bakes[key], frames, nb, bl, sr,
                    sqv, sqz, sqc, tfv, tfz, tfc, trv, trc,
                    time2d=time2d, ib=ib,
                )
            elif kind == G.SAMPSYN:
                times, waves = wts[st.wt_pos]
                out = synthv.sampsyn(
                    bakes[key], frames, nb, bl, sr, st.confs[0], times, waves,
                    time2d=time2d, ib=ib,
                )
            elif kind == G.ADSR:
                out = envelope.adsr_apply(
                    x, bakes[key], frames, sr, st.confs[0],
                    st.use_off, st.use_max, wets[vi], ib=ib,
                )
            elif kind == G.BANDPASS:
                out, bp = filters.band_pass_timeline(
                    x, ns[f"{vi}.bp"], st.lgamma, st.hgamma,
                    st.pass_mode, wets[vi], axis_name=axis_name,
                )
                ns[f"{vi}.bp"] = bp
            elif kind == G.PLUGINFX:
                wet = wets[vi]
                from ..ops.fx import EFFECTS

                y, fx_state = EFFECTS[st.fx_kind].process(
                    x, ns[f"{vi}.fx"], fx_params[key], sr, dict(st.fx_static),
                    axis_name=axis_name,
                )
                skip = wet < 0.0001
                out = jnp.where(skip, x, x + wet * (y - x))
                ns[f"{vi}.fx"] = jax.tree.map(
                    lambda old, new: jnp.where(skip, old, new),
                    ns[f"{vi}.fx"], fx_state,
                )
            else:  # pragma: no cover
                raise ValueError(f"unknown vertex kind {kind}")

            out = mix.post(out, angles[vi], gains[vi])
            bufs[vi] = out

        result = bufs[self.output]
        if block_shaped_out:
            result = result.reshape(nb, bl, 2)
        return ns, result
