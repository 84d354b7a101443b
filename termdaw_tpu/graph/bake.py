"""Event baking: floww events + carried voice state -> dense device tables.

The reference's event-driven vertices mutate per-frame Rust state (voice
queues, note lists, envelope clocks — extensions.rs:21-69). Those semantics
are path-independent given the event schedule, so the host *replays* them
here (cheap: proportional to event count) and emits shape-static numpy
tables the compiled XLA program consumes:

* polyphonic vertices (SampleMulti, DebugSine, Synth, SampSyn) become
  per-block instance tables [nb, P] (P = padded max concurrent voices);
* monophonic-pair vertices (SampleLerp, Adsr) become per-event segment
  tables indexed per frame by `searchsorted`.

Each bake takes the vertex's carried state (voices alive at the window
start) and returns the new carry at the window end, so windowed playback
chains exactly like the reference's continuous per-block run. Replay rules
cite the reference loops they model.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..banks.flowwbank import DrumBake, SimpleBake
from ..ops.adsr import AdsrConf, np_apply_ads

SENTINEL = -(2**30)
INF_FRAME = 2**31 - 1  # fits int32 (JAX x64 is off); frames stay far below


def _pad_pow2(n: int, lo: int = 1) -> int:
    p = lo
    while p < n:
        p *= 2
    return p


def _capped(natural: int, cap: int | None) -> int:
    """Padded size under a sticky cap: exactly `cap` when the natural
    pow2-padded size fits (stable jit layouts across windows), the natural
    pow2 size otherwise (growth; the caller records the new cap)."""
    n = _pad_pow2(max(natural, 1))
    return n if cap is None else max(n, cap)


def block_table(
    starts: np.ndarray, ends: np.ndarray, t0: int, nb: int, bl: int,
    p_cap: int | None = None, steal: bool = False,
) -> np.ndarray:
    """Map instances with [start, end) frame spans to a per-block index
    table [nb, P] (int32, -1 = empty). P is padded to a power of two so jit
    cache keys stay stable across bakes.

    With `p_cap` (a power of two), P is pinned to exactly `p_cap` whenever
    the window's natural concurrency fits — windows with different event
    densities then produce IDENTICAL table shapes, so the jitted window
    program never re-specializes on event data (VERDICT r2 item 2). On
    overflow: `steal=True` drops the OLDEST voices per block (the
    documented overflow policy, SURVEY §7); otherwise P grows to the next
    power of two (the caller records the new high-water cap).

    Fully vectorized (long-release synth notes can span hundreds of blocks
    each; a per-block Python loop dominated render time)."""
    n = len(starts)
    if n == 0:
        return np.full((nb, max(p_cap or 1, 1)), -1, np.int32)
    starts = np.asarray(starts, np.int64)
    ends = np.asarray(ends, np.int64)
    t1 = t0 + nb * bl
    k0 = np.maximum(0, (starts - t0) // bl)
    k1 = np.minimum(nb, -(-(np.minimum(ends, t1) - t0) // bl))
    live = (ends > t0) & (starts < t1) & (k1 > k0)
    ids = np.nonzero(live)[0]
    if len(ids) == 0:
        return np.full((nb, max(p_cap or 1, 1)), -1, np.int32)
    k0 = k0[ids].astype(np.int64)
    k1 = k1[ids].astype(np.int64)
    spans = (k1 - k0).astype(np.int64)
    total = int(spans.sum())
    # flat (block, instance) pairs: repeat instance ids over their spans and
    # build the per-pair block index with a segmented arange
    inst_flat = np.repeat(ids, spans)
    seg_off = np.repeat(np.cumsum(spans) - spans, spans)
    block_flat = np.repeat(k0, spans) + (np.arange(total) - seg_off)
    # slot within block: stable order by block
    order = np.argsort(block_flat, kind="stable")
    block_sorted = block_flat[order]
    inst_sorted = inst_flat[order]
    first_of_block = np.searchsorted(block_sorted, block_sorted)
    slot = np.arange(total) - first_of_block
    pmax = int(slot.max()) + 1 if total else 0
    if p_cap is not None and pmax > p_cap and steal:
        # oldest-voice steal: keep each block's LAST p_cap instances
        # (instances are in trigger order: carry voices first, then new
        # events chronologically), drop the rest
        counts = np.bincount(block_sorted, minlength=nb)
        slot = slot - (counts[block_sorted] - p_cap).clip(min=0)
        keep = slot >= 0
        block_sorted, slot, inst_sorted = (
            block_sorted[keep], slot[keep], inst_sorted[keep]
        )
        pmax = p_cap
    if p_cap is not None and pmax <= p_cap:
        p = p_cap
    else:
        p = _pad_pow2(max(pmax, 1))
    idx = np.full((nb, p), -1, np.int32)
    idx[block_sorted, slot] = inst_sorted.astype(np.int32)
    return idx


def _note_hz(notes) -> np.ndarray:
    """MIDI note -> Hz, computed in float64 and rounded to f32 — matches
    the reference's libm-accurate f32 powf (extensions.rs:451) where the
    TPU's exp2 approximation would detune by ~3e-6 relative."""
    n = np.asarray(notes, np.float64)
    return (440.0 * np.exp2((n - 69.0) / 12.0)).astype(np.float32)


def _pad_cols(cols: dict[str, np.ndarray], pad_to: int) -> dict[str, np.ndarray]:
    out = {}
    for k, v in cols.items():
        n = len(v)
        padded = np.zeros(pad_to, v.dtype)
        padded[:n] = v
        out[k] = padded
    return out


# ---------------------------------------------------------------------------
# SampleMulti (reference extensions.rs:343-381)
# ---------------------------------------------------------------------------

@dataclass
class MultiCarry:
    """Voices alive at window start: (start_frame_abs, vel), trigger order."""

    voices: list[tuple[int, float]] = field(default_factory=list)


def bake_sample_multi(
    drum: DrumBake, carry: MultiCarry, t0: int, nb: int, bl: int,
    sample_len: int, caps: dict | None = None, steal: bool = False,
) -> tuple[dict[str, np.ndarray], MultiCarry]:
    caps = caps or {}
    starts = [v[0] for v in carry.voices] + drum.frames.tolist()
    vels = [v[1] for v in carry.voices] + drum.vels.tolist()
    starts_a = np.asarray(starts, np.int64)
    ends_a = starts_a + sample_len
    idx = block_table(starts_a, ends_a, t0, nb, bl, caps.get("p"), steal)
    n_pad = _capped(len(starts), caps.get("n"))
    cols = _pad_cols(
        {
            "starts": starts_a.astype(np.int32),
            "vels": np.asarray(vels, np.float32),
        },
        n_pad,
    )
    t1 = t0 + nb * bl
    new_carry = MultiCarry(
        [(int(s), float(v)) for s, v in zip(starts, vels) if s + sample_len > t1]
    )
    return {"idx": idx, **cols}, new_carry


# ---------------------------------------------------------------------------
# SampleLerp (reference extensions.rs:383-421)
# ---------------------------------------------------------------------------

@dataclass
class LerpCarry:
    """Monophonic primary/ghost voice + crossfade countdown at window start.

    Initial values mirror the reference's construction (extensions.rs:117-120):
    primary = ghost = (start 0 absolute, vel 0), countdown 0."""

    primary_start: int = 0
    primary_vel: float = 0.0
    ghost_start: int = 0
    ghost_vel: float = 0.0
    countdown: int = 0


def bake_sample_lerp(
    drum: DrumBake, carry: LerpCarry, t0: int, nb: int, bl: int,
    lerp_len: int, caps: dict | None = None,
) -> tuple[dict[str, np.ndarray], LerpCarry]:
    caps = caps or {}
    ef = drum.frames.tolist()
    ev = drum.vels.tolist()
    # segment j covers [p_starts... searchsorted boundary = trigger frames
    bounds = np.asarray(ef, np.int64)  # [E]
    p_starts = np.asarray([carry.primary_start] + ef, np.int64)
    p_vels = np.asarray([carry.primary_vel] + ev, np.float32)
    g_starts = np.concatenate(
        [np.asarray([carry.ghost_start], np.int64), p_starts[:-1]]
    )
    g_vels = np.concatenate(
        [np.asarray([carry.ghost_vel], np.float32), p_vels[:-1]]
    )
    # countdown anchors: segment 0 decrements from carry.countdown at t0;
    # each trigger resets countdown to lerp_len at its frame
    cd_anchor = np.asarray([t0] + ef, np.int64)
    cd_init = np.asarray([carry.countdown] + [lerp_len] * len(ef), np.int32)

    e_pad = _capped(len(ef) + 1, caps.get("e"))
    cols = _pad_cols(
        {
            "p_starts": p_starts.astype(np.int32),
            "p_vels": p_vels,
            "g_starts": g_starts.astype(np.int32),
            "g_vels": g_vels,
            "cd_anchor": cd_anchor.astype(np.int32),
            "cd_init": cd_init,
        },
        e_pad,
    )
    bounds_pad = np.full(_capped(len(bounds), caps.get("b")), INF_FRAME,
                         np.int64)
    bounds_pad[: len(bounds)] = bounds
    t1 = t0 + nb * bl
    if ef:
        last, prev = len(ef), len(ef) - 1
        new_carry = LerpCarry(
            primary_start=int(p_starts[last]), primary_vel=float(p_vels[last]),
            ghost_start=int(p_starts[prev]), ghost_vel=float(p_vels[prev]),
            countdown=max(0, lerp_len - (t1 - ef[-1])),
        )
    else:
        new_carry = LerpCarry(
            carry.primary_start, carry.primary_vel,
            carry.ghost_start, carry.ghost_vel,
            max(0, carry.countdown - nb * bl),
        )
    return {
        "bounds": bounds_pad.astype(np.int32),
        "n_bounds": np.int32(len(bounds)),
        **cols,
    }, new_carry


# ---------------------------------------------------------------------------
# DebugSine (reference extensions.rs:423-457)
# ---------------------------------------------------------------------------

@dataclass
class SineCarry:
    """Open notes at window start: (note, vel, span_start_abs)."""

    notes: list[tuple[float, float, int]] = field(default_factory=list)


def bake_debug_sine(
    simple: SimpleBake, carry: SineCarry, t0: int, nb: int, bl: int,
    caps: dict | None = None, steal: bool = False,
) -> tuple[dict[str, np.ndarray], SineCarry]:
    caps = caps or {}
    # replay: ON updates the velocity of a matching note (|dn| < 0.001) or
    # appends; OFF removes all matching notes (extensions.rs:428-444).
    # A velocity update closes the span and opens a new one (the sine phase
    # is global-time so this is exact).
    spans: list[tuple[float, float, int, int]] = []  # (note, vel, s, e)
    open_notes: list[tuple[float, float, int]] = list(carry.notes)
    for f, on, note, vel in zip(simple.frames, simple.ons, simple.notes,
                                simple.vels):
        f = int(f)
        if on:
            matched = False
            for j, (n, v, s) in enumerate(open_notes):
                if abs(n - note) < 0.001:
                    spans.append((n, v, s, f))
                    open_notes[j] = (n, float(vel), f)
                    matched = True
                    break
            if not matched:
                open_notes.append((float(note), float(vel), f))
        else:
            kept = []
            for n, v, s in open_notes:
                if abs(n - note) > 0.001:
                    kept.append((n, v, s))
                else:
                    spans.append((n, v, s, f))
            open_notes = kept
    t1 = t0 + nb * bl
    for n, v, s in open_notes:
        spans.append((n, v, s, INF_FRAME))

    starts = np.asarray([s for *_xx, s, _e in spans], np.int64) \
        if spans else np.zeros(0, np.int64)
    ends = np.asarray([e for *_xx, e in spans], np.int64) \
        if spans else np.zeros(0, np.int64)
    idx = block_table(starts, np.minimum(ends, INF_FRAME), t0, nb, bl,
                      caps.get("p"), steal)
    n_pad = _capped(len(spans), caps.get("n"))
    cols = _pad_cols(
        {
            "notes": np.asarray([sp[0] for sp in spans], np.float32),
            # hz precomputed host-side in f64 then rounded: the reference
            # computes it with libm powf (sub-ulp); this TPU's exp2 is only
            # ~3e-6-relative, which audibly detunes phase over seconds
            "hz": _note_hz([sp[0] for sp in spans]),
            "vels": np.asarray([sp[1] for sp in spans], np.float32),
            "starts": starts.astype(np.int32),
            "ends": np.minimum(ends, INF_FRAME).astype(np.int32),
        },
        n_pad,
    )
    return {"idx": idx, **cols}, SineCarry(open_notes)


# ---------------------------------------------------------------------------
# Synth / SampSyn note lifecycle (reference extensions.rs:459-578)
# ---------------------------------------------------------------------------
#
# The reference's per-note envelope clock is an ACCUMULATED f32 value:
# env_t starts at -(i/sr) when the note triggers mid-block and gains
# f32(len/sr) at every block end (extensions.rs:483, 489-491, 526-528);
# per frame the evaluators see f32(env_t + i/sr). That fold drifts from the
# exact (frame - on)/sr clock (~0.4 ms after 2000 blocks at 48k/1024), so
# segment-edge decisions -- and parity vs the reference -- require
# replaying the exact f32 fold, not an analytic clock. The host replays it
# with np.cumsum(dtype=float32) (verified elementwise-identical to the
# sequential fold, tests/test_bake_caps.py) and bakes per-(block, instance)
# clock tables the kernel offsets by f32(i/sr).


def f32_div(i, sr) -> np.float32:
    """i as f32 / sr as f32 (the reference's in-block time quantum)."""
    return np.float32(np.float32(i) / np.float32(sr))


def clock_fold(start_val, n: int, delta) -> np.ndarray:
    """T[0] = start_val, T[j] = f32(T[j-1] + delta) -- the reference's
    per-block clock accumulation (extensions.rs:526-527)."""
    if n <= 0:
        return np.zeros(0, np.float32)
    a = np.empty(n, np.float32)
    a[0] = np.float32(start_val)
    a[1:] = np.float32(delta)
    return np.cumsum(a, dtype=np.float32)


def batched_clock_fold(k0: np.ndarray, v0: np.ndarray, k_hi: np.ndarray,
                       nb: int, delta) -> np.ndarray:
    """Row r of the result holds clock_fold(v0[r], k_hi[r]-k0[r]+1, delta)
    on columns [k0[r], k_hi[r]], zeros elsewhere — every row in ONE 2-D
    f32 cumsum. np.add.accumulate along an axis is sequential per lane
    (pinned by tests/test_bake_caps.py::TestClockFold), and the leading
    zeros are exact (f32(0+0)=0, f32(0+v0)=v0), so each row is
    elementwise-identical to its per-note clock_fold. Replaces the
    per-note numpy-call loop that dominated synth-family bake time."""
    rows = len(k0)
    cols = np.arange(nb)
    m = np.zeros((rows, nb), np.float32)
    inseg = (cols[None, :] > k0[:, None]) & (cols[None, :] <= k_hi[:, None])
    m[inseg] = np.float32(delta)
    m[np.arange(rows), k0] = v0
    c = np.cumsum(m, axis=1, dtype=np.float32)
    keep = (cols[None, :] >= k0[:, None]) & (cols[None, :] <= k_hi[:, None])
    c[~keep] = 0.0
    return c


@dataclass
class NoteInst:
    note: float
    vel: float
    on_f: int
    off_f: int | None = None   # None = held
    dead_f: int = INF_FRAME    # frame after which it no longer contributes
    env_t: float = 0.0         # accumulated f32 clock at last window start
    rel_t: float = 0.0         # f32 release-time capture (0 = held)


@dataclass
class NotesCarry:
    notes: list[NoteInst] = field(default_factory=list)


def _rel_dead_block(rel_anchor, ko: int, release_sec: float, delta) -> int:
    """First block index the released note does NOT contribute to: the
    reference removes it at the end of the first block where the
    accumulated release clock exceeds release_sec (extensions.rs:528)."""
    rs = np.float32(release_sec)
    n = int(np.ceil(float(release_sec) / float(delta))) + 3 if delta > 0 \
        else 4
    while True:
        t = clock_fold(rel_anchor, n + 1, delta)
        over = np.nonzero(t[1:] > rs)[0]
        if over.size:
            return ko + int(over[0]) + 1
        n *= 2  # pathological float edge; grow the horizon


def bake_notes(
    simple: SimpleBake, carry: NotesCarry, t0: int, nb: int, bl: int,
    sr: int, release_sec: float, caps: dict | None = None,
    steal: bool = False,
) -> tuple[dict[str, np.ndarray], NotesCarry]:
    caps = caps or {}
    delta = f32_div(bl, sr)
    notes: list[NoteInst] = [
        NoteInst(n.note, n.vel, n.on_f, n.off_f, n.dead_f, n.env_t, n.rel_t)
        for n in carry.notes
    ]
    # per-note current-phase fold anchors within THIS window:
    # (ads_k, ads_val) while held, (rel_k, rel_val) once released.
    # Carried notes anchor at block 0 with the carried clock value.
    # off_f is set iff a release was CAPTURED as rel_t != 0.0: the
    # reference's held sentinel is rel_t == 0.0 (extensions.rs:504), so
    # a zero-length note (ON and OFF in one frame) captures exactly 0.0
    # and stays in ADS phase — see the release branch below.
    ads_anchor: list[tuple[int, float] | None] = [
        (0, n.env_t) if n.off_f is None else None for n in notes
    ]
    rel_anchor: list[tuple[int, float] | None] = [
        (0, n.env_t) if n.off_f is not None else None for n in notes
    ]
    for f, on, note, vel in zip(simple.frames, simple.ons, simple.notes,
                                simple.vels):
        f = int(f)
        kb = (f - t0) // bl
        i_in = f - (t0 + kb * bl)
        if on:
            # always pushes, even with the pitch already active
            # (extensions.rs:482-483)
            anchor = -f32_div(i_in, sr)
            notes.append(NoteInst(float(note), float(vel), f,
                                  env_t=float(anchor)))
            ads_anchor.append((kb, float(anchor)))
            rel_anchor.append(None)
        else:
            # retain drops already-released same-pitch notes NOW
            # (extensions.rs:485): they stop contributing from this frame.
            # Instances keep their table rows; dead_f <= f marks them out.
            for inst in notes:
                if inst.dead_f <= f:
                    continue
                if abs(inst.note - note) <= 0.001 and inst.off_f is not None:
                    inst.dead_f = f
            # release the held same-pitch notes (extensions.rs:486-494):
            # rel_t = f32(env_t + i/sr); the clock resets to -(i/sr)
            pending: list[tuple[NoteInst, tuple[int, float]]] = []
            for j, inst in enumerate(notes):
                if inst.dead_f <= f:
                    continue
                if abs(inst.note - note) <= 0.001 and inst.off_f is None:
                    ak, av = ads_anchor[j]
                    t_ads = clock_fold(av, kb - ak + 1, delta)[kb - ak]
                    rel = float(np.float32(t_ads + f32_div(i_in, sr)))
                    if rel == 0.0:
                        # reference quirk (extensions.rs:485-494, 504):
                        # rel_t == 0.0 IS the held sentinel, so a capture
                        # of exactly 0.0 (a zero-length note: ON and OFF
                        # in the same frame) leaves the note in ADS phase
                        # forever, with its env clock restarted at
                        # -(i/sr). A single table row cannot hold two ADS
                        # clocks within one block, so represent the
                        # restart as: old instance stops at f, fresh ADS
                        # instance starts at f — output-identical.
                        inst.dead_f = f
                        anchor = float(-f32_div(i_in, sr))
                        pending.append((
                            NoteInst(inst.note, inst.vel, f, env_t=anchor),
                            (kb, anchor),
                        ))
                        continue
                    inst.off_f = f
                    inst.rel_t = rel
                    rv = -f32_div(i_in, sr)
                    rel_anchor[j] = (kb, float(rv))
                    kd = _rel_dead_block(rv, kb, release_sec, delta)
                    inst.dead_f = t0 + kd * bl
            for ni, anch in pending:
                notes.append(ni)
                ads_anchor.append(anch)
                rel_anchor.append(None)
    # per-(block, instance) clock tables: the kernel adds f32(i/sr) per
    # in-block frame (reference extensions.rs:501-506). All notes'
    # folds run in ONE batched 2-D cumsum per table (the per-note
    # clock_fold loop was the dominant synth-family bake cost).
    n = len(notes)
    env_ads0 = np.zeros((nb, max(n, 1)), np.float32)
    env_rel0 = np.zeros((nb, max(n, 1)), np.float32)
    ads_rows = []
    for j in range(n):
        if ads_anchor[j] is None:
            continue
        ak, av = ads_anchor[j]
        k_hi = nb - 1 if rel_anchor[j] is None else min(
            rel_anchor[j][0], nb - 1
        )
        if k_hi >= ak:
            ads_rows.append((j, ak, av, k_hi))
    if ads_rows:
        js = np.asarray([r[0] for r in ads_rows])
        folded = batched_clock_fold(
            np.asarray([r[1] for r in ads_rows]),
            np.asarray([r[2] for r in ads_rows], np.float32),
            np.asarray([r[3] for r in ads_rows]),
            nb, delta,
        )
        env_ads0[:, js] = folded.T
    rel_rows = [
        (j, rel_anchor[j][0], rel_anchor[j][1])
        for j in range(n)
        if rel_anchor[j] is not None and rel_anchor[j][0] <= nb - 1
    ]
    if rel_rows:
        js = np.asarray([r[0] for r in rel_rows])
        folded = batched_clock_fold(
            np.asarray([r[1] for r in rel_rows]),
            np.asarray([r[2] for r in rel_rows], np.float32),
            np.full(len(rel_rows), nb - 1),
            nb, delta,
        )
        env_rel0[:, js] = folded.T
    # dead instances keep their tables rows; spans trim them per block
    starts = np.asarray([x.on_f for x in notes], np.int64) \
        if notes else np.zeros(0, np.int64)
    ends = np.asarray([x.dead_f for x in notes], np.int64) \
        if notes else np.zeros(0, np.int64)
    idx = block_table(starts, ends, t0, nb, bl, caps.get("p"), steal)
    n_pad = _capped(len(notes), caps.get("n"))
    cols = _pad_cols(
        {
            "notes": np.asarray([x.note for x in notes], np.float32),
            "hz": _note_hz([x.note for x in notes]),  # see bake_debug_sine
            # hz/sr as a TRUE f32 division (numpy is correctly rounded;
            # the TPU's reciprocal-based divide is 1 ulp off) — feeds
            # SampSyn's fixed-point phase increment
            "cyc": (
                _note_hz([x.note for x in notes]) / np.float32(sr)
            ).astype(np.float32),
            "vels": np.asarray([x.vel for x in notes], np.float32),
            "on_f": np.asarray([x.on_f for x in notes], np.int32),
            "off_f": np.asarray(
                [x.off_f if x.off_f is not None else SENTINEL for x in notes],
                np.int32,
            ),
            "dead_f": np.asarray(
                [min(x.dead_f, INF_FRAME) for x in notes], np.int32
            ),
            "rel_t": np.asarray([x.rel_t for x in notes], np.float32),
        },
        n_pad,
    )
    pad = np.zeros((nb, n_pad - max(n, 1)), np.float32)
    env_ads0 = np.concatenate([env_ads0, pad], axis=1)
    env_rel0 = np.concatenate([env_rel0, pad], axis=1)
    t1 = t0 + nb * bl
    # carry: each kept note's clock at the NEXT window start = its current
    # phase fold continued one step past the last block of this window
    kept: list[NoteInst] = []
    for j, inst in enumerate(notes):
        if inst.dead_f <= t1:
            continue
        ck, cv = rel_anchor[j] if rel_anchor[j] is not None \
            else ads_anchor[j]
        env_next = float(clock_fold(cv, nb - ck + 1, delta)[nb - ck])
        kept.append(NoteInst(
            inst.note, inst.vel, inst.on_f, inst.off_f, inst.dead_f,
            env_next, inst.rel_t,
        ))
    return {
        "idx": idx, "env_ads0": env_ads0, "env_rel0": env_rel0, **cols,
    }, NotesCarry(kept)


# ---------------------------------------------------------------------------
# Adsr vertex (reference extensions.rs:592-651)
# ---------------------------------------------------------------------------

@dataclass
class AdsrCarry:
    """Primary/ghost envelope cells with the reference's ACCUMULATED f32
    clocks: field t values are the reference's cell clock (p.0 / ghost.0)
    at the window start; the clock starts at -(i/sr) on its anchoring
    event and gains f32(len/sr) at every block end (extensions.rs:611,
    613-617, 649-650). Initial cells are (0, 0, 0) at refresh
    (extensions.rs:168-169)."""

    p_t: float = 0.0
    p_vel: float = 0.0
    p_rel: float = 0.0
    g_t: float = 0.0
    g_vel: float = 0.0
    g_rel: float = 0.0


def _adsr_cell_tables(cells, nb: int, delta) -> np.ndarray:
    """[nb, S] clock-at-block-start table for one cell role: column s is
    the fold of segment s's cell from its anchor block (garbage before the
    anchor block — frames there belong to earlier segments)."""
    S = max(len(cells), 1)
    tbl = np.zeros((nb, S), np.float32)
    for s, (ak, av, _v, _r) in enumerate(cells):
        if ak <= nb - 1:
            tbl[ak:nb, s] = clock_fold(av, nb - ak, delta)
    return tbl


def _adsr_finish(
    cells_p, cells_g, bounds, t0, nb, bl, delta, caps,
) -> tuple[dict[str, np.ndarray], AdsrCarry]:
    e_pad = _capped(len(cells_p), caps.get("e"))
    p_tbl = _adsr_cell_tables(cells_p, nb, delta)
    g_tbl = _adsr_cell_tables(cells_g, nb, delta)
    pad = np.zeros((nb, e_pad - p_tbl.shape[1]), np.float32)
    cols = _pad_cols(
        {
            "p_vel": np.asarray([c[2] for c in cells_p], np.float32),
            "p_rel": np.asarray([c[3] for c in cells_p], np.float32),
            "g_vel": np.asarray([c[2] for c in cells_g], np.float32),
            "g_rel": np.asarray([c[3] for c in cells_g], np.float32),
        },
        e_pad,
    )
    bounds_a = np.asarray(bounds, np.int64)
    bounds_pad = np.full(_capped(len(bounds), caps.get("b")), INF_FRAME,
                         np.int64)
    bounds_pad[: len(bounds)] = bounds_a
    # carry: the LAST segment's cells, clocks folded one step past the
    # window's final block (reference extensions.rs:649-650)
    pk, pv_, pvel, prel = cells_p[-1]
    gk, gv_, gvel, grel = cells_g[-1]
    new_carry = AdsrCarry(
        float(clock_fold(pv_, nb - pk + 1, delta)[nb - pk]), pvel, prel,
        float(clock_fold(gv_, nb - gk + 1, delta)[nb - gk]), gvel, grel,
    )
    return {
        "bounds": bounds_pad.astype(np.int32),
        "n_bounds": np.int32(len(bounds)),
        "p_t0": np.concatenate([p_tbl, pad], axis=1),
        "g_t0": np.concatenate([g_tbl, pad], axis=1),
        **cols,
    }, new_carry


def bake_adsr_drum(
    drum: DrumBake, carry: AdsrCarry, t0: int, nb: int, bl: int, sr: int,
    caps: dict | None = None,
) -> tuple[dict[str, np.ndarray], AdsrCarry]:
    """Drum mode (use_off=false, extensions.rs:631-647): each hit shifts
    primary->ghost and retriggers primary. rel fields stay 0. Cell clocks
    are the reference's accumulated f32 folds (see AdsrCarry)."""
    caps = caps or {}
    delta = f32_div(bl, sr)
    # cells as (anchor_block, anchor_clock_value, vel, rel)
    p = (0, carry.p_t, carry.p_vel, carry.p_rel)
    g = (0, carry.g_t, carry.g_vel, carry.g_rel)
    cells_p, cells_g, bounds = [p], [g], []
    for f, vel in zip(drum.frames.tolist(), drum.vels.tolist()):
        kb = (f - t0) // bl
        i_in = f - (t0 + kb * bl)
        g = p
        p = (kb, float(-f32_div(i_in, sr)), float(vel), 0.0)
        bounds.append(f)
        cells_p.append(p)
        cells_g.append(g)
    return _adsr_finish(cells_p, cells_g, bounds, t0, nb, bl, delta, caps)


def bake_adsr_off(
    simple: SimpleBake, carry: AdsrCarry, conf: AdsrConf, sr: int,
    t0: int, nb: int, bl: int, target_note: int | None,
    caps: dict | None = None,
) -> tuple[dict[str, np.ndarray], AdsrCarry]:
    """use_off mode (extensions.rs:603-629): a small event state machine —
    ON shifts primary->ghost and retriggers; the first OFF after that puts
    the *ghost* into release, the next puts the primary. The captured
    release value is apply_ads(conf, 0) * vel — the reference resets the
    clock before sampling (extensions.rs:613-617), so the capture lands at
    t=0; replicated literally (with the f32 multiply)."""
    caps = caps or {}
    delta = f32_div(bl, sr)
    p = (0, carry.p_t, carry.p_vel, carry.p_rel)
    g = (0, carry.g_t, carry.g_vel, carry.g_rel)
    cells_p, cells_g, bounds = [p], [g], []
    rel0 = np.float32(np_apply_ads(conf, np.float32(0.0)))
    for f, on, note, vel in zip(simple.frames, simple.ons, simple.notes,
                                simple.vels):
        if target_note is not None and abs(target_note - note) > 0.01:
            continue
        f = int(f)
        kb = (f - t0) // bl
        i_in = f - (t0 + kb * bl)
        anchor = float(-f32_div(i_in, sr))
        if on:
            g = p
            p = (kb, anchor, float(vel), 0.0)
        elif g[3] == 0.0:
            g = (kb, anchor, g[2],
                 float(np.float32(rel0 * np.float32(g[2]))))
        else:
            p = (kb, anchor, p[2],
                 float(np.float32(rel0 * np.float32(p[2]))))
        bounds.append(f)
        cells_p.append(p)
        cells_g.append(g)
    return _adsr_finish(cells_p, cells_g, bounds, t0, nb, bl, delta, caps)
