"""Independent per-frame NumPy oracle of the reference DSP semantics.

This deliberately re-implements the reference's *interpreted* model — block
pulls, per-frame loops, mutable voice state, the floww cursor — straight
from the reference sources (file:line cited per function), sharing NO code
with the compiled engine (not even the bake layer). Equivalence tests
render the same project through both and compare, which covers the whole
chain: event baking, instance tables, analytic envelope clocks, scans.

The one intentional difference mirrors the engine's documented deviation:
band-pass computes passr from cutr (the reference's passr=r-cutl is a bug,
extensions.rs:685).
"""

from __future__ import annotations

import math

import numpy as np


# -- floww cursor (reference floww.rs:70-141) -------------------------------

class OracleFloww:
    def __init__(self, events: np.ndarray, sr: int, bl: int):
        self.ev = np.asarray(events, np.float32)  # rows (id, t, note, vel)
        self.frames = (
            (self.ev[:, 1].astype(np.float32) * np.float32(sr)).astype(int)
            if len(self.ev) else np.zeros(0, int)
        )
        self.sr = sr
        self.bl = bl
        self.frame = 0
        self.start_index = 0
        self.block_index = 0

    def set_time(self, t: int) -> None:
        for j in range(len(self.frames)):
            if self.frames[j] >= t:
                self.start_index = j
                break
        self.frame = t

    def set_time_to_next_block(self) -> None:
        self.frame += self.bl
        for j in range(self.start_index, len(self.frames)):
            if self.frames[j] >= self.frame:
                self.start_index = j
                break

    def start_block(self) -> None:
        self.block_index = self.start_index

    def get_block_drum(self, offset: int):
        # reference floww.rs:99-121
        while True:
            if self.block_index >= len(self.frames):
                return None
            f = self.frames[self.block_index]
            target = self.frame + offset
            if f < target:
                self.block_index += 1
                continue
            if f == target:
                self.block_index += 1
                if self.ev[self.block_index - 1, 3] > 0.001:
                    e = self.ev[self.block_index - 1]
                    return (float(e[2]), float(e[3]))
                continue
            return None

    def get_block_simple(self, offset: int):
        # reference floww.rs:124-141
        res = []
        while True:
            if self.block_index >= len(self.frames):
                break
            f = self.frames[self.block_index]
            if f == self.frame + offset:
                e = self.ev[self.block_index]
                self.block_index += 1
                res.append((e[3] > 0.001, float(e[2]), float(e[3])))
            else:
                break
        return res


# -- ADSR math (reference adsr.rs:41-92) ------------------------------------

def lerp(a, b, t):
    return a + t * (b - a)


# -- reference f32 clock arithmetic -----------------------------------------
# The reference keeps every envelope clock in f32 and ACCUMULATES it:
# -(i/sr) on trigger, += f32(len/sr) per block (extensions.rs:483, 526-528).
# The oracle replays the identical f32 fold so segment-edge decisions match
# the engine's baked clocks (graph/bake.py) frame-for-frame; envelope VALUE
# arithmetic stays f32 too (numpy f32 scalar ops round like the engine).

F32 = np.float32


def fdiv(i, sr):
    """i as f32 / sr as f32 (the reference's time quantum)."""
    return np.float32(np.float32(i) / np.float32(sr))


def conf32(conf):
    """Quantize an ADSR conf to f32 like mlua does when passing Lua
    numbers into the reference's f32 API."""
    return tuple(np.float32(x) for x in conf)


def _ads_internal(conf, t):
    """apply_ads_internal (adsr.rs:46-60): piecewise ADS, -1000.0 past
    the sustain window; zero-length segments evaluate to their start
    velocity (documented deviation 5)."""
    sv, a_s, av, d_s, dv, s_s, svel, r_s, rv = conf
    if a_s > 0 and t <= a_s:
        return lerp(sv, av, t / a_s)
    if t <= a_s:
        return sv
    if d_s > 0 and t <= a_s + d_s:
        return lerp(av, dv, (t - a_s) / d_s)
    if t <= a_s + d_s:
        return av
    if s_s > 0 and t <= a_s + d_s + s_s:
        return lerp(dv, svel, (t - a_s - d_s) / s_s)
    return np.float32(-1000.0)


def ads(conf, t):
    # apply_ads clamp (adsr.rs:62-69): any internal value <= -1.0 — the
    # past-window -1000 sentinel AND exotic mid-segment values from
    # velocities <= -1.0 — snaps to sustain_vel
    v = _ads_internal(conf, t)
    return conf[6] if v <= -1.0 else v


def rel(conf, t, old):
    r_s, rv = conf[7], conf[8]
    frac = min(t / r_s, 1.0) if r_s > 0 else 1.0
    return lerp(old, rv, frac)


def adsr_full(conf, t):
    # release triggers on the internal value being <= -1.0, not on a
    # time comparison (adsr.rs:75-86)
    sv, a_s, av, d_s, dv, s_s, svel, r_s, rv = conf
    v = _ads_internal(conf, t)
    if v > -1.0:
        return v
    frac = min((t - a_s - d_s - s_s) / r_s, 1.0) if r_s > 0 else 1.0
    return lerp(svel, rv, frac)


def r_rt(conf, t, rt):
    return rel(conf, t, ads(conf, rt))


def max_vel(conf):
    return max(conf[0], conf[2], conf[4], conf[6], conf[8])


def hit6(a):
    return (0.0, a[0], 1.0, a[1], a[2], a[3], a[4], a[5], 0.0)


# -- oscillators (reference synth.rs:21-34) ---------------------------------
# the sine ARGUMENT is built in f32 like the f32 reference (and engine):
# at second-scale times * audio-rate hz the argument reaches thousands of
# radians, where f32 argument rounding dominates the result (~-70 dBFS) —
# an f64 argument would make the oracle the odd one out, not the engine

def _sin_arg32(t, hz):
    return np.float32(np.float32(t) * np.float32(hz) * np.float32(2 * np.pi))


def sq_sine(t, hz, z):
    return min(max(math.sin(_sin_arg32(t, hz)), -z), z) / z


def tf_sine(t, hz, z):
    return (min(math.sin(_sin_arg32(t, hz)), z) + (1 - z) / 2) * (
        2 / (1 + z)
    )


def tri(t, hz):
    x = float(np.float32(t) * np.float32(hz))
    return 4.0 * abs(x - math.floor(x + 0.5)) - 1.0


# -- vertices ---------------------------------------------------------------

class V:
    has_input = False

    def __init__(self, gain=1.0, angle=0.0, wet=0.0):
        self.gain = gain
        self.angle = min(max(angle, -90.0), 90.0)
        self.wet = min(max(wet, 0.0), 1.0)

    def post(self, buf):
        # reference sample.rs:97-114 + extensions.rs:262-263
        if abs(self.angle) >= 0.001:
            rad = self.angle * 0.5 * 0.01745329
            l_amp = (0.5**0.5) * (math.cos(rad) + math.sin(rad))
            r_amp = (0.5**0.5) * (math.cos(rad) - math.sin(rad))
            buf[:, 0] *= l_amp
            buf[:, 1] *= r_amp
        if abs(self.gain - 1.0) >= 0.001:
            buf *= self.gain
        return buf


class Sum(V):
    has_input = True

    def gen(self, ctx, ins):
        return sum(ins) if ins else np.zeros((ctx["bl"], 2))


class Normalize(V):
    has_input = True

    def __init__(self, **kw):
        super().__init__(**kw)
        self.max = 1e-6

    def gen(self, ctx, ins):
        buf = sum(ins) if ins else np.zeros((ctx["bl"], 2))
        self.max = max(self.max, float(np.max(np.abs(buf))))
        return buf / self.max


class SampleLoop(V):
    def __init__(self, sample, **kw):
        super().__init__(**kw)
        self.sample = sample
        self.t = 0

    def gen(self, ctx, ins):
        L = len(self.sample)
        idx = (self.t + np.arange(ctx["bl"])) % L
        self.t += ctx["bl"]
        return self.sample[idx].copy()


class SampleMulti(V):
    def __init__(self, sample, floww, note=None, **kw):
        super().__init__(**kw)
        self.sample = sample
        self.floww = floww
        self.note = note
        self.ts: list = []  # (t, vel)

    def gen(self, ctx, ins):
        # reference extensions.rs:343-381
        buf = np.zeros((ctx["bl"], 2))
        fl = ctx["flowws"][self.floww]
        fl.start_block()
        L = len(self.sample)
        for i in range(ctx["bl"]):
            hit = fl.get_block_drum(i)
            if hit is not None:
                note, v = hit
                if self.note is None or abs(note - self.note) < 0.01:
                    self.ts.append([-i, v])
            pops = 0
            for t, vel in self.ts:
                pos = max(t + i, 0)
                if pos >= L:
                    pops += 1
                else:
                    buf[i] += self.sample[pos] * vel
            self.ts = self.ts[pops:]
        for voice in self.ts:
            voice[0] += ctx["bl"]
        return buf


class SampleLerp(V):
    def __init__(self, sample, floww, note=None, lerp_len=0, **kw):
        super().__init__(**kw)
        self.sample = sample
        self.floww = floww
        self.note = note
        self.lerp_len = lerp_len
        self.countdown = 0
        self.primary = [0, 0.0]
        self.ghost = [0, 0.0]

    def gen(self, ctx, ins):
        # reference extensions.rs:383-421
        buf = np.zeros((ctx["bl"], 2))
        fl = ctx["flowws"][self.floww]
        fl.start_block()
        L = len(self.sample)
        for i in range(ctx["bl"]):
            hit = fl.get_block_drum(i)
            if hit is not None:
                note, v = hit
                if self.note is None or abs(note - self.note) < 0.01:
                    self.ghost = list(self.primary)
                    self.primary = [-i, v]
                    self.countdown = self.lerp_len
            ppos = min(max(self.primary[0] + i, 0), L - 1)
            val = self.sample[ppos] * self.primary[1]
            if self.countdown > 0:
                self.countdown -= 1
                t = self.countdown / self.lerp_len
                gpos = min(max(self.ghost[0] + i, 0), L - 1)
                gval = self.sample[gpos] * self.ghost[1]
                val = gval * t + val * (1 - t)
            buf[i] = val
        self.primary[0] += ctx["bl"]
        self.ghost[0] += ctx["bl"]
        return buf


class DebugSine(V):
    def __init__(self, floww, **kw):
        super().__init__(**kw)
        self.floww = floww
        self.notes: list = []

    def gen(self, ctx, ins):
        # reference extensions.rs:423-457
        buf = np.zeros((ctx["bl"], 2))
        fl = ctx["flowws"][self.floww]
        fl.start_block()
        sr = ctx["sr"]
        for i in range(ctx["bl"]):
            for on, note, vel in fl.get_block_simple(i):
                if on:
                    for nv in self.notes:
                        if abs(nv[0] - note) < 0.001:
                            nv[1] = vel
                            break
                    else:
                        self.notes.append([note, vel])
                else:
                    self.notes = [
                        nv for nv in self.notes if abs(nv[0] - note) > 0.001
                    ]
            s = 0.0
            for note, vel in self.notes:
                time = fdiv(ctx["t"] + i, sr)
                hz = 440.0 * 2 ** ((note - 69.0) / 12.0)
                s += math.sin(_sin_arg32(time, hz)) * vel
            buf[i] = s
        return buf


class Synth(V):
    def __init__(self, floww, sq, tf, tr, **kw):
        # sq/tf/tr: (vol, z, conf9)
        super().__init__(**kw)
        self.floww = floww
        self.sq, self.tf, self.tr = (
            (v[0], v[1], conf32(v[2])) for v in (sq, tf, tr)
        )
        self.notes: list = []  # [note, vel, env_t, rel_t]

    def gen(self, ctx, ins):
        # reference extensions.rs:459-529
        buf = np.zeros((ctx["bl"], 2))
        fl = ctx["flowws"][self.floww]
        fl.start_block()
        sr = ctx["sr"]
        sqv, sqz, sqc = self.sq
        tfv, tfz, tfc = self.tf
        trv, _, trc = self.tr
        mv = sqv * max_vel(sqc) + tfv * max_vel(tfc) + trv * max_vel(trc)
        # all-zero volumes/velocities: engine emits silence where the
        # reference computes 1/0 = inf and NaNs out (manual deviation 11)
        amp = 1.0 / mv if mv != 0.0 else 0.0
        release_sec = 0.0
        if sqv > 0:
            release_sec = sqc[7]
        if tfv > 0:
            release_sec = max(release_sec, tfc[7])
        if trv > 0:
            release_sec = max(release_sec, trc[7])
        for i in range(ctx["bl"]):
            for on, note, vel in fl.get_block_simple(i):
                if on:
                    self.notes.append([note, vel, -fdiv(i, sr), F32(0.0)])
                else:
                    self.notes = [
                        n for n in self.notes
                        if abs(n[0] - note) > 0.001 or n[3] == 0.0
                    ]
                    for n in self.notes:
                        if abs(n[0] - note) > 0.001:
                            continue
                        if n[3] == 0.0:
                            n[3] = F32(n[2] + fdiv(i, sr))
                            n[2] = -fdiv(i, sr)
            s = 0.0
            for note, vel, env_t, rel_t in self.notes:
                time = fdiv(ctx["t"] + i, sr)
                env_time = F32(env_t + fdiv(i, sr))
                hz = 440.0 * 2 ** ((note - 69.0) / 12.0)

                def env(c):
                    if rel_t == 0.0:
                        return ads(c, env_time)
                    return r_rt(c, env_time, rel_t)

                if sqv > 0:
                    s += sq_sine(time, hz, sqz) * vel * env(sqc) * sqv
                if tfv > 0:
                    s += tf_sine(time, hz, tfz) * vel * env(tfc) * tfv
                if trv > 0:
                    s += tri(time, hz) * vel * env(trc) * trv
            buf[i] = s * amp
        for n in self.notes:
            n[2] = F32(n[2] + fdiv(ctx["bl"], sr))
        self.notes = [n for n in self.notes
                      if n[3] == 0.0 or n[2] <= release_sec]
        return buf


class SampSyn(V):
    """Per-frame wavetable synth (reference SampSyn, extensions.rs:531-578):
    Synth's note lifecycle + ADSR, oscillator = wavetable lookup at the
    engine's exact uint32 fixed-point phase, snapshots blended by time
    since note-on."""

    def __init__(self, floww, conf9, times, waves, **kw):
        super().__init__(**kw)
        self.floww = floww
        self.conf = conf32(conf9)
        self.times = np.asarray(times, np.float64)  # [K]
        self.waves = np.asarray(waves, np.float64)  # [K, W]
        self.notes: list = []  # [note, vel, env_t, rel_t, on_frame]

    def _wave(self, note, n_since_on, tau):
        K, W = self.waves.shape
        # fixed-point phase exactly like the engine (ops/synthv.py):
        # c_fix = uint32(f32(hz / sr) * 2^32); phase = n * c_fix mod 2^32;
        # hz rounded from the exact value like the reference's libm powf
        hz = np.float32(440.0 * 2.0 ** ((note - 69.0) / 12.0))
        cyc = np.float32(hz) / np.float32(self._sr)
        c_fix = np.uint32(np.float32(cyc * np.float32(2.0**32)))
        phase_fix = np.uint32((int(n_since_on) * int(c_fix)) & 0xFFFFFFFF)
        phase = np.float32(phase_fix) * np.float32(W / 2.0**32)
        p0 = int(np.clip(np.floor(phase), 0, W - 1))
        p1 = (p0 + 1) % W
        frac = float(phase - np.float32(p0))
        if K > 1:
            k = int(np.clip(
                np.searchsorted(self.times, tau, side="right") - 1, 0, K - 2
            ))
            t_k, t_k1 = self.times[k], self.times[k + 1]
            blend = float(np.clip((tau - t_k) / max(t_k1 - t_k, 1e-9), 0, 1))
        else:
            k, blend = 0, 0.0
        w0 = self.waves[k, p0] * (1 - frac) + self.waves[k, p1] * frac
        if K > 1:
            w1 = (self.waves[k + 1, p0] * (1 - frac)
                  + self.waves[k + 1, p1] * frac)
            return w0 * (1 - blend) + w1 * blend
        return w0

    def gen(self, ctx, ins):
        buf = np.zeros((ctx["bl"], 2))
        fl = ctx["flowws"][self.floww]
        fl.start_block()
        sr = ctx["sr"]
        self._sr = sr
        c = self.conf
        mv = max_vel(c)
        amp = 1.0 / mv if mv != 0.0 else 0.0
        release_sec = c[7]
        for i in range(ctx["bl"]):
            for on, note, vel in fl.get_block_simple(i):
                if on:
                    self.notes.append(
                        [note, vel, -fdiv(i, sr), F32(0.0), ctx["t"] + i]
                    )
                else:
                    self.notes = [
                        n for n in self.notes
                        if abs(n[0] - note) > 0.001 or n[3] == 0.0
                    ]
                    for n in self.notes:
                        if abs(n[0] - note) > 0.001:
                            continue
                        if n[3] == 0.0:
                            n[3] = F32(n[2] + fdiv(i, sr))
                            n[2] = -fdiv(i, sr)
            s = 0.0
            for note, vel, env_t, rel_t, on_frame in self.notes:
                env_time = F32(env_t + fdiv(i, sr))
                env = (ads(c, env_time) if rel_t == 0.0
                       else r_rt(c, env_time, rel_t))
                tau = F32(env_time + rel_t)  # time since note-on
                n_since = (ctx["t"] + i) - on_frame
                if n_since < 0:
                    continue
                s += self._wave(note, n_since, tau) * vel * env
            buf[i] = s * amp
        for n in self.notes:
            n[2] = F32(n[2] + fdiv(ctx["bl"], sr))
        self.notes = [n for n in self.notes
                      if n[3] == 0.0 or n[2] <= release_sec]
        return buf


class Adsr(V):
    has_input = True

    def __init__(self, floww, conf, use_off=False, use_max=True, note=None,
                 **kw):
        super().__init__(**kw)
        self.floww = floww
        self.conf = conf32(conf)
        self.use_off = use_off
        self.use_max = use_max
        self.note = note
        self.primary = [0.0, 0.0, 0.0]
        self.ghost = [0.0, 0.0, 0.0]

    def gen(self, ctx, ins):
        # reference extensions.rs:592-651
        buf = (sum(ins) if ins else np.zeros((ctx["bl"], 2))).copy()
        if self.wet < 0.0001:
            return buf
        fl = ctx["flowws"][self.floww]
        fl.start_block()
        sr = ctx["sr"]
        maxmul = 1.0 if self.use_max else 0.0
        minmul = 1.0 - maxmul
        if self.use_off:
            for i in range(ctx["bl"]):
                offset = fdiv(i, sr)
                for on, n, v in fl.get_block_simple(i):
                    if self.note is not None and abs(self.note - n) > 0.01:
                        continue
                    if on:
                        self.ghost = list(self.primary)
                        self.primary = [-fdiv(i, sr), v, 0.0]
                    elif self.ghost[2] == 0.0:
                        self.ghost[0] = -fdiv(i, sr)
                        self.ghost[2] = ads(
                            self.conf, F32(self.ghost[0] + offset)
                        ) * self.ghost[1]
                    else:
                        self.primary[0] = -fdiv(i, sr)
                        self.primary[2] = ads(
                            self.conf, F32(self.primary[0] + offset)
                        ) * self.primary[1]
                p, g = self.primary, self.ghost
                pvel = (ads(self.conf, F32(p[0] + offset)) if p[2] == 0.0
                        else rel(self.conf, F32(p[0] + offset), p[2])) * p[1]
                gvel = (ads(self.conf, F32(g[0] + offset)) if g[2] == 0.0
                        else rel(self.conf, F32(g[0] + offset), g[2])) * g[1]
                av = max(pvel, gvel) * maxmul + min(pvel, gvel) * minmul
                buf[i] *= lerp(1.0, av, self.wet)
        else:
            for i in range(ctx["bl"]):
                hit = fl.get_block_drum(i)
                if hit is not None:
                    n, v = hit
                    if self.note is None or abs(self.note - n) <= 0.01:
                        self.ghost = list(self.primary)
                        self.primary = [-fdiv(i, sr), v, 0.0]
                offset = fdiv(i, sr)
                pvel = adsr_full(self.conf, F32(self.primary[0] + offset)) \
                    * self.primary[1]
                gvel = adsr_full(self.conf, F32(self.ghost[0] + offset)) \
                    * self.ghost[1]
                av = max(pvel, gvel) * maxmul + min(pvel, gvel) * minmul
                buf[i] *= lerp(1.0, av, self.wet)
        self.primary[0] = F32(self.primary[0] + fdiv(ctx["bl"], sr))
        self.ghost[0] = F32(self.ghost[0] + fdiv(ctx["bl"], sr))
        return buf


class BandPass(V):
    has_input = True

    def __init__(self, cut_low, cut_high, pass_mode, sr, **kw):
        super().__init__(**kw)
        lco = min(max(cut_low, 0.0), 20000.0)
        hco = min(max(cut_high, 0.0), 20000.0)
        self.lg = 1.0 - math.exp(-2 * math.pi * lco / sr)
        self.hg = 1.0 - math.exp(-2 * math.pi * hco / sr)
        self.pass_mode = pass_mode
        self.prev = np.zeros(4)
        self.first = True

    def gen(self, ctx, ins):
        # reference extensions.rs:653-689 (with the passr fix)
        buf = (sum(ins) if ins else np.zeros((ctx["bl"], 2))).copy()
        if self.wet < 0.0001 or (self.lg == 0.0 and self.hg == 0.0):
            return buf
        lmul = 0.0 if self.lg == 0.0 else 1.0
        hmul = 0.0 if self.hg == 0.0 else 1.0
        pm = 1.0 if self.pass_mode else 0.0
        cm = 1.0 - pm
        if self.first:
            self.prev[:] = [buf[0, 0], buf[0, 1], buf[0, 0], buf[0, 1]]
            self.first = False
        for i in range(ctx["bl"]):
            l, r = buf[i]
            self.prev[0] += self.lg * (l - self.prev[0])
            self.prev[1] += self.lg * (r - self.prev[1])
            self.prev[2] += self.hg * (l - self.prev[2])
            self.prev[3] += self.hg * (r - self.prev[3])
            cutl = (lmul * self.prev[0] + hmul * (l - self.prev[2])) * 0.5
            cutr = (lmul * self.prev[1] + hmul * (r - self.prev[3])) * 0.5
            buf[i, 0] = cutl * cm + (l - cutl) * pm
            buf[i, 1] = cutr * cm + (r - cutr) * pm
        return buf


def oracle_render(vertices, edges, output, flowws, sr, bl, n_blocks,
                  t0=0):
    """Pull-render: vertices dict name->V; edges list (a, b); flowws dict
    name->OracleFloww. Mirrors graph.rs:98-121/182-193."""
    in_edges = {name: [] for name in vertices}
    for a, b in edges:
        in_edges[b].append(a)
    for fl in flowws.values():
        fl.set_time(t0)
    out = np.zeros((n_blocks * bl, 2))
    t = t0
    for k in range(n_blocks):
        ctx = {"bl": bl, "sr": sr, "t": t, "flowws": flowws}
        cache: dict = {}

        def run(name):
            if name in cache:
                return cache[name]
            ins = [run(a) for a in in_edges[name]]
            v = vertices[name]
            buf = v.gen(ctx, ins)
            buf = v.post(buf)
            cache[name] = buf
            return buf

        out[k * bl : (k + 1) * bl] = run(output)
        for fl in flowws.values():
            fl.set_time_to_next_block()
        t += bl
    return out
