"""Native effect plugins — the TPU replacement for the LV2 host.

The reference hosts native LV2 .so plugins per frame through FFI
(lv2-host-minimal; reference lv2.rs:1-9, extensions.rs:580-590,
state.rs:254-323). This environment has no LV2 world, and per-frame FFI is
the antithesis of a TPU design, so the framework ships a first-party effect
suite behind the same project API: `load_lv2(name, uri)` resolves a URI to
one of these effects, `parameter(plugin, param, value)` sets named params,
and `add_lv2fx` wires it into the graph with the same wet-lerp semantics
(extensions.rs:580-590).

URI matching covers the plugins the shipped projects use
(project.lua:18-21): anything containing "reverb", "chorus"/"multichorus",
"compressor", "tape" — plus first-party "delay" and "bitcrush". Native URIs
of the form "native:<effect>" work too.

Every effect is formulated timeline-parallel:

* reverb — parallel feedback combs + series allpasses; each line's
  y[t] = g*y[t-D] + x'[t] recurrence decomposes into D independent
  first-order recurrences over residue classes mod D, evaluated with one
  associative scan; delay-line tails carry across windows.
* chorus — LFO-modulated fractional-delay voices: pure gathers.
* compressor — peak envelope via an associative max-decay scan
  (y = max(x, r*y_prev) composes as (r1*r2, max(b2, r2*b1))), attack
  smoothing via an affine scan, soft-knee gain computer elementwise.
* tape — tanh saturation + one-pole damping (affine scan) with drive
  compensation.
* delay — feedback echo (single comb, same residue-class scan).
* bitcrush — sample/bit decimation, elementwise.
* eq3 — 3-band EQ over Linkwitz-Riley 4th-order tree crossovers built from
  true biquads (complex pole-cascade tiled scans, ops/filters.biquad_apply).
* flanger — short LFO-modulated delay, gather-based.

States are small device pytrees (delay tails + scan carries) so windowed
playback chains exactly.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp

from .filters import (
    exclusive_total, first_order_scan_sharded, prev_frames,
)


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------

def _maxdecay_combine(left, right):
    a1, b1 = left
    a2, b2 = right
    return a1 * a2, jnp.maximum(b2, a2 * b1)


def max_decay_scan(x: jnp.ndarray, r, y0) -> jnp.ndarray:
    """y[t] = max(x[t], r * y[t-1]) over axis 0 (peak envelope follower).
    Tiled two-level scan (compile-time, see filters.tiled_cumulative);
    identity = (1, -inf) for the (decay, value) monoid."""
    y, _ = max_decay_scan_sharded(x, r, y0, None)
    return y


def max_decay_scan_sharded(
    x: jnp.ndarray, r, y0, axis_name: str | None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sharded-aware max_decay_scan; returns (y_local, y_final_global)."""
    from .filters import tiled_cumulative

    A = jnp.broadcast_to(jnp.asarray(r, jnp.float32), x.shape)
    A_cum, B_cum = tiled_cumulative(
        _maxdecay_combine, (1.0, -3.0e38), (A, x)
    )
    if axis_name is None:
        y = jnp.maximum(B_cum, A_cum * y0)
        return y, y[-1]
    (a_pre, b_pre), (a_tot, b_tot) = exclusive_total(
        _maxdecay_combine, (1.0, -3.0e38), (A_cum[-1], B_cum[-1]), axis_name
    )
    y0_local = jnp.maximum(b_pre, a_pre * y0)
    y = jnp.maximum(B_cum, A_cum * y0_local)
    return y, jnp.maximum(b_tot, a_tot * y0)


def _affine(left, right):
    return left[0] * right[0], right[0] * left[1] + right[1]


def feedback_line(
    x: jnp.ndarray, tail: jnp.ndarray, g, D: int,
    axis_name: str | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """y[t] = x[t] + g * y[t-D] over a window, with y[-D:] given by `tail`.

    x [T, C], tail [D, C] -> (y [T, C], new_tail [D, C]).
    Decomposes into D independent first-order recurrences (residue classes
    mod D) evaluated by one associative scan of length ceil(T/D).

    Under `axis_name` (timeline sharded, local slice = device i's [T, C]):
    the residue class of local position q is (i*T + q) mod D, so the local
    elements are placed at a traced offset o = (i*T) mod D inside an
    identity-padded buffer to re-align classes with the reshape; each
    device's per-class affine fold is then boundary-composed across
    devices (filters.exclusive_total), the local scan seeded with the
    earlier devices' composition applied to the carried global tail, and
    the replicated new tail read off the total composition."""
    T, C = x.shape
    if axis_name is None:
        rows = -(-T // D)
        pad = rows * D - T
        xp = jnp.pad(x, ((0, pad), (0, 0)))
        xr = xp.reshape(rows, D, C)
        A = jnp.broadcast_to(jnp.asarray(g, jnp.float32), xr.shape)
        A_cum, B_cum = jax.lax.associative_scan(_affine, (A, xr), axis=0)
        y = A_cum * tail[None, :, :] + B_cum  # [rows, D, C]
        y = y.reshape(rows * D, C)
        ycat = jnp.concatenate([tail, y[:T]], axis=0)
        new_tail = jax.lax.dynamic_slice_in_dim(ycat, T, D, axis=0)
        return y[:T], new_tail

    n_dev = jax.lax.axis_size(axis_name)
    i = jax.lax.axis_index(axis_name)
    o = (i.astype(jnp.int32) * T) % D  # traced phase offset in [0, D)
    rows = -(-(T + D) // D)
    P = rows * D
    A = jnp.ones((P, C), jnp.float32)
    B = jnp.zeros((P, C), jnp.float32)
    gfull = jnp.broadcast_to(jnp.asarray(g, jnp.float32), (T, C))
    A = jax.lax.dynamic_update_slice(A, gfull, (o, jnp.int32(0)))
    B = jax.lax.dynamic_update_slice(B, x, (o, jnp.int32(0)))
    A_cum, B_cum = jax.lax.associative_scan(
        _affine, (A.reshape(rows, D, C), B.reshape(rows, D, C)), axis=0
    )
    (a_pre, b_pre), (a_tot, b_tot) = exclusive_total(
        _affine, (1.0, 0.0), (A_cum[-1], B_cum[-1]), axis_name
    )
    y0c = a_pre * tail + b_pre  # [D, C] per-class seed
    y = (A_cum * y0c[None] + B_cum).reshape(P, C)
    y_local = jax.lax.dynamic_slice(y, (o, jnp.int32(0)), (T, C))
    yfin = a_tot * tail + b_tot  # [D, C]: last occurrence of each class
    t_total = n_dev * T
    new_tail = yfin[(t_total + jnp.arange(D)) % D]
    return y_local, new_tail


def delayed_read(
    x: jnp.ndarray, tail: jnp.ndarray, delay: jnp.ndarray
) -> jnp.ndarray:
    """Read x[t - delay[t]] with linear interpolation; `tail` is the last
    M input samples of the previous window. delay in samples, <= M."""
    M = tail.shape[0]
    xcat = jnp.concatenate([tail, x], axis=0)  # [M+T, C]
    t = jnp.arange(x.shape[0], dtype=jnp.float32) + M
    pos = t - delay
    p0 = jnp.floor(pos).astype(jnp.int32)
    frac = (pos - p0.astype(jnp.float32))[:, None]
    p0 = jnp.clip(p0, 0, xcat.shape[0] - 2)
    return xcat[p0] * (1 - frac) + xcat[p0 + 1] * frac


# ---------------------------------------------------------------------------
# reverb
# ---------------------------------------------------------------------------

# classic comb/allpass tunings (public Freeverb constants), at 44.1 kHz
_COMB_TUNING = [1116, 1188, 1277, 1356, 1422, 1491, 1557, 1617]
_ALLPASS_TUNING = [556, 441, 341, 225]
_STEREO_SPREAD = 23


def _scaled(d: int, sr: int) -> int:
    return max(2, int(round(d * sr / 44100.0)))


@dataclass(frozen=True)
class EffectDef:
    kind: str
    defaults: dict
    init_state: Callable  # (sr, static) -> state pytree
    process: Callable  # (x, state, params, sr, static, axis_name=None)
    #   -> (y, state'); axis_name = sequence-parallel mesh axis (sharded)
    # parameter names bound at graph build (host floats — delay-line lengths,
    # biquad coefficients); changing one triggers a rebuild at refresh, which
    # is when `parameter(...)` takes effect anyway (state.rs:305-318). All
    # other params stay traced and never recompile.
    static_params: tuple = ()


def static_values(eff: EffectDef, params: dict) -> dict:
    """The static (graph-build-time) parameter values for an effect."""
    return {k: float(params.get(k, eff.defaults[k])) for k in eff.static_params}


def _reverb_lines(sr: int) -> tuple[list[int], list[int]]:
    combs = []
    for d in _COMB_TUNING:
        combs.append(_scaled(d, sr))
        combs.append(_scaled(d + _STEREO_SPREAD, sr))
    allp = [_scaled(d, sr) for d in _ALLPASS_TUNING]
    return combs, allp


def _reverb_init(sr: int, static: dict) -> dict:
    combs, allp = _reverb_lines(sr)
    return {
        # combs are per-channel mono lines (L/R interleaved in `combs`),
        # so their tails are [d, 1] — running the scan on [T, 2] and
        # discarding a channel doubled the comb bank's work
        "comb_tails": tuple(jnp.zeros((d, 1), jnp.float32) for d in combs),
        "ap_x_tails": tuple(jnp.zeros((d, 2), jnp.float32) for d in allp),
        "ap_y_tails": tuple(jnp.zeros((d, 2), jnp.float32) for d in allp),
        "damp_y0": jnp.zeros(2, jnp.float32),
    }


def _reverb_process(x, state, params, sr, static, axis_name=None):
    combs, allp = _reverb_lines(sr)
    room = jnp.clip(params["room"], 0.0, 0.98)
    damp = jnp.clip(params["damp"], 0.0, 1.0)
    # input damping: one-pole lowpass, coefficient from damp
    a = damp * 0.8
    xin = x * 0.25
    b = (1.0 - a) * xin
    damped, new_damp_y0 = first_order_scan_sharded(
        b, a, state["damp_y0"], axis_name
    )

    acc = jnp.zeros_like(x)
    new_comb_tails = []
    for i, d in enumerate(combs):
        # per-comb feedback slightly varied for density
        g = room * (0.94 + 0.06 * (i % 3) / 2.0)
        # L combs feed L, R combs feed R (interleaved tunings): each comb
        # is a MONO line, so scan only its own channel
        ch = i % 2
        y, tail = feedback_line(
            damped[:, ch:ch + 1], state["comb_tails"][i], g, d,
            axis_name=axis_name,
        )
        new_comb_tails.append(tail)
        acc = acc.at[:, ch].add(y[:, 0])

    out = acc
    new_ap_x = []
    new_ap_y = []
    for i, d in enumerate(allp):
        # allpass: y[t] = g*y[t-D] + x[t-D] - g*x[t]
        gap = 0.5
        T = out.shape[0]
        halo, x_tail = prev_frames(out, state["ap_x_tails"][i], axis_name)
        xd = jnp.concatenate([halo, out], axis=0)[:T]  # x[t - D]
        u = xd - gap * out
        y, ytail = feedback_line(
            u, state["ap_y_tails"][i], gap, d, axis_name=axis_name
        )
        new_ap_x.append(x_tail)
        new_ap_y.append(ytail)
        out = y
    return out, {
        "comb_tails": tuple(new_comb_tails),
        "ap_x_tails": tuple(new_ap_x),
        "ap_y_tails": tuple(new_ap_y),
        "damp_y0": new_damp_y0,
    }


# ---------------------------------------------------------------------------
# chorus
# ---------------------------------------------------------------------------

_CHORUS_MAX_DELAY_MS = 40.0


def _chorus_init(sr: int, static: dict) -> dict:
    m = int(_CHORUS_MAX_DELAY_MS / 1000.0 * sr) + 4
    return {"tail": jnp.zeros((m, 2), jnp.float32),
            "phase": jnp.zeros((), jnp.float32)}


def _local_phase(ph0, rate, T: int, sr: int, axis_name):
    """Per-device LFO phase axis (radians) + the next-window start phase.

    Carries accumulated PHASE modulo 2*pi rather than absolute seconds:
    an f32 absolute-time clock loses modulation resolution as it grows
    (at t ~ 1e4 s the f32 spacing is ~1e-3 s, i.e. audible stepping in a
    0.3-20 Hz LFO after hours of playback); the wrapped phase stays
    small forever. Phase is also continuous across rate changes."""
    w = 2.0 * math.pi * rate / jnp.float32(sr)  # rad per frame
    if axis_name is None:
        base = ph0
        ph_next = ph0 + w * jnp.float32(T)
    else:
        n = jax.lax.axis_size(axis_name)
        i = jax.lax.axis_index(axis_name).astype(jnp.float32)
        base = ph0 + w * (i * jnp.float32(T))
        ph_next = ph0 + w * jnp.float32(n * T)
    two_pi = jnp.float32(2.0 * math.pi)
    return base + w * jnp.arange(T, dtype=jnp.float32), \
        jnp.mod(ph_next, two_pi)


def _chorus_process(x, state, params, sr, static, axis_name=None):
    rate = jnp.clip(params["rate"], 0.01, 20.0)
    depth_ms = jnp.clip(params["depth"], 0.0, 15.0)
    base_ms = jnp.clip(params["base"], 1.0, 20.0)
    voices = 3
    T = x.shape[0]
    phase, ph_next = _local_phase(state["phase"], rate, T, sr, axis_name)
    halo, new_tail = prev_frames(x, state["tail"], axis_name)
    out = jnp.zeros_like(x)
    for v in range(voices):
        ph = 2.0 * math.pi * (v / voices)
        lfo = jnp.sin(phase + ph)
        delay = (base_ms + depth_ms * (0.5 + 0.5 * lfo)) * (sr / 1000.0)
        out = out + delayed_read(x, halo, delay)
    out = out / voices
    return out, {"tail": new_tail, "phase": ph_next}


# ---------------------------------------------------------------------------
# compressor
# ---------------------------------------------------------------------------

def _comp_init(sr: int, static: dict) -> dict:
    return {"env": jnp.zeros((), jnp.float32),
            "smooth": jnp.zeros((), jnp.float32)}


def _comp_process(x, state, params, sr, static, axis_name=None):
    attack_ms = jnp.maximum(params["attack"], 0.01)
    release_ms = jnp.maximum(params["release"], 1.0)
    thresh_db = params["threshold"]
    ratio = jnp.maximum(params["ratio"], 1.0)
    knee = jnp.maximum(params["knee"], 0.0)
    makeup_db = params["makeup"]

    level = jnp.max(jnp.abs(x), axis=1)  # [T]
    r = jnp.exp(-1.0 / (release_ms * 0.001 * sr))
    env2, env_fin = max_decay_scan_sharded(
        level[:, None], r, state["env"], axis_name
    )
    env = env2[:, 0]
    a = jnp.exp(-1.0 / (attack_ms * 0.001 * sr))
    smooth2, smooth_fin = first_order_scan_sharded(
        ((1.0 - a) * env)[:, None], a, state["smooth"][None], axis_name
    )
    smooth = smooth2[:, 0]

    lvl_db = 20.0 * jnp.log10(jnp.maximum(smooth, 1e-9))
    over = lvl_db - thresh_db
    half_knee = knee * 0.5
    # soft knee gain reduction in dB
    gr_below = jnp.zeros_like(over)
    gr_knee = (1.0 / ratio - 1.0) * (over + half_knee) ** 2 / (2.0 * jnp.maximum(knee, 1e-9))
    gr_above = (1.0 / ratio - 1.0) * over
    gr_db = jnp.where(
        over <= -half_knee, gr_below,
        jnp.where(over >= half_knee, gr_above, gr_knee),
    )
    gain = jnp.power(10.0, (gr_db + makeup_db) / 20.0)
    y = x * gain[:, None]
    return y, {"env": env_fin[0], "smooth": smooth_fin[0]}


# ---------------------------------------------------------------------------
# tape
# ---------------------------------------------------------------------------

def _tape_init(sr: int, static: dict) -> dict:
    return {"lp_y0": jnp.zeros(2, jnp.float32)}


def _tape_process(x, state, params, sr, static, axis_name=None):
    drive = jnp.clip(params["drive"], 0.1, 10.0)
    cutoff = jnp.clip(params["cutoff"], 500.0, 20000.0)
    sat = jnp.tanh(x * drive) / jnp.tanh(drive)
    g = 1.0 - jnp.exp(-2.0 * math.pi * cutoff / sr)
    y, y_fin = first_order_scan_sharded(
        g * sat, 1.0 - g, state["lp_y0"], axis_name
    )
    return y, {"lp_y0": y_fin}


# ---------------------------------------------------------------------------
# delay (feedback echo)
# ---------------------------------------------------------------------------

_DELAY_MAX_SEC = 2.0


def _delay_samples(sr: int, static: dict) -> int:
    """Static comb length D from the bound `time` param (ms -> samples)."""
    t_ms = min(max(float(static["time"]), 1.0), _DELAY_MAX_SEC * 1000.0)
    return max(1, int(round(t_ms * sr / 1000.0)))


def _delay_init(sr: int, static: dict) -> dict:
    return {"tail": jnp.zeros((_delay_samples(sr, static), 2), jnp.float32)}


def _delay_process(x, state, params, sr, static, axis_name=None):
    # exact feedback comb y[t] = x[t] + fb * y[t-D]: `time` is a static
    # param bound at graph build, so D is a host int and the residue-class
    # scan applies — every echo order exact (no truncated echo sum, no decay
    # of unaccounted energy at high feedback). Deviation (documented):
    # `time` quantizes to whole samples at bind.
    fb = jnp.clip(params["feedback"], 0.0, 0.95)
    D = _delay_samples(sr, static)
    y, tail = feedback_line(x, state["tail"], fb, D, axis_name=axis_name)
    return y, {"tail": tail}


# ---------------------------------------------------------------------------
# 3-band EQ (low/mid/high gains via two one-pole crossovers)
# ---------------------------------------------------------------------------

def _eq3_init(sr: int, static: dict) -> dict:
    # Linkwitz-Riley 4th-order tree crossover: LP/HP pair at f_lo on the
    # input, then LP/HP pair at f_hi on the upper branch — 8 biquads run
    # as 4 stages of a 4-channel batched biquad (per-channel coefs,
    # ops/filters.biquad_apply); in-phase band sums (allpass at 0 dB)
    from .filters import biquad_init_state

    return {f"st{i}": biquad_init_state(4) for i in range(4)}


def _eq3_process(x, state, params, sr, static, axis_name=None):
    """3-band EQ with Linkwitz-Riley 4th-order crossovers.

    Crossover frequencies are static params bound at graph build
    (`parameter("eq", "low freq", x)` before the refresh moves them)
    because biquad coefficients are host-computed; gains stay fully
    traced."""
    from .filters import biquad_apply, biquad_coefs

    # crossovers clamped away from Nyquist where the biquad degenerates
    f_lo = min(max(float(static["low_freq"]), 10.0), 0.2 * sr)
    f_hi = min(max(float(static["high_freq"]), 2.0 * f_lo), 0.35 * sr)
    g_lo = jnp.power(10.0, params["low_gain"] / 20.0)
    g_mid = jnp.power(10.0, params["mid_gain"] / 20.0)
    g_hi = jnp.power(10.0, params["high_gain"] / 20.0)

    def pair(kind_a, f_a, kind_b, f_b):
        ca = biquad_coefs(kind_a, f_a, sr)
        cb = biquad_coefs(kind_b, f_b, sr)
        # channel layout [L_a, R_a, L_b, R_b]
        return tuple(
            jnp.asarray([a, a, b, b], jnp.float32) for a, b in zip(ca, cb)
        )

    c_lo = pair("lowpass", f_lo, "highpass", f_lo)
    c_hi = pair("lowpass", f_hi, "highpass", f_hi)
    xx = jnp.concatenate([x, x], axis=1)  # [T, 4]
    t0, s0 = biquad_apply(xx, c_lo, state["st0"], axis_name)
    t1, s1 = biquad_apply(t0, c_lo, state["st1"], axis_name)
    low, upper = t1[:, 0:2], t1[:, 2:4]
    uu = jnp.concatenate([upper, upper], axis=1)
    t2, s2 = biquad_apply(uu, c_hi, state["st2"], axis_name)
    t3, s3 = biquad_apply(t2, c_hi, state["st3"], axis_name)
    mid, high = t3[:, 0:2], t3[:, 2:4]
    y = low * g_lo + mid * g_mid + high * g_hi
    return y, {"st0": s0, "st1": s1, "st2": s2, "st3": s3}


# ---------------------------------------------------------------------------
# flanger (short modulated delay mixed with dry, feedback-free)
# ---------------------------------------------------------------------------

_FLANGER_MAX_DELAY_MS = 12.0


def _flanger_init(sr: int, static: dict) -> dict:
    m = int(_FLANGER_MAX_DELAY_MS / 1000.0 * sr) + 4
    return {"tail": jnp.zeros((m, 2), jnp.float32),
            "phase": jnp.zeros((), jnp.float32)}


def _flanger_process(x, state, params, sr, static, axis_name=None):
    rate = jnp.clip(params["rate"], 0.02, 10.0)
    depth_ms = jnp.clip(params["depth"], 0.1, 5.0)
    base_ms = jnp.clip(params["base"], 0.5, 6.0)
    T = x.shape[0]
    phase, ph_next = _local_phase(state["phase"], rate, T, sr, axis_name)
    halo, new_tail = prev_frames(x, state["tail"], axis_name)
    lfo = jnp.sin(phase)
    delay = (base_ms + depth_ms * (0.5 + 0.5 * lfo)) * (sr / 1000.0)
    wet = delayed_read(x, halo, delay)
    y = 0.5 * (x + wet)
    return y, {"tail": new_tail, "phase": ph_next}


# ---------------------------------------------------------------------------
# bitcrush
# ---------------------------------------------------------------------------

def _bitcrush_init(sr: int, static: dict) -> dict:
    return {}


def _bitcrush_process(x, state, params, sr, static, axis_name=None):
    bits = jnp.clip(params["bits"], 1.0, 16.0)
    levels = jnp.power(2.0, bits - 1.0)
    y = jnp.round(x * levels) / levels
    return y, state


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

EFFECTS: dict[str, EffectDef] = {
    "reverb": EffectDef(
        "reverb", {"room": 0.84, "damp": 0.5}, _reverb_init, _reverb_process
    ),
    "chorus": EffectDef(
        "chorus", {"rate": 0.8, "depth": 6.0, "base": 8.0},
        _chorus_init, _chorus_process,
    ),
    "compressor": EffectDef(
        "compressor",
        {"attack": 20.0, "release": 250.0, "threshold": -18.0, "ratio": 4.0,
         "knee": 6.0, "makeup": 0.0},
        _comp_init, _comp_process,
    ),
    "tape": EffectDef(
        "tape", {"drive": 1.5, "cutoff": 12000.0}, _tape_init, _tape_process
    ),
    "delay": EffectDef(
        "delay", {"time": 350.0, "feedback": 0.4}, _delay_init,
        _delay_process, static_params=("time",),
    ),
    "bitcrush": EffectDef(
        "bitcrush", {"bits": 8.0}, _bitcrush_init, _bitcrush_process
    ),
    "eq3": EffectDef(
        "eq3",
        {"low_freq": 250.0, "high_freq": 4000.0, "low_gain": 0.0,
         "mid_gain": 0.0, "high_gain": 0.0},
        _eq3_init, _eq3_process, static_params=("low_freq", "high_freq"),
    ),
    "flanger": EffectDef(
        "flanger", {"rate": 0.3, "depth": 2.0, "base": 1.5},
        _flanger_init, _flanger_process,
    ),
}

# case-insensitive URI fragment -> effect kind (covers the Calf URIs the
# shipped projects load, project.lua:18-21)
_URI_HINTS = [
    ("reverb", "reverb"),
    ("chorus", "chorus"),
    ("compressor", "compressor"),
    ("tape", "tape"),
    ("delay", "delay"),
    ("bitcrush", "bitcrush"),
    ("crusher", "bitcrush"),
    ("equalizer", "eq3"),
    ("eq3", "eq3"),
    ("flanger", "flanger"),
]

# parameter-name aliases so LV2-style display names (project.lua:23-26) work
_PARAM_ALIASES = {
    "attack": "attack", "release": "release", "knee": "knee",
    "ratio": "ratio", "threshold": "threshold", "makeup": "makeup",
    "makeup gain": "makeup",
    "room size": "room", "room": "room", "damp": "damp", "damping": "damp",
    "rate": "rate", "depth": "depth", "base": "base", "base delay": "base",
    "drive": "drive", "cutoff": "cutoff",
    "time": "time", "feedback": "feedback", "bits": "bits",
    "low_freq": "low_freq", "low freq": "low_freq",
    "high_freq": "high_freq", "high freq": "high_freq",
    "low_gain": "low_gain", "low gain": "low_gain",
    "mid_gain": "mid_gain", "mid gain": "mid_gain",
    "high_gain": "high_gain", "high gain": "high_gain",
}


def resolve_uri(uri: str) -> EffectDef | None:
    low = uri.lower()
    if low.startswith("native:"):
        return EFFECTS.get(low.split(":", 1)[1])
    for frag, kind in _URI_HINTS:
        if frag in low:
            return EFFECTS[kind]
    return None


def resolve_param(name: str) -> str | None:
    return _PARAM_ALIASES.get(name.strip().lower())
