"""ADSR envelope evaluation (piecewise-linear, vectorized).

Faithful to the reference's envelope math (adsr.rs:41-114): a 9-field
configuration (std/attack/decay/sustain/release x seconds+velocity) and four
evaluators:

* apply_ads   — attack/decay/sustain, holding sustain forever (adsr.rs:62-69)
* apply_r     — release from a captured value (adsr.rs:71-73)
* apply_adsr  — fixed timeline including release (adsr.rs:75-86)
* apply_r_rt  — release from the ADS value at release time (adsr.rs:89-92)

All evaluators accept scalar or array `t` (JAX or numpy) and compute in
float32. Deviation (documented): a zero-length segment evaluates to its
start velocity instead of the reference's 0/0 = NaN (adsr.rs:47-48).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class AdsrConf(NamedTuple):
    """Reference adsr.rs:1-12. Plain floats — static per compiled graph."""

    std_vel: float = 0.0
    attack_sec: float = 0.0
    attack_vel: float = 0.0
    decay_sec: float = 0.0
    decay_vel: float = 0.0
    sustain_sec: float = 0.0
    sustain_vel: float = 0.0
    release_sec: float = 0.0
    release_vel: float = 0.0

    def max_vel(self) -> float:
        # reference adsr.rs:32-38
        return max(
            self.std_vel, self.attack_vel, self.decay_vel,
            self.sustain_vel, self.release_vel,
        )


def hit_conf(
    attack_sec: float, decay_sec: float, decay_vel: float,
    sustain_sec: float, sustain_vel: float, release_sec: float,
) -> AdsrConf:
    """6-float shorthand (reference adsr.rs:15-30)."""
    return AdsrConf(
        std_vel=0.0,
        attack_sec=attack_sec, attack_vel=1.0,
        decay_sec=decay_sec, decay_vel=decay_vel,
        sustain_sec=sustain_sec, sustain_vel=sustain_vel,
        release_sec=release_sec, release_vel=0.0,
    )


def build_adsr_conf(arr: list[float]) -> AdsrConf | None:
    """Accept length 0 / 6 / 9 float arrays (reference adsr.rs:94-114)."""
    if len(arr) == 0:
        return AdsrConf()
    if len(arr) == 6:
        return hit_conf(*[float(x) for x in arr])
    if len(arr) == 9:
        return AdsrConf(*[float(x) for x in arr])
    return None


def lerp(a, b, t):
    return a + t * (b - a)


def _safe_div(num, den: float):
    """t/seg with a zero-length segment evaluating to 0 (reference would NaN)."""
    if den <= 0.0:
        return jnp.zeros_like(num)
    return num / jnp.float32(den)


def _seg_bounds(conf: AdsrConf):
    """Segment boundaries summed in f32 like the reference
    (adsr.rs:46-56: t <= attack_sec + decay_sec + ... are f32 adds).
    A python-f64 sum rounded at the comparison can land 1 ulp away and
    flip the segment choice for a frame whose clock hits the edge
    exactly — a one-frame -20 dBFS spike on discontinuous envelopes."""
    a32 = np.float32(conf.attack_sec)
    d32 = np.float32(conf.decay_sec)
    s32 = np.float32(conf.sustain_sec)
    ad = np.float32(a32 + d32)
    ads_end = np.float32(ad + s32)
    return a32, ad, ads_end


def _ads_internal(conf: AdsrConf, t):
    """The reference's apply_ads_internal (adsr.rs:46-60): piecewise ADS
    with -1000.0 past the sustain window (the callers interpret any value
    <= -1.0 as their hold/release trigger)."""
    t = jnp.asarray(t, jnp.float32)
    a, d, s = conf.attack_sec, conf.decay_sec, conf.sustain_sec
    a32, ad, ads_end = _seg_bounds(conf)
    in_attack = t <= a32
    in_decay = t <= ad
    in_sustain = t <= ads_end
    v_attack = lerp(
        jnp.float32(conf.std_vel), jnp.float32(conf.attack_vel), _safe_div(t, a)
    )
    v_decay = lerp(
        jnp.float32(conf.attack_vel), jnp.float32(conf.decay_vel),
        _safe_div(t - a32, d),
    )
    d32 = np.float32(conf.decay_sec)
    v_sustain = lerp(
        jnp.float32(conf.decay_vel), jnp.float32(conf.sustain_vel),
        _safe_div(t - a32 - d32, s),  # sequential f32 subs (adsr.rs:52-56)
    )
    v_hold = jnp.float32(-1000.0)
    return jnp.where(
        in_attack, v_attack,
        jnp.where(in_decay, v_decay, jnp.where(in_sustain, v_sustain, v_hold)),
    )


def apply_ads(conf: AdsrConf, t):
    """ADS value at time t. The reference clamps ANY internal value
    <= -1.0 to sustain_vel (adsr.rs:62-69) — that both implements the
    hold past the sustain window (internal -1000) and snaps exotic
    mid-segment values reached with velocities <= -1.0."""
    v = _ads_internal(conf, t)
    return jnp.where(v <= -1.0, jnp.float32(conf.sustain_vel), v)


def apply_r(conf: AdsrConf, t, old_val):
    """Release from old_val towards release_vel over release_sec."""
    t = jnp.asarray(t, jnp.float32)
    r = conf.release_sec
    frac = jnp.minimum(_safe_div(t, r) if r > 0 else jnp.ones_like(t), 1.0)
    if r <= 0.0:
        # zero release: immediately at release_vel for t >= 0 (reference
        # t/0 = inf -> min(1) = 1)
        frac = jnp.ones_like(t)
    return lerp(jnp.asarray(old_val, jnp.float32), jnp.float32(conf.release_vel), frac)


def apply_adsr(conf: AdsrConf, t):
    """Full fixed-timeline envelope incl. release (reference adsr.rs:75-86).
    Like apply_ads, the release branch triggers on the internal value
    being <= -1.0 (not on a time comparison)."""
    t = jnp.asarray(t, jnp.float32)
    v = _ads_internal(conf, t)
    a32, _ad, _ads_end = _seg_bounds(conf)
    d32 = np.float32(conf.decay_sec)
    s32 = np.float32(conf.sustain_sec)
    r = conf.release_sec
    # sequential f32 subtractions (adsr.rs:79-84)
    rel_t = t - a32 - d32 - s32
    frac = jnp.minimum(_safe_div(rel_t, r) if r > 0 else jnp.ones_like(t), 1.0)
    if r <= 0.0:
        frac = jnp.ones_like(t)
    v_rel = lerp(jnp.float32(conf.sustain_vel), jnp.float32(conf.release_vel), frac)
    return jnp.where(v <= -1.0, v_rel, v)


def apply_r_rt(conf: AdsrConf, t, rt):
    """Release from the ADS value sampled at release time rt (adsr.rs:89-92)."""
    rv = apply_ads(conf, rt)
    return apply_r(conf, t, rv)


# -- numpy oracle (tests compare the jnp kernels against this) --------------

def np_apply_ads(conf: AdsrConf, t: np.ndarray) -> np.ndarray:
    t = np.asarray(t, np.float32)
    out = np.empty_like(t)
    a, d, s = conf.attack_sec, conf.decay_sec, conf.sustain_sec

    def seg(t0, dur, v0, v1, tt):
        if dur <= 0:
            return np.float32(v0)
        return np.float32(v0) + (tt - t0) / np.float32(dur) * np.float32(v1 - v0)

    flat = t.reshape(-1)
    res = np.empty_like(flat)
    for i, tt in enumerate(flat):
        if tt <= a:
            v = seg(0, a, conf.std_vel, conf.attack_vel, tt)
        elif tt <= a + d:
            v = seg(a, d, conf.attack_vel, conf.decay_vel, tt)
        elif tt <= a + d + s:
            v = seg(a + d, s, conf.decay_vel, conf.sustain_vel, tt)
        else:
            v = np.float32(-1000.0)
        # the reference's apply_ads clamp (adsr.rs:62-69): any internal
        # value <= -1.0 (incl. the -1000 past-window sentinel) snaps to
        # sustain_vel
        res[i] = conf.sustain_vel if v <= -1.0 else v
    return res.reshape(t.shape)
