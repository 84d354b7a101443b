"""Synth-family window kernels: DebugSine, Synth (3-osc), SampSyn (wavetable).

All consume note-instance tables baked by graph/bake.py. The per-note
envelope clocks the reference accumulates frame-by-frame
(extensions.rs:459-578) are evaluated analytically from on/off frames; the
oscillator phase uses the reference's own formula time = global_frame / sr
(extensions.rs:501-503), including its float32 precision behavior.

SampSyn's wavetable phase instead uses uint32 fixed-point accumulation
(phase = n * round(hz/sr * 2^32) with natural wrap), which stays exact for
arbitrarily long notes — a first-party improvement over f32 phase (the
reference's external sampsyn crate owns its own precision story).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import osc
from .adsr import AdsrConf, apply_ads, apply_r_rt
from ..graph.bake import SENTINEL


def _block_gather(bake, nb, bl, frames):
    idx = bake["idx"]  # [nb, P]
    valid = idx >= 0
    f = frames.reshape(nb, bl)
    return idx, valid, f


def _time2d(frames, nb, bl, sr, time2d):
    """Per-frame reference time f32((t+i)/sr), shaped [nb, bl].

    Callers on the render path pass `time2d` sliced from the host-built
    time table (graph/compile.time_table): this TPU has no f32 divider —
    XLA lowers /. to a reciprocal approximation measured 1 ulp off on 57%
    of integer/sr quotients, and at second-scale oscillator phases that
    1 ulp is ~-77 dBFS against the reference's true f32 division. The
    in-line division below is the small-scale/compile-check fallback."""
    if time2d is not None:
        return time2d
    return frames.reshape(nb, bl).astype(jnp.float32) / jnp.float32(sr)


def _ib(bl, sr, ib):
    """In-block offsets f32(i)/f32(sr) (see _time2d for why baked)."""
    if ib is not None:
        return ib
    return jnp.arange(bl, dtype=jnp.float32) / jnp.float32(sr)


def debug_sine(
    bake: dict[str, jnp.ndarray], frames: jnp.ndarray, nb: int, bl: int,
    sr: int, time2d=None,
) -> jnp.ndarray:
    """Pure per-note sines, no envelope (extensions.rs:423-457)."""
    idx, valid, f = _block_gather(bake, nb, bl, frames)
    vel = bake["vels"][idx]
    s0 = bake["starts"][idx]
    e0 = bake["ends"][idx]
    active = (
        valid[:, None, :]
        & (f[:, :, None] >= s0[:, None, :])
        & (f[:, :, None] < e0[:, None, :])
    )  # [nb, bl, P]
    time = _time2d(frames, nb, bl, sr, time2d)  # [nb, bl]
    hz = bake["hz"][idx]  # [nb, P] host-exact (see bake._note_hz)
    sig = osc.sin_f32(time[:, :, None] * hz[:, None, :] * osc.TWO_PI)
    sig = sig * jnp.where(active, vel[:, None, :], 0.0)
    mono = jnp.sum(sig, axis=2).reshape(-1)  # [T]
    return jnp.stack([mono, mono], axis=1)


def _clock_fields(bake, idx, nb: int, bl: int, ib):
    """Per-frame reference envelope clocks from the baked per-(block,
    instance) accumulated-f32 tables (graph/bake.py:bake_notes): the
    reference evaluates f32(env_t + i/sr) per frame (extensions.rs:
    501-506), with env_t the per-block accumulated clock. Returns
    (env_ads_t, env_rel_t, rel_t) shaped [nb, bl, P] / [nb, 1, P]."""
    safe = jnp.clip(idx, 0, None)
    ads0 = jnp.take_along_axis(bake["env_ads0"], safe, axis=1)  # [nb, P]
    rel0 = jnp.take_along_axis(bake["env_rel0"], safe, axis=1)
    rel_t = bake["rel_t"][idx][:, None, :]  # [nb, 1, P]
    ibx = ib[None, :, None]  # f32(i)/f32(sr), reference's in-block offset
    env_ads_t = ads0[:, None, :] + ibx
    env_rel_t = rel0[:, None, :] + ibx
    return env_ads_t, env_rel_t, rel_t


def _note_envelope(conf: AdsrConf, f, off_f, env_ads_t, env_rel_t, rel_t):
    """env(t) per reference extensions.rs:505-506: apply_ads while held,
    apply_r_rt after note-off (release measured from the off moment).
    `held` is per-frame: the off frame may be baked ahead of time, but the
    release only starts once the timeline reaches it."""
    held = jnp.logical_or(off_f == SENTINEL, f < off_f)
    return jnp.where(
        held, apply_ads(conf, env_ads_t), apply_r_rt(conf, env_rel_t, rel_t)
    )


def synth(
    bake: dict[str, jnp.ndarray], frames: jnp.ndarray, nb: int, bl: int,
    sr: int,
    sq_vol: float, sq_z: float, sq_conf: AdsrConf,
    tf_vol: float, tf_z: float, tf_conf: AdsrConf,
    tr_vol: float, tr_conf: AdsrConf, time2d=None, ib=None,
) -> jnp.ndarray:
    """3-oscillator synth (extensions.rs:459-529): square-sine + topflat-sine
    + triangle, each with its own ADSR; output scaled by
    1 / sum(vol * adsr.max_vel()) (extensions.rs:465-468). Oscillators with
    volume <= 0 are compiled out (static params)."""
    amp_mult = sq_vol * sq_conf.max_vel() + tf_vol * tf_conf.max_vel() \
        + tr_vol * tr_conf.max_vel()
    amp_mult = 1.0 / amp_mult if amp_mult != 0.0 else 0.0

    idx, valid, f = _block_gather(bake, nb, bl, frames)
    vel = bake["vels"][idx]
    on_f = bake["on_f"][idx]
    off_f = bake["off_f"][idx]
    dead_f = bake["dead_f"][idx]
    ads_t, rel_el, rel_t = _clock_fields(
        bake, idx, nb, bl, _ib(bl, sr, ib)
    )

    fb = f[:, :, None]  # [nb, bl, 1]
    time = _time2d(frames, nb, bl, sr, time2d)[:, :, None]
    hz = bake["hz"][idx][:, None, :]  # [nb, 1, P] host-exact
    on_b = on_f[:, None, :]
    off_b = off_f[:, None, :]
    velb = vel[:, None, :]
    # per-frame life span: a note exists only from its on event (the
    # reference appends it mid-block, extensions.rs:482-483) until its
    # removal frame (retain on a later off event can cut a released note
    # mid-block, extensions.rs:485)
    alive = (fb >= on_b) & (fb < dead_f[:, None, :])

    s = jnp.zeros(fb.shape[:2] + (idx.shape[1],), jnp.float32)
    if sq_vol > 0.0:
        env = _note_envelope(sq_conf, fb, off_b, ads_t, rel_el, rel_t)
        s = s + osc.square_sine(time, hz, sq_z) * velb * env * sq_vol
    if tf_vol > 0.0:
        env = _note_envelope(tf_conf, fb, off_b, ads_t, rel_el, rel_t)
        s = s + osc.topflat_sine(time, hz, tf_z) * velb * env * tf_vol
    if tr_vol > 0.0:
        env = _note_envelope(tr_conf, fb, off_b, ads_t, rel_el, rel_t)
        s = s + osc.triangle(time, hz) * velb * env * tr_vol
    s = s * amp_mult
    s = jnp.where(valid[:, None, :] & alive, s, 0.0)
    mono = jnp.sum(s, axis=2).reshape(-1)
    return jnp.stack([mono, mono], axis=1)


def sampsyn(
    bake: dict[str, jnp.ndarray], frames: jnp.ndarray, nb: int, bl: int,
    sr: int, conf: AdsrConf,
    table_times: jnp.ndarray,  # [K]
    table_waves: jnp.ndarray,  # [K, W]
    time2d=None, ib=None,
) -> jnp.ndarray:
    """Time-varying wavetable synth (reference SampSyn,
    extensions.rs:531-578): same note lifecycle/ADSR as Synth, oscillator =
    table lookup at fixed-point phase, snapshots blended by note age
    (the reference passes env_time + rel_t = time since note-on as the
    table clock, extensions.rs:569)."""
    amp_mult = 1.0 / conf.max_vel() if conf.max_vel() != 0.0 else 0.0
    K, W = table_waves.shape

    idx, valid, f = _block_gather(bake, nb, bl, frames)
    vel = bake["vels"][idx]
    on_f = bake["on_f"][idx]
    off_f = bake["off_f"][idx]
    dead_f = bake["dead_f"][idx]
    ads_t, rel_el, rel_t = _clock_fields(
        bake, idx, nb, bl, _ib(bl, sr, ib)
    )

    fb = f[:, :, None]
    on_b = on_f[:, None, :]
    off_b = off_f[:, None, :]
    alive = (fb >= on_b) & (fb < dead_f[:, None, :])
    env = _note_envelope(conf, fb, off_b, ads_t, rel_el, rel_t)

    # table clock: env_time + rel_t (reference extensions.rs:569) — the
    # accumulated f32 clock, ~time since note-on; rel_t is 0 while held
    held = jnp.logical_or(off_b == SENTINEL, fb < off_b)
    tau = jnp.where(held, ads_t, rel_el + rel_t)  # [nb, bl, P] f32
    if K > 1:
        k = jnp.clip(
            jnp.searchsorted(table_times, tau.reshape(-1), side="right") - 1,
            0, K - 2,
        )
        t_k = table_times[k]
        t_k1 = table_times[k + 1]
        blend = jnp.clip((tau.reshape(-1) - t_k) / jnp.maximum(t_k1 - t_k, 1e-9),
                         0.0, 1.0)
    else:
        k = jnp.zeros(tau.size, jnp.int32)
        blend = jnp.zeros(tau.size, jnp.float32)

    # fixed-point phase: n * round(hz/sr * 2^32) mod 2^32, exact wrap
    # hz/sr baked host-side (true f32 division; see _time2d)
    n = (fb - on_b).astype(jnp.uint32)  # frames since on
    cyc = bake["cyc"][idx][:, None, :]
    c_fix = (cyc * jnp.float32(2.0**32)).astype(jnp.uint32)
    phase_fix = n * jnp.broadcast_to(c_fix, n.shape)  # uint32 wraps = mod 2^32
    phase = phase_fix.astype(jnp.float32) * jnp.float32(W / 2.0**32)  # [0, W)
    p0 = jnp.floor(phase).astype(jnp.int32)
    frac = phase - p0.astype(jnp.float32)
    p0 = jnp.clip(p0, 0, W - 1).reshape(-1)
    p1 = jnp.mod(p0 + 1, W)
    fracf = frac.reshape(-1)

    # ONE row-gather [N, 4]: each table row packs
    # (w_k[p], w_k[p+1], w_{k+1}[p], w_{k+1}[p+1]) so the phase
    # interpolation and snapshot blend read everything in one gather.
    # Measured alternatives on this TPU (amortized fori_loop microbench at
    # N = 16.8M + whole-config wall clock): this row gather runs ~12 ms
    # (~1/3 of a 512-block sampsyn window); four flat [N] gathers lower
    # ~4x WORSE (whole config 515 ms vs 132 ms); a Pallas VMEM-table
    # kernel was probed and abandoned (this Mosaic has no usable
    # vectorized VMEM gather). The remaining window cost is the [nb,bl,P]
    # envelope/phase elementwise field, which scales with polyphony.
    # p1 wrap rides the roll.
    del p1
    wnext = jnp.roll(table_waves, -1, axis=1)
    knext = jnp.minimum(jnp.arange(K) + 1, K - 1)
    wk1 = table_waves[knext]
    t4 = jnp.stack(
        [table_waves, wnext, wk1, jnp.roll(wk1, -1, axis=1)], axis=2
    ).reshape(K * W, 4)
    g = t4[k * W + p0]  # [N, 4]
    w0 = g[:, 0] * (1 - fracf) + g[:, 1] * fracf
    if K > 1:
        w1 = g[:, 2] * (1 - fracf) + g[:, 3] * fracf
        wave = w0 * (1 - blend) + w1 * blend
    else:
        wave = w0
    wave = wave.reshape(tau.shape)  # [nb, bl, P]

    s = wave * vel[:, None, :] * env * amp_mult
    s = jnp.where(valid[:, None, :] & alive, s, 0.0)
    mono = jnp.sum(s, axis=2).reshape(-1)
    return jnp.stack([mono, mono], axis=1)
