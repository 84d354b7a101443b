"""Adsr *effect* vertex: envelope applied to the summed input, floww-driven.

Reference extensions.rs:592-651. Two modes:

* drum mode (use_off=false): every qualifying hit shifts primary->ghost and
  retriggers; both cells evaluate apply_adsr on their own clock
  (extensions.rs:631-647);
* use_off mode: held notes evaluate apply_ads; note-offs put first the
  ghost then the primary cell into release (apply_r from a captured value)
  (extensions.rs:603-629).

The host bakes the event state machine into per-segment cells with the
reference's ACCUMULATED f32 per-block clocks (graph/bake.py:
bake_adsr_drum / bake_adsr_off — the reference adds f32(len/sr) to each
cell clock at every block end, extensions.rs:649-650, and that fold drifts
from an exact frame-anchored clock over long timelines). This kernel
evaluates a whole window: per frame, searchsorted picks the segment, the
[nb, S] clock table gives the cell clock at the block start, and the
in-block offset f32(i/sr) is added exactly like the reference
(extensions.rs:604, 638). use_max picks max vs min of the two cells (for
normal vs dipping/inverted envelopes, doc.md:121); wet lerps the gain
against 1.0 (extensions.rs:625, 643); wet < 1e-4 skips entirely
(extensions.rs:598).
"""

from __future__ import annotations

import jax.numpy as jnp

from .adsr import AdsrConf, apply_ads, apply_adsr, apply_r


def adsr_apply(
    x: jnp.ndarray,
    bake: dict[str, jnp.ndarray],
    frames: jnp.ndarray,
    sr: int,
    conf: AdsrConf,
    use_off: bool,
    use_max: bool,
    wet,
    ib=None,
) -> jnp.ndarray:
    t = frames
    nb = bake["p_t0"].shape[0]
    bl = t.shape[0] // nb
    seg = jnp.searchsorted(bake["bounds"], t, side="right").reshape(nb, bl)
    if ib is None:  # fallback; render path passes the host-divided table
        ib = jnp.arange(bl, dtype=jnp.float32) / jnp.float32(sr)
    ib = ib[None, :]

    def cell(prefix: str):
        t0v = jnp.take_along_axis(bake[f"{prefix}_t0"], seg, axis=1)
        clock = t0v + ib  # f32(cell_clock + i/sr), reference op order
        velv = bake[f"{prefix}_vel"][seg]
        relv = bake[f"{prefix}_rel"][seg]
        if use_off:
            v = jnp.where(
                relv == 0.0, apply_ads(conf, clock),
                apply_r(conf, clock, relv),
            )
        else:
            v = apply_adsr(conf, clock)
        return (v * velv).reshape(-1)

    pvel = cell("p")
    gvel = cell("g")
    maxmul = 1.0 if use_max else 0.0
    minmul = 1.0 - maxmul
    adsr_vel = jnp.maximum(pvel, gvel) * maxmul + jnp.minimum(pvel, gvel) * minmul
    wetf = jnp.asarray(wet, jnp.float32)
    vel = 1.0 + wetf * (adsr_vel - 1.0)  # lerp(1, adsr_vel, wet)
    out = x * vel[:, None]
    skip = wetf < 0.0001
    return jnp.where(skip, x, out)
