"""Adsr *effect* vertex: envelope applied to the summed input, floww-driven.

Reference extensions.rs:592-651. Two modes:

* drum mode (use_off=false): every qualifying hit shifts primary->ghost and
  retriggers; both cells evaluate apply_adsr on their own clock
  (extensions.rs:631-647);
* use_off mode: held notes evaluate apply_ads; note-offs put first the
  ghost then the primary cell into release (apply_r from a captured value)
  (extensions.rs:603-629).

The host bakes the event state machine into per-segment cells
(graph/bake.py: bake_adsr_drum / bake_adsr_off); this kernel evaluates a
whole window per frame via searchsorted + the vectorized envelope math.
use_max picks max vs min of the two cells (for normal vs dipping/inverted
envelopes, doc.md:121); wet lerps the gain against 1.0
(extensions.rs:625, 643); wet < 1e-4 skips entirely (extensions.rs:598).
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
) -> jnp.ndarray:
    t = frames
    seg = jnp.searchsorted(bake["bounds"], t, side="right")
    srf = jnp.float32(sr)

    def cell(prefix: str):
        anchor = bake[f"{prefix}_anchor"][seg]
        velv = bake[f"{prefix}_vel"][seg]
        relv = bake[f"{prefix}_rel"][seg]
        tt = (t.astype(jnp.float32) - anchor) / srf
        if use_off:
            v = jnp.where(
                relv == 0.0, apply_ads(conf, tt), apply_r(conf, tt, relv)
            )
        else:
            v = apply_adsr(conf, tt)
        return v * velv

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
