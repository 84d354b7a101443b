"""Mixing primitives: input summation, constant-power pan, gain, normalize.

Reference semantics:

* sum_inputs zeroes then accumulates each input channel-wise in connect
  order (extensions.rs:310-319);
* apply_angle is a constant-power pan with angle in degrees, +90 = full
  left; skipped when |angle| < 0.001 (sample.rs:97-106);
* apply_gain skipped when |gain - 1| < 0.001 (sample.rs:108-114);
* post-op order is ext -> angle -> gain (extensions.rs:262-263);
* Normalize scales by the running causal peak: during normal rendering the
  peak only grows from observed block maxima; a 2-pass scan freezes it
  (extensions.rs:321-329). The causal per-block running max is computed
  here as a parallel prefix (associative_scan) over block maxima.

Gain/angle/wet are traced scalars so tweaking them never recompiles the
graph program; the reference's skip thresholds become `where` selects.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DEG_TO_RAD_HALF = 0.5 * 0.01745329  # reference sample.rs:99 constant


def sum_inputs(ins: list[jnp.ndarray]) -> jnp.ndarray:
    """Sum [.., 2] inputs sequentially in connect order."""
    acc = ins[0]
    for x in ins[1:]:
        acc = acc + x
    return acc


def apply_angle(x: jnp.ndarray, angle) -> jnp.ndarray:
    """Constant-power pan. x is [..., 2]; angle in degrees (traced scalar)."""
    angle = jnp.asarray(angle, jnp.float32)
    rad = angle * DEG_TO_RAD_HALF
    frac = jnp.float32(0.7071067811865476)
    l_amp = frac * (jnp.cos(rad) + jnp.sin(rad))
    r_amp = frac * (jnp.cos(rad) - jnp.sin(rad))
    amps = jnp.stack([l_amp, r_amp])
    skip = jnp.abs(angle) < 0.001
    return jnp.where(skip, x, x * amps)


def apply_gain(x: jnp.ndarray, gain) -> jnp.ndarray:
    gain = jnp.asarray(gain, jnp.float32)
    skip = jnp.abs(gain - 1.0) < 0.001
    return jnp.where(skip, x, x * gain)


def post(x: jnp.ndarray, angle, gain) -> jnp.ndarray:
    """ext -> angle -> gain (reference extensions.rs:262-263)."""
    return apply_gain(apply_angle(x, angle), gain)


def post_amps(angle, gain) -> jnp.ndarray:
    """The per-channel linear factor [2] equivalent to `post` — post is
    linear per channel, so a vertex's pan+gain can fold into upstream
    per-voice amplitudes (the fused voice-mix kernel). Reproduces the
    reference's skip thresholds exactly."""
    angle = jnp.asarray(angle, jnp.float32)
    gain = jnp.asarray(gain, jnp.float32)
    rad = angle * DEG_TO_RAD_HALF
    frac = jnp.float32(0.7071067811865476)
    amps = jnp.stack([
        frac * (jnp.cos(rad) + jnp.sin(rad)),
        frac * (jnp.cos(rad) - jnp.sin(rad)),
    ])
    amps = jnp.where(jnp.abs(angle) < 0.001, jnp.ones(2, jnp.float32), amps)
    g = jnp.where(jnp.abs(gain - 1.0) < 0.001, jnp.float32(1.0), gain)
    return amps * g


def block_maxima(x: jnp.ndarray) -> jnp.ndarray:
    """Per-block |peak| over [nb, bl, 2] -> [nb]."""
    return jnp.max(jnp.abs(x), axis=(1, 2))


def normalize_live(
    x: jnp.ndarray, max_in: jnp.ndarray, axis_name: str | None = None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Normal-render Normalize: per block k the scale is
    1 / max(max_in, cummax(block_maxima)[0..k]) — the reference's
    self-adapting growth (extensions.rs:321-329), parallelized as an
    associative prefix-max over blocks.

    Under `axis_name` (sequence-parallel timeline sharding) the prefix runs
    across devices: local block maxima are all-gathered (tiny — one float
    per block), the global running max computed identically everywhere, and
    each device scales its own slice. Returns (scaled [nb, bl, 2],
    max_out scalar — replicated)."""
    bm = block_maxima(x)
    if axis_name is None:
        running = jax.lax.associative_scan(jnp.maximum, bm)
        running = jnp.maximum(running, jnp.asarray(max_in, jnp.float32))
        out = x / running[:, None, None]
        return out, running[-1]
    nb_local = bm.shape[0]
    bm_all = jax.lax.all_gather(bm, axis_name)  # [n_dev, nb_local]
    running_all = jax.lax.associative_scan(jnp.maximum, bm_all.reshape(-1))
    running_all = jnp.maximum(running_all, jnp.asarray(max_in, jnp.float32))
    i = jax.lax.axis_index(axis_name)
    mine = jax.lax.dynamic_slice(running_all, (i * nb_local,), (nb_local,))
    out = x / mine[:, None, None]
    return out, running_all[-1]


def normalize_scan(
    x: jnp.ndarray, max_in: jnp.ndarray, scan_max_in: jnp.ndarray,
    axis_name: str | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Scan-pass Normalize: record the window peak into scan_max while
    scaling by the (frozen) current max (extensions.rs:321-329 is_scan arm).

    Returns (scaled, scan_max_out)."""
    bm = block_maxima(x)
    peak = jnp.max(bm)
    if axis_name is not None:
        peak = jax.lax.pmax(peak, axis_name)
    scan_max_out = jnp.maximum(peak, jnp.asarray(scan_max_in, jnp.float32))
    out = x / jnp.asarray(max_in, jnp.float32)
    return out, scan_max_out
