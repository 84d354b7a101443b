"""Band-unlimited oscillators (reference synth.rs:21-34), vectorized.

All take time in seconds (array), frequency in Hz, and the shape parameter z
where applicable. Formulas match the reference exactly:

* square-sine: clamp(sin, -z, z) / z              (synth.rs:21-24)
* topflat-sine: (min(sin, z) + (1-z)/2) * 2/(1+z) (synth.rs:26-29)
* triangle: 4*|t*hz - floor(t*hz + 1/2)| - 1      (synth.rs:31-34)

Accuracy: the reference's f32 `sin` (Rust libm) is sub-ulp for any
argument; this TPU's native f32 sin loses ~5e-4 absolute at arguments of
a few thousand radians (its internal range reduction). `sin_f32` below
restores libm-class accuracy with a 3-term Cody-Waite reduction of the
SAME f32 argument the reference rounds to — measured ≥-120 dBFS against
float64 sin of that argument for |x| < 4e5 rad (tests/test_ops.py).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

TWO_PI = 6.283185307179586


def _split_two_pi() -> tuple[float, float, float]:
    """2π = HI + MID + LO with HI/MID carrying 8 explicit mantissa bits
    each (so k*HI and k*MID are exact f32 products for integer k < 2^16)
    and LO the f32 remainder."""
    def trunc8(v: float) -> float:
        f = np.float32(v)
        bits = f.view(np.uint32) & np.uint32(0xFFFF0000)  # keep 8 frac bits
        return float(bits.view(np.float32))

    hi = trunc8(TWO_PI)
    mid = trunc8(TWO_PI - hi)
    lo = float(np.float32(TWO_PI - hi - mid))
    return hi, mid, lo


_PI2_HI, _PI2_MID, _PI2_LO = _split_two_pi()
_INV_2PI = 1.0 / TWO_PI
_REDUCE_MAX = 4.0e5  # k < 2^16: exactness bound of the reduction


def sin_f32(x: jnp.ndarray) -> jnp.ndarray:
    """Accurate f32 sine: Cody-Waite reduce x mod 2π, then native sin on
    the small residue (where the TPU approximation is tight). Falls back
    to native sin beyond the reduction's exactness range (where the f32
    argument itself no longer resolves the phase)."""
    x = jnp.asarray(x, jnp.float32)
    k = jnp.round(x * jnp.float32(_INV_2PI))
    r = x - k * jnp.float32(_PI2_HI)
    r = r - k * jnp.float32(_PI2_MID)
    r = r - k * jnp.float32(_PI2_LO)
    return jnp.where(jnp.abs(x) < _REDUCE_MAX, jnp.sin(r), jnp.sin(x))


def square_sine(t, hz, z: float):
    s = sin_f32(t * hz * TWO_PI)
    z = jnp.float32(z)
    return jnp.clip(s, -z, z) * (1.0 / z)


def topflat_sine(t, hz, z: float):
    s = sin_f32(t * hz * TWO_PI)
    z = jnp.float32(z)
    return (jnp.minimum(s, z) + (1.0 - z) / 2.0) * (2.0 / (1.0 + z))


def triangle(t, hz):
    x = t * hz
    return 4.0 * jnp.abs(x - jnp.floor(x + 0.5)) - 1.0


def note_hz(note):
    """MIDI note number -> Hz (reference extensions.rs:451)."""
    return 440.0 * jnp.exp2((jnp.asarray(note, jnp.float32) - 69.0) / 12.0)
