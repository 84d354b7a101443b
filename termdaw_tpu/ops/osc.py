"""Band-unlimited oscillators (reference synth.rs:21-34), vectorized.

All take time in seconds (array), frequency in Hz, and the shape parameter z
where applicable. Formulas match the reference exactly:

* square-sine: clamp(sin, -z, z) / z              (synth.rs:21-24)
* topflat-sine: (min(sin, z) + (1-z)/2) * 2/(1+z) (synth.rs:26-29)
* triangle: 4*|t*hz - floor(t*hz + 1/2)| - 1      (synth.rs:31-34)
"""

from __future__ import annotations

import jax.numpy as jnp

TWO_PI = 6.283185307179586


def square_sine(t, hz, z: float):
    s = jnp.sin(t * hz * TWO_PI)
    z = jnp.float32(z)
    return jnp.clip(s, -z, z) * (1.0 / z)


def topflat_sine(t, hz, z: float):
    s = jnp.sin(t * hz * TWO_PI)
    z = jnp.float32(z)
    return (jnp.minimum(s, z) + (1.0 - z) / 2.0) * (2.0 / (1.0 + z))


def triangle(t, hz):
    x = t * hz
    return 4.0 * jnp.abs(x - jnp.floor(x + 0.5)) - 1.0


def note_hz(note):
    """MIDI note number -> Hz (reference extensions.rs:451)."""
    return 440.0 * jnp.exp2((jnp.asarray(note, jnp.float32) - 69.0) / 12.0)
