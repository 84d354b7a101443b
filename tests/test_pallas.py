"""Pallas voice-mixer kernel: interpret-mode equivalence vs the XLA path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from termdaw_tpu.graph.bake import bake_sample_multi, MultiCarry
from termdaw_tpu.banks.flowwbank import DrumBake
from termdaw_tpu.ops.sampler import sample_multi
from termdaw_tpu.ops.pallas_voices import (
    sample_multi_pallas, make_padded_sample, compute_begin_vel,
)


def test_pallas_voice_mixer_matches_xla(rng):
    nb, bl = 4, 256
    L = 300
    sample = rng.normal(size=(L, 2)).astype(np.float32)
    # overlapping voices, some crossing block boundaries, one pre-window
    drum = DrumBake(
        frames=np.asarray([10, 100, 290, 512, 700], np.int64),
        notes=np.full(5, 36.0, np.float32),
        vels=np.asarray([0.9, 0.5, 0.7, 1.0, 0.3], np.float32),
    )
    carry = MultiCarry(voices=[(-100, 0.8)])  # started before the window
    tbl, _ = bake_sample_multi(drum, carry, 0, nb, bl, L)
    bake = {k: jnp.asarray(v) for k, v in tbl.items()}
    frames = jnp.arange(nb * bl, dtype=jnp.int32)

    ref = jax.jit(
        lambda: sample_multi(jnp.asarray(sample), bake, frames, nb, bl)
    )()

    padded = make_padded_sample(jnp.asarray(sample), bl)
    begins, vels = jax.jit(
        lambda: compute_begin_vel(bake, frames[0], nb, bl, L)
    )()
    got = sample_multi_pallas(padded, begins, vels, nb, bl, interpret=True)

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_pallas_empty_blocks(rng):
    nb, bl, L = 2, 128, 64
    sample = rng.normal(size=(L, 2)).astype(np.float32)
    tbl, _ = bake_sample_multi(
        DrumBake.empty() if hasattr(DrumBake, "empty") else DrumBake(
            np.zeros(0, np.int64), np.zeros(0, np.float32),
            np.zeros(0, np.float32)),
        MultiCarry(), 0, nb, bl, L,
    )
    bake = {k: jnp.asarray(v) for k, v in tbl.items()}
    frames = jnp.arange(nb * bl, dtype=jnp.int32)
    padded = make_padded_sample(jnp.asarray(sample), bl)
    begins, vels = compute_begin_vel(bake, frames[0], nb, bl, L)
    got = sample_multi_pallas(padded, begins, vels, nb, bl, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), 0.0)
