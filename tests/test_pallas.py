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


def test_pallas_smem_chunking_exact(rng, monkeypatch):
    """Above the SMEM prefetch budget the wrapper splits the block axis
    across several pallas_calls; the result must be bit-identical to the
    single-call kernel (blocks are independent)."""
    from termdaw_tpu.ops import pallas_voices as pv

    nb, bl, L, P = 6, 128, 400, 4
    sample = rng.normal(size=(L, 2)).astype(np.float32)
    drum = DrumBake(
        frames=np.asarray([0, 60, 150, 300, 500, 640], np.int64),
        notes=np.full(6, 36.0, np.float32),
        vels=rng.uniform(0.3, 1.0, 6).astype(np.float32),
    )
    tbl, _ = bake_sample_multi(drum, MultiCarry(), 0, nb, bl, L,
                               {"p": P, "n": 8})
    bake = {k: jnp.asarray(v) for k, v in tbl.items()}
    frames = jnp.arange(nb * bl, dtype=jnp.int32)
    padded = make_padded_sample(jnp.asarray(sample), bl)
    begins, vels = compute_begin_vel(bake, frames[0], nb, bl, L)
    one = sample_multi_pallas(padded, begins, vels, nb, bl, interpret=True)
    # force chunking: budget of one block's tables -> 6 separate calls
    monkeypatch.setattr(pv, "_SMEM_BUDGET_BYTES", 12 * begins.shape[1])
    chunked = sample_multi_pallas(
        padded, begins, vels, nb, bl, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(chunked), np.asarray(one))


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


def test_fused_group_matches_unfused(tmp_path, monkeypatch, rng):
    """Several SampleMulti vertices feeding one sum must fuse into a single
    stereo kernel call (interpret mode) and match the XLA per-vertex path
    including per-vertex pan/gain (folded into voice amps)."""
    import sys
    from pathlib import Path

    from termdaw_tpu.config import Config
    from termdaw_tpu.engine.state import State
    from termdaw_tpu.fileio.wav import write_wav
    from termdaw_tpu.fileio.midi import write_midi

    sr, bl = 8000, 256
    for name, f in [("a", 300.0), ("b", 800.0)]:
        t = np.arange(int(sr * 0.12)) / sr
        x = (0.7 * np.sin(2 * np.pi * f * t) * np.exp(-t * 12)).astype(
            np.float32
        )
        write_wav(tmp_path / f"{name}.wav", np.stack([x, x], 1), sr, bits=16)
    write_midi(tmp_path / "m.mid",
               [(i * 0.11, 0.05, 36, 90 + i) for i in range(8)], bpm=120)
    (tmp_path / "project.toml").write_text(
        '[settings]\nmain = "project.lua"\nbuffer_length = 256\n'
        f"project_samplerate = {sr}\n"
    )
    (tmp_path / "project.lua").write_text(f"""
set_length(1.0);
load_midi_floww("m", "{tmp_path}/m.mid");
load_sample("a", "{tmp_path}/a.wav", "");
load_sample("b", "{tmp_path}/b.wav", "");
add_sample_multi("t1", 1.3, -40.0, "a", "m", -1);
add_sample_multi("t2", 0.7, 25.0, "b", "m", -1);
add_sample_multi("t3", 1.0, 0.0, "a", "m", -1);
add_normalize("sum", 1.0, 0.0);
connect("t1", "sum");
connect("t2", "sum");
connect("t3", "sum");
set_output("sum");
""")

    def render(env):
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        st = State(Config.read(tmp_path / "project.toml"), str(tmp_path))
        st.refresh()
        assert st.loaded
        st.fb.set_time(0)
        out = np.asarray(st.compiled.render_window(st.fb, 8))
        return st, out

    # reference: the XLA gather path (TERMDAW_PALLAS=0 — note in-process
    # JAX_PLATFORMS=cpu does NOT stick on this harness, the suite runs on
    # whatever backend the env provides)
    st_x, ref = render(
        {"TERMDAW_PALLAS": "0", "TERMDAW_PALLAS_INTERPRET": "0"}
    )
    assert not st_x.compiled.fused_groups
    st_p, got = render({"TERMDAW_PALLAS_INTERPRET": "1"})
    # the 3 vertices (2 distinct samples) must actually be one group
    assert list(st_p.compiled.fused_groups.values())[0] == tuple(
        sorted(st_p.compiled._fused_members)
    )
    assert len(st_p.compiled._fused_members) == 3
    np.testing.assert_allclose(got, ref, atol=2e-5)
