"""Sample-playback window kernels: SampleLoop, SampleMulti, SampleLerp.

Each renders a whole window of frames in one shot from baked instance /
segment tables (graph/bake.py) — the reference's per-frame voice loops
(extensions.rs:331-421) become gathers + masked reductions that XLA fuses
and tiles onto the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp



def sample_loop(sample: jnp.ndarray, frames: jnp.ndarray) -> jnp.ndarray:
    """Loop the bank sample with modulo indexing (extensions.rs:331-341).
    sample [L, 2], frames [T] int32 -> [T, 2].

    Formulated gather-free for TPU: tile the sample to cover T+L frames
    (pure bandwidth) and dynamic-slice at frames[0] mod L — frames are
    always contiguous within a window."""
    L = sample.shape[0]
    T = frames.shape[0]
    reps = -(-(T + L) // L)
    tiled = jnp.tile(sample, (reps, 1))
    start = jnp.mod(frames[0], L)
    return jax.lax.dynamic_slice(tiled, (start, 0), (T, 2))


def sample_multi(
    sample: jnp.ndarray,
    bake: dict[str, jnp.ndarray],
    frames: jnp.ndarray,
    nb: int,
    bl: int,
) -> jnp.ndarray:
    """Polyphonic one-shot voices (extensions.rs:343-381): every active
    voice p in block k contributes sample[t - start_p] * vel_p; overlapping
    voices sum; finished voices are masked out (the reference pops them)."""
    L = sample.shape[0]
    idx = bake["idx"]  # [nb, P]
    starts = bake["starts"][idx]
    vels = bake["vels"][idx]
    valid = idx >= 0
    f = frames.reshape(nb, bl)
    pos = f[:, :, None] - starts[:, None, :]  # [nb, bl, P]
    mask = valid[:, None, :] & (pos >= 0) & (pos < L)
    posc = jnp.clip(pos, 0, L - 1)
    smp = sample[posc]  # [nb, bl, P, 2]
    w = jnp.where(mask, vels[:, None, :], 0.0)
    out = jnp.sum(smp * w[..., None], axis=2)
    return out.reshape(-1, 2)


def sample_lerp(
    sample: jnp.ndarray,
    bake: dict[str, jnp.ndarray],
    frames: jnp.ndarray,
    lerp_len: int,
) -> jnp.ndarray:
    """Monophonic retrigger with a linear crossfade between the previous
    (ghost) and current (primary) voice (extensions.rs:383-421). Positions
    clamp at the sample end (the last frame holds). The countdown c starts
    at lerp_len on each trigger and decrements before use, so d frames
    after a trigger the ghost weight is (lerp_len-1-d)/lerp_len while
    d < lerp_len."""
    L = sample.shape[0]
    t = frames  # [T]
    seg = jnp.searchsorted(bake["bounds"], t, side="right")  # [T]
    p_start = bake["p_starts"][seg]
    p_vel = bake["p_vels"][seg]
    g_start = bake["g_starts"][seg]
    g_vel = bake["g_vels"][seg]
    ppos = jnp.clip(t - p_start, 0, L - 1)
    gpos = jnp.clip(t - g_start, 0, L - 1)
    p = sample[ppos] * p_vel[:, None]
    g = sample[gpos] * g_vel[:, None]
    cd = bake["cd_init"][seg] - (t - bake["cd_anchor"][seg])
    fade = cd > 0
    denom = float(max(lerp_len, 1))
    tc = jnp.clip((cd - 1).astype(jnp.float32) / denom, 0.0, 1.0)
    blend = g * tc[:, None] + p * (1.0 - tc[:, None])
    return jnp.where(fade[:, None], blend, p)
