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
    T = frames.shape[0]
    t = frames  # [T]
    f0 = frames[0]
    denom = float(max(lerp_len, 1))

    # Segment-slice formulation: within a segment (between triggers) the
    # sample positions t - start are CONSECUTIVE, so each voice is a
    # dynamic slice of a hold-extended sample instead of a per-frame
    # gather (per-element gathers cost ~10x the whole vertex's remaining
    # work on this TPU). ext = [sample[0]]*T ++ sample ++ [sample[-1]]*T
    # realizes the position clamp at both ends; slice offset
    # T + f0 - start lands every in-window position correctly for any
    # start (clamped offsets only occur in masked-out segments).
    C = sample.shape[1]
    ext = jnp.concatenate(
        [
            jnp.broadcast_to(sample[0:1], (T, C)),
            sample,
            jnp.broadcast_to(sample[L - 1 : L], (T, C)),
        ],
        axis=0,
    )  # [2T + L, C]
    bounds = bake["bounds"]  # [B] int32, INF_FRAME-padded
    B = bounds.shape[0]
    n_bounds = bake["n_bounds"]  # real segment boundaries
    S = bake["p_starts"].shape[0]  # padded segment count
    INF = jnp.int32(2**31 - 1)
    NEG = jnp.int32(-(2**31) + 1)

    def voice(start_s):
        off = jnp.clip(T + f0 - start_s, 0, T + L)
        return jax.lax.dynamic_slice(ext, (off, jnp.int32(0)), (T, C))

    def body(s, acc):
        lo = jnp.where(
            s == 0, NEG,
            jnp.where(
                s - 1 < n_bounds,
                bounds[jnp.clip(s - 1, 0, B - 1)], INF,
            ),
        )
        hi = jnp.where(s < n_bounds, bounds[jnp.clip(s, 0, B - 1)], INF)
        p = voice(bake["p_starts"][s]) * bake["p_vels"][s]
        g = voice(bake["g_starts"][s]) * bake["g_vels"][s]
        cd = bake["cd_init"][s] - (t - bake["cd_anchor"][s])
        fade = cd > 0
        tc = jnp.clip((cd - 1).astype(jnp.float32) / denom, 0.0, 1.0)
        blend = g * tc[:, None] + p * (1.0 - tc[:, None])
        val = jnp.where(fade[:, None], blend, p)
        mask = ((t >= lo) & (t < hi))[:, None]
        return acc + jnp.where(mask, val, 0.0)

    return jax.lax.fori_loop(
        0, S, body, jnp.zeros((T, C), jnp.float32)
    )
