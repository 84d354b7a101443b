"""Pallas TPU kernel: polyphonic voice mixing (SampleMulti's hot loop).

The XLA formulation of SampleMulti gathers sample[t - start_p] per
(frame, voice) — [nb, bl, P, 2] random gathers, which lower poorly on TPU
(measured ~25% of a full-graph render). But each voice's reads within one
block are a CONTIGUOUS sample slice, so the natural TPU kernel is:

    grid = (nb,)  — one program per block
    for each voice slot p: DMA sample[begin_p : begin_p + bl] HBM->VMEM
    (double-buffered), multiply by the voice velocity, accumulate.

Layout: channel-major [2, L] so the minor dimension is the frame axis
(lane-aligned multiples of 128); the sample is pre-padded with `bl` zeros
on both sides so every active voice's slice is in-bounds and out-of-span
frames read zeros. Host-side bake provides per-block (begin, vel) tables
(begin pre-clamped; empty slots carry vel 0 and a safe begin).

Used on the TPU backend; the XLA gather path (ops/sampler.py) remains the
reference implementation and the fallback elsewhere. Equivalence is tested
in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_LANE = 128  # Mosaic requires lane-dim DMA offsets aligned to the tiling

# The three scalar-prefetch tables ([nb, P] each: begins + L/R amps) live
# in SMEM, which is 1 MB on v5e, PADDED to 8 sublanes x 128 lanes: each
# costs roundup(nb,8) * roundup(P,128) * 4 bytes (measured: [1875,16]
# tables allocate 940 KB apiece, 3x over budget, failing compile with an
# opaque "Ran out of memory in memory space smem" error — long windows or
# >128-voice polyphony both get there). Above this budget the wrapper
# splits the block axis across several pallas_calls instead; output is
# identical (blocks are independent in this kernel).
_SMEM_BUDGET_BYTES = 900 * 1024


def _prefetch_bytes(nb: int, P: int) -> int:
    return 3 * -(-nb // 8) * 8 * -(-P // 128) * 128 * 4


def _voice_mix_kernel(
    begins_ref,  # scalar-prefetch [nb, P] int32 (begin index into padded)
    velsl_ref,   # scalar-prefetch [nb, P] float32 (left-channel amp)
    velsr_ref,   # scalar-prefetch [nb, P] float32 (right-channel amp)
    sample_ref,  # [2, Lpad] in ANY/HBM
    out_ref,     # [2, bl] VMEM
    scratch,     # [2, 2, bl + LANE] VMEM double buffer
    sems,        # DMA semaphores [2]
    *,
    P: int,
    bl: int,
):
    k = pl.program_id(0)

    def dma(slot, p):
        # DMA an aligned superset window [aligned, aligned + bl + LANE) and
        # rotate the sub-lane remainder away in VMEM (dynamic lane-dim DMA
        # offsets must be 128-aligned on TPU)
        aligned = (begins_ref[k, p] // _LANE) * _LANE
        return pltpu.make_async_copy(
            sample_ref.at[:, pl.ds(aligned, bl + _LANE)],
            scratch.at[slot],
            sems.at[slot],
        )

    dma(0, 0).start()
    out_ref[:] = jnp.zeros_like(out_ref)
    for p in range(P):
        slot = p % 2
        if p + 1 < P:
            dma((p + 1) % 2, p + 1).start()
        dma(slot, p).wait()
        rem = begins_ref[k, p] % _LANE
        # positive-equivalent rotate: Mosaic's dynamic roll mis-rotates
        # NEGATIVE shifts on non-power-of-two widths (verified on v5e)
        window = pltpu.roll(scratch[slot], (bl + _LANE) - rem, axis=1)[:, :bl]
        amp = jnp.stack([velsl_ref[k, p], velsr_ref[k, p]])[:, None]
        out_ref[:] = out_ref[:] + window * amp


def sample_multi_pallas_stereo(
    sample_padded: jnp.ndarray,  # [2, Lpad] float32 (see make_padded_sample)
    begins: jnp.ndarray,         # [nb, P] int32, pre-clamped in-bounds
    vels_l: jnp.ndarray,         # [nb, P] float32 left amp (0 = empty slot)
    vels_r: jnp.ndarray,         # [nb, P] float32 right amp
    nb: int,
    bl: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns mixed voices [nb*bl, 2] with per-voice per-channel amps.

    The per-channel amps let a whole group of SampleMulti vertices fuse
    into ONE kernel call: each vertex's constant-power pan + gain
    (mix.post, linear per channel) folds into its voices' amps, so a
    64-track mix is one invocation instead of 64 (graph/compile.py
    fused groups)."""
    P = begins.shape[1]
    nb_max = nb
    while nb_max > 1 and _prefetch_bytes(nb_max, P) > _SMEM_BUDGET_BYTES:
        nb_max = -(-nb_max // 2)
    if nb > nb_max:
        # split the block axis to keep the SMEM prefetch tables in budget;
        # blocks are independent, so concatenation is exact
        parts = []
        for b0 in range(0, nb, nb_max):
            n = min(nb_max, nb - b0)
            parts.append(_pallas_one_call(
                sample_padded, begins[b0:b0 + n], vels_l[b0:b0 + n],
                vels_r[b0:b0 + n], n, bl, interpret,
            ))
        return jnp.concatenate(parts, axis=0)
    return _pallas_one_call(
        sample_padded, begins, vels_l, vels_r, nb, bl, interpret
    )


@functools.partial(
    jax.jit, static_argnames=("nb", "bl", "interpret")
)
def _pallas_one_call(
    sample_padded, begins, vels_l, vels_r, nb: int, bl: int,
    interpret: bool = False,
) -> jnp.ndarray:
    P = begins.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (2, bl), lambda k, *_: (0, k), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 2, bl + 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_voice_mix_kernel, P=P, bl=bl),
        out_shape=jax.ShapeDtypeStruct((2, nb * bl), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(begins, vels_l, vels_r, sample_padded)
    return out.T  # [nb*bl, 2]


def sample_multi_pallas(
    sample_padded: jnp.ndarray,
    begins: jnp.ndarray,
    vels: jnp.ndarray,
    nb: int,
    bl: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Single-vertex entry: equal channel amps."""
    return sample_multi_pallas_stereo(
        sample_padded, begins, vels, vels, nb, bl, interpret=interpret
    )


def make_padded_sample(sample: jnp.ndarray, bl: int) -> jnp.ndarray:
    """[L, 2] -> channel-major zero-padded [2, bl + L + bl + 256].

    Left pad bl (voices triggered mid-block read "before" the sample);
    right pad bl + 256 so the aligned superset DMA window of the largest
    begin (L + bl) stays in bounds."""
    return jnp.pad(sample.T, ((0, 0), (bl, bl + 256)))


def compute_begin_vel(
    bake: dict, frames0, nb: int, bl: int, sample_len: int
):
    """Per-block (begin, vel) tables from the SampleMulti bake.

    begin = (block_start - voice_start) + bl in padded coordinates, clamped
    in-bounds; empty slots get vel 0. Runs inside the jitted program (tiny).
    """
    idx = bake["idx"]  # [nb, P]
    starts = bake["starts"][idx]
    vels = jnp.where(idx >= 0, bake["vels"][idx], 0.0)
    block_starts = frames0 + jnp.arange(nb, dtype=jnp.int32) * bl  # [nb]
    off = block_starts[:, None] - starts  # [nb, P]
    begins = jnp.clip(off + bl, 0, sample_len + bl)
    return begins.astype(jnp.int32), vels.astype(jnp.float32)
