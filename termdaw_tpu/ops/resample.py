"""Windowed-sinc sample-rate conversion as an XLA gather/contract kernel.

Replaces the reference's rubato `SincFixedIn` (sample.rs:150-175 on sample
import; state.rs:533-561 on render downsampling) with the same filter recipe:
256-tap sinc, Blackman-Harris window, relative cutoff 0.95, and a 256x
oversampled filter bank with linear interpolation between adjacent phases.

Alignment convention (first-party, documented): output sample n corresponds
exactly to input position n * from/to; the filter is centered (zero group
delay), edges are zero-padded, and the output length is
ceil(len * to / from). When downsampling, the cutoff is scaled by the ratio
to suppress aliasing.

TPU formulation: for each output frame we gather a [taps]-window of the
padded input and contract it with a per-output interpolated filter — a
batched dot that XLA fuses into one pass. Outputs are processed in fixed
tiles via `lax.map` so peak memory stays at tile x taps regardless of length.
The filter bank (257 x 256 float32, ~260 KB) fits in VMEM.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

SINC_LEN = 256
OVERSAMPLE = 256
F_CUTOFF = 0.95
_TILE = 8192


def _blackman_harris(n: int) -> np.ndarray:
    """4-term Blackman-Harris window."""
    x = np.arange(n, dtype=np.float64)
    w = (
        0.35875
        - 0.48829 * np.cos(2 * np.pi * x / (n - 1))
        + 0.14128 * np.cos(4 * np.pi * x / (n - 1))
        - 0.01168 * np.cos(6 * np.pi * x / (n - 1))
    )
    return w


@lru_cache(maxsize=8)
def filter_bank(ratio_key: tuple[int, int]) -> np.ndarray:
    """Oversampled windowed-sinc bank [OVERSAMPLE+1, SINC_LEN] float32.

    Phase p's filter is the sinc centered at (SINC_LEN/2 - 1 + p/OVERSAMPLE)
    so that output position = int_pos + frac maps to a window starting at
    int_pos - (SINC_LEN/2 - 1).
    """
    from_sr, to_sr = ratio_key
    ratio = to_sr / from_sr
    cutoff = F_CUTOFF * min(1.0, ratio)
    half = SINC_LEN // 2
    bank = np.zeros((OVERSAMPLE + 1, SINC_LEN), dtype=np.float64)
    j = np.arange(SINC_LEN, dtype=np.float64)
    for p in range(OVERSAMPLE + 1):
        frac = p / OVERSAMPLE
        # tap j aligns with input offset (j - (half - 1)); the sample point
        # sits `frac` after int_pos, so the sinc argument is:
        x = (j - (half - 1)) - frac
        h = cutoff * np.sinc(cutoff * x)
        # window centered on the sample point
        wpos = (x / SINC_LEN + 0.5) * (SINC_LEN - 1)
        wpos = np.clip(wpos, 0, SINC_LEN - 1)
        win = _bh_at(wpos)
        bank[p] = h * win
    # normalize each phase to unity DC gain so constant signals pass through
    bank /= bank.sum(axis=1, keepdims=True)
    return bank.astype(np.float32)


def _bh_at(x: np.ndarray) -> np.ndarray:
    """Blackman-Harris window evaluated at fractional positions x in
    [0, SINC_LEN-1]."""
    n = SINC_LEN
    return (
        0.35875
        - 0.48829 * np.cos(2 * np.pi * x / (n - 1))
        + 0.14128 * np.cos(4 * np.pi * x / (n - 1))
        - 0.01168 * np.cos(6 * np.pi * x / (n - 1))
    )


@partial(jax.jit, static_argnames=("n_out", "from_sr", "to_sr"))
def _resample_jit(
    xpad: jnp.ndarray, bank: jnp.ndarray, n_out: int, from_sr: int, to_sr: int
) -> jnp.ndarray:
    """xpad: [N + SINC_LEN, C] zero-padded input (SINC_LEN/2-1 leading).
    Returns [n_out_padded, C]; caller trims to n_out."""
    half = SINC_LEN // 2
    n_tiles = -(-n_out // _TILE)
    c = xpad.shape[1]

    def tile_fn(tile_idx):
        n = tile_idx * _TILE + jnp.arange(_TILE)  # output indices [T]
        # input position in exact rational arithmetic: pos = n * from / to
        num = n * from_sr
        int_pos = num // to_sr
        frac = (num % to_sr).astype(jnp.float32) / jnp.float32(to_sr)
        # window start in padded coordinates:
        # unpadded start = int_pos - (half - 1); pad shift = half - 1
        start = int_pos  # [T]
        idx = start[:, None] + jnp.arange(SINC_LEN)[None, :]  # [T, taps]
        idx = jnp.clip(idx, 0, xpad.shape[0] - 1)
        windows = xpad[idx]  # [T, taps, C]
        pf = frac * OVERSAMPLE
        p0 = jnp.floor(pf).astype(jnp.int32)
        w = (pf - p0.astype(jnp.float32))[:, None]
        filt = bank[p0] * (1.0 - w) + bank[p0 + 1] * w  # [T, taps]
        return jnp.einsum(
            "tjc,tj->tc", windows, filt, preferred_element_type=jnp.float32
        )

    tiles = jax.lax.map(tile_fn, jnp.arange(n_tiles))
    return tiles.reshape(n_tiles * _TILE, c)


def resample_sample(x: np.ndarray, from_sr: int, to_sr: int) -> np.ndarray:
    """Resample [N, C] float32 from from_sr to to_sr. Host in/out."""
    x = np.asarray(x, dtype=np.float32)
    if from_sr == to_sr:
        return x
    n = x.shape[0]
    n_out = math.ceil(n * to_sr / from_sr)
    half = SINC_LEN // 2
    xpad = np.zeros((n + SINC_LEN, x.shape[1]), dtype=np.float32)
    xpad[half - 1 : half - 1 + n] = x
    bank = jnp.asarray(filter_bank((from_sr, to_sr)))
    out = _resample_jit(jnp.asarray(xpad), bank, n_out, from_sr, to_sr)
    return np.asarray(out[:n_out])


def resample_device(
    x: jnp.ndarray, from_sr: int, to_sr: int
) -> jnp.ndarray:
    """Device-resident variant for the render path: [N, C] -> [M, C]."""
    if from_sr == to_sr:
        return x
    n = x.shape[0]
    n_out = math.ceil(n * to_sr / from_sr)
    half = SINC_LEN // 2
    xpad = jnp.zeros((n + SINC_LEN, x.shape[1]), jnp.float32)
    xpad = xpad.at[half - 1 : half - 1 + n].set(x)
    bank = jnp.asarray(filter_bank((from_sr, to_sr)))
    out = _resample_jit(xpad, bank, n_out, from_sr, to_sr)
    return out[:n_out]
