"""Band-pass / band-cut filter: paired 1-pole low+high IIRs.

Reference semantics (extensions.rs:70-79, 173-194, 653-689):

* gamma = 1 - e^(-2*pi*fc/sr), cutoffs clamped to [0, 20kHz]
  (extensions.rs:173-194);
* per frame: ll = lprev + lgamma*(l - lprev) (1-pole LP), hl likewise;
  cut = (lmul*lp + hmul*(x - hp)) * 0.5; pass = x - cut; output selected by
  the pass/cut mode (extensions.rs:671-688);
* first-sample priming: filter states seeded with the first input sample
  (extensions.rs:664-670);
* skip (output = summed input unchanged, state untouched) when wet < 1e-4
  or both gammas are 0 (extensions.rs:657-658). Note the reference's `wet`
  is a pure on/off gate here — there is no dry/wet lerp in band_pass_gen.

**Documented deviation** (required by SURVEY.md §2c): the reference computes
the right pass channel from the LEFT cut value (`passr = r - cutl`,
extensions.rs:685) — a bug. We implement the intended `passr = r - cutr`.

TPU formulation: the 1-pole IIR y[i] = (1-g)*y[i-1] + g*x[i] is a linear
recurrence, evaluated over the whole timeline as a parallel
`associative_scan` over affine maps (A, B): y = A*y_prev + B, composed as
(A2*A1, A2*B1 + B2). Four lanes (low/high x L/R) run in one scan.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp


def gamma_from_cutoff(cut_hz: float, sr: int) -> float:
    """Reference extensions.rs:173-194."""
    fc = min(max(cut_hz, 0.0), 20000.0)
    return 1.0 - math.exp(-2.0 * math.pi * fc / sr)


class BandPassState(NamedTuple):
    prevs: jnp.ndarray  # [4] = (low-L, low-R, high-L, high-R)
    first: jnp.ndarray  # bool scalar

    @staticmethod
    def init() -> "BandPassState":
        return BandPassState(
            prevs=jnp.zeros(4, jnp.float32), first=jnp.asarray(True)
        )


def _affine_combine(left, right):
    a1, b1 = left
    a2, b2 = right
    return a2 * a1, a2 * b1 + b2


_SCAN_TILE = 1024


def tiled_cumulative(combine, identity, elems: tuple) -> tuple:
    """Inclusive cumulative `combine` along axis 0, two-level.

    A flat `associative_scan` over hundreds of thousands of frames produces
    an enormous HLO graph (a band-pass over a 512-block window took ~4.5
    minutes to compile on v5e). Tiling into [R, S] rows, scanning within
    rows, scanning the R row summaries, and composing the exclusive row
    prefix back in keeps both scans short — seconds-fast compiles, same
    prefix. `identity` gives the monoid identity per element (used for tail
    padding and the exclusive shift); combine composes (earlier, later).
    """
    T = elems[0].shape[0]
    S = min(_SCAN_TILE, T)
    R = -(-T // S)
    pad = R * S - T

    def pad_tail(e, ident):
        if not pad:
            return e
        tail = jnp.broadcast_to(
            jnp.asarray(ident, e.dtype), (pad,) + e.shape[1:]
        )
        return jnp.concatenate([e, tail], axis=0)

    tiled = tuple(
        pad_tail(e, idv).reshape((R, S) + e.shape[1:])
        for e, idv in zip(elems, identity)
    )
    cum = jax.lax.associative_scan(combine, tiled, axis=1)
    rows = tuple(c[:, -1] for c in cum)  # [R, ...]
    prow = jax.lax.associative_scan(combine, rows, axis=0)
    excl = tuple(
        jnp.concatenate(
            [jnp.broadcast_to(jnp.asarray(idv, p.dtype), p[:1].shape),
             p[:-1]],
            axis=0,
        )
        for p, idv in zip(prow, identity)
    )
    # compose row-exclusive prefix (earlier) with within-row cum (later)
    out = combine(tuple(e[:, None] for e in excl), cum)
    flat = tuple(o.reshape((R * S,) + o.shape[2:])[:T] for o in out)
    return flat


def affine_cumulative(
    A: jnp.ndarray, B: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Cumulative composition of affine maps y -> A*y + B along axis 0."""
    return tiled_cumulative(_affine_combine, (1.0, 0.0), (A, B))


def first_order_scan(x: jnp.ndarray, a, y0: jnp.ndarray) -> jnp.ndarray:
    """y[i] = a*y[i-1] + b[i] with b given in `x` [T, C]; a broadcastable
    [C]; y0 [C]. Returns y [T, C]."""
    A = jnp.broadcast_to(jnp.asarray(a, jnp.float32), x.shape)
    A_cum, B_cum = affine_cumulative(A, x)
    return A_cum * y0 + B_cum


def band_pass_timeline(
    x: jnp.ndarray,
    state: BandPassState,
    lgamma,
    hgamma,
    pass_mode: bool,
    wet,
    axis_name: str | None = None,
) -> tuple[jnp.ndarray, BandPassState]:
    """Filter a [F, 2] window. Returns (out, new_state).

    lgamma/hgamma/wet are traced scalars; pass_mode is static.

    Under `axis_name` (timeline sharded across devices) the recurrence's
    device boundary is fixed by composing each device's cumulative affine
    map: all devices all-gather their last (A_cum, B_cum), device i seeds
    its local scan with the composition of devices 0..i-1 applied to the
    global initial state, and the final state (composition of all devices)
    is identical everywhere — so the carried state stays replicated.
    """
    lg = jnp.asarray(lgamma, jnp.float32)
    hg = jnp.asarray(hgamma, jnp.float32)
    skip = jnp.logical_or(
        jnp.asarray(wet, jnp.float32) < 0.0001,
        jnp.logical_and(lg == 0.0, hg == 0.0),
    )

    lmul = jnp.where(lg == 0.0, 0.0, 1.0)
    hmul = jnp.where(hg == 0.0, 0.0, 1.0)
    pass_mul = jnp.float32(1.0 if pass_mode else 0.0)
    cut_mul = 1.0 - pass_mul

    if axis_name is None:
        x_first = x[0]
    else:
        # global first sample = device 0's first frame
        x_first = jax.lax.all_gather(x[0], axis_name)[0]
    y0 = jnp.where(state.first, jnp.tile(x_first, 2), state.prevs)  # [4]

    g = jnp.stack([lg, lg, hg, hg])  # [4]
    a = 1.0 - g
    xin = jnp.concatenate([x, x], axis=1)  # [F, 4] lanes lL lR hL hR
    b = g * xin

    A = jnp.broadcast_to(a, b.shape)
    A_cum, B_cum = affine_cumulative(A, b)
    if axis_name is None:
        y = A_cum * y0 + B_cum
        final = y[-1]
    else:
        allA = jax.lax.all_gather(A_cum[-1], axis_name)  # [n_dev, 4]
        allB = jax.lax.all_gather(B_cum[-1], axis_name)
        n_dev = allA.shape[0]
        i = jax.lax.axis_index(axis_name)
        apre = jnp.ones(4, jnp.float32)
        bpre = jnp.zeros(4, jnp.float32)
        for j in range(n_dev):
            take = j < i
            apre2 = allA[j] * apre
            bpre2 = allA[j] * bpre + allB[j]
            apre = jnp.where(take, apre2, apre)
            bpre = jnp.where(take, bpre2, bpre)
        y0_local = apre * y0 + bpre
        y = A_cum * y0_local + B_cum
        # final global state: compose ALL devices (replicated result)
        afin = jnp.ones(4, jnp.float32)
        bfin = jnp.zeros(4, jnp.float32)
        for j in range(n_dev):
            afin, bfin = allA[j] * afin, allA[j] * bfin + allB[j]
        final = afin * y0 + bfin

    lp = y[:, 0:2]
    hp = y[:, 2:4]
    cut = (lmul * lp + hmul * (x - hp)) * 0.5
    pas = x - cut
    out = cut * cut_mul + pas * pass_mul

    out = jnp.where(skip, x, out)
    new_state = BandPassState(
        prevs=jnp.where(skip, state.prevs, final),
        first=jnp.where(skip, state.first, jnp.asarray(False)),
    )
    return out, new_state


# ---------------------------------------------------------------------------
# biquads: true 2nd-order IIR sections as 2x2 matrix affine scans
# ---------------------------------------------------------------------------

def _mat_combine(left, right):
    # Precision.HIGHEST: the default matmul path rounds inputs to bf16,
    # which compounds across the prefix tree (~1e-3 error); see the same
    # note in ops/resample.py
    Ml, vl = left
    Mr, vr = right
    M = jnp.einsum("...ij,...jk->...ik", Mr, Ml,
                   precision=jax.lax.Precision.HIGHEST)
    v = jnp.einsum("...ij,...jc->...ic", Mr, vl,
                   precision=jax.lax.Precision.HIGHEST) + vr
    return M, v


def biquad_coefs(kind: str, fc: float, sr: int, q: float = 0.7071067811865476):
    """RBJ cookbook lowpass/highpass coefficients (b0,b1,b2,a1,a2),
    normalized a0=1. Host-side floats."""
    w0 = 2.0 * math.pi * fc / sr
    cw, sw = math.cos(w0), math.sin(w0)
    alpha = sw / (2.0 * q)
    a0 = 1.0 + alpha
    if kind == "lowpass":
        b0 = (1.0 - cw) / 2.0
        b1 = 1.0 - cw
        b2 = b0
    elif kind == "highpass":
        b0 = (1.0 + cw) / 2.0
        b1 = -(1.0 + cw)
        b2 = b0
    else:
        raise ValueError(kind)
    a1 = -2.0 * cw
    a2 = 1.0 - alpha
    return (b0 / a0, b1 / a0, b2 / a0, a1 / a0, a2 / a0)


def biquad_init_state(channels: int = 2) -> jnp.ndarray:
    """[4, C]: (x[n-1], x[n-2], y[n-1], y[n-2])."""
    return jnp.zeros((4, channels), jnp.float32)


def biquad_apply(
    x: jnp.ndarray, coefs: tuple, state: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Direct-form-1 biquad over a window [T, C]; exact cross-window state.

    The feedback recurrence y[n] = f[n] - a1*y[n-1] - a2*y[n-2] (with the
    feed-forward part f computed in parallel) is a constant-matrix linear
    recurrence on s[n] = (y[n], y[n-1]) and runs as one tiled associative
    scan of 2x2 affine maps.

    Precision note: the parallel prefix of near-unit-circle 2x2 maps
    accumulates ~1e-3 relative error in float32 over long windows — fine
    for musical EQ/crossover use (the first-party effects), not for
    parity-critical paths (which use the scalar one-pole scans).
    """
    b0, b1, b2, a1, a2 = [jnp.float32(c) for c in coefs]
    T, C = x.shape
    x1 = jnp.concatenate([state[0:1], x[:-1]], axis=0)
    x2 = jnp.concatenate([state[1:2], x1[:-1]], axis=0) if T > 1 else \
        jnp.broadcast_to(state[1:2], x.shape)
    f = b0 * x + b1 * x1 + b2 * x2  # [T, C]

    M = jnp.broadcast_to(
        jnp.asarray([[-a1, -a2], [1.0, 0.0]], jnp.float32), (T, 2, 2)
    )
    v = jnp.stack([f, jnp.zeros_like(f)], axis=1)  # [T, 2, C]
    import numpy as _np

    ident = (
        _np.eye(2, dtype=_np.float32),
        _np.zeros((2, 1), _np.float32),
    )
    M_cum, v_cum = tiled_cumulative(_mat_combine, ident, (M, v))
    s0 = jnp.stack([state[2], state[3]], axis=0)  # [2, C]
    Ms0 = jnp.einsum("tij,jc->tic", M_cum, s0,
                     precision=jax.lax.Precision.HIGHEST)
    y = Ms0[:, 0] + v_cum[:, 0]
    y_prev = Ms0[:, 1] + v_cum[:, 1]
    new_state = jnp.stack([x[-1], x1[-1] if T > 1 else state[0],
                           y[-1], y_prev[-1]], axis=0)
    return y, new_state
