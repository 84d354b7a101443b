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

import contextlib
import contextvars
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
        # one shared immutable template: init() runs per BandPass vertex
        # on every set_time (once per render), and the two eager device
        # ops cost ~0.1 ms each through the remote-dispatch tunnel
        global _BP_INIT
        if _BP_INIT is None:
            _BP_INIT = BandPassState(
                prevs=jnp.zeros(4, jnp.float32), first=jnp.asarray(True)
            )
        return _BP_INIT


_BP_INIT: BandPassState | None = None


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


# ---------------------------------------------------------------------------
# cross-device boundary composition (sequence-parallel effects)
# ---------------------------------------------------------------------------

def exclusive_total(combine, identity, summary: tuple, axis_name: str):
    """For a monoid scan sharded over `axis_name`: given each device's
    LOCAL fold `summary` (tuple of arrays, device-local), return

      pre — the fold of all earlier devices' summaries (identity on dev 0),
      tot — the fold of every device's summary (replicated).

    `pre` applied to the carried global initial state seeds each device's
    local scan; `tot` applied to it is the next window's carried state —
    the same trick band_pass_timeline uses, generalized to any monoid
    (affine, max-decay, 2x2-matrix). Gathered data is one summary per
    device: tiny, rides ICI."""
    gathered = tuple(jax.lax.all_gather(s, axis_name) for s in summary)
    n = gathered[0].shape[0]
    i = jax.lax.axis_index(axis_name)
    pre = tuple(
        jnp.broadcast_to(jnp.asarray(idv, g.dtype), g.shape[1:])
        for idv, g in zip(identity, gathered)
    )
    tot = pre
    for j in range(n):
        sj = tuple(g[j] for g in gathered)
        pre_j = combine(pre, sj)
        pre = tuple(
            jnp.where(j < i, pj, p) for pj, p in zip(pre_j, pre)
        )
        tot = combine(tot, sj)
    return pre, tot


def first_order_scan_sharded(
    x: jnp.ndarray, a, y0: jnp.ndarray, axis_name: str | None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """First-order IIR scan y[i] = a*y[i-1] + x[i]: returns (y_local [T, C],
    y_final_global [C]) — the final state is the GLOBAL stream's last
    value, replicated, so carried state stays consistent."""
    A = jnp.broadcast_to(jnp.asarray(a, jnp.float32), x.shape)
    A_cum, B_cum = affine_cumulative(A, x)
    if axis_name is None:
        y = A_cum * y0 + B_cum
        return y, y[-1]
    (a_pre, b_pre), (a_tot, b_tot) = exclusive_total(
        lambda l, r: _affine_combine(l, r), (1.0, 0.0),
        (A_cum[-1], B_cum[-1]), axis_name,
    )
    y0_local = a_pre * y0 + b_pre
    y = A_cum * y0_local + B_cum
    return y, a_tot * y0 + b_tot


def prev_frames(
    x: jnp.ndarray, tail: jnp.ndarray, axis_name: str | None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """The M frames of the global stream immediately preceding this
    device's local slice, plus the global stream's new last-M tail
    (replicated). M = tail.shape[0]. Single-device: (tail, updated tail).

    Feeds delayed reads (chorus/flanger/allpass x[t-D]) under timeline
    sharding: with local T >= M only neighbors' last M frames are needed
    (one all_gather of M frames per device); with T < M (tiny dryrun
    shapes) the full local slices are gathered."""
    T, C = x.shape
    M = tail.shape[0]
    if axis_name is None:
        xcat = jnp.concatenate([tail, x], axis=0)
        return tail, jax.lax.dynamic_slice_in_dim(xcat, T, M, axis=0)
    i = jax.lax.axis_index(axis_name)
    if T >= M:
        gathered = jax.lax.all_gather(x[-M:], axis_name)  # [n, M, C]
        halo = jnp.where(i == 0, tail, gathered[jnp.maximum(i - 1, 0)])
        return halo, gathered[-1]
    allx = jax.lax.all_gather(x, axis_name)  # [n, T, C]
    n = allx.shape[0]
    flat = jnp.concatenate([tail, allx.reshape(n * T, C)], axis=0)
    halo = jax.lax.dynamic_slice(flat, (i * T, jnp.int32(0)), (M, C))
    return halo, flat[-M:]


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
# biquads: 2nd-order IIR sections as a cascade of two 1st-order complex scans
# ---------------------------------------------------------------------------

def _caffine_combine(left, right):
    """Compose complex affine maps u -> A*u + B written ELEMENTWISE as 4
    real lanes (ar, ai, br, bi), each [..., C].

    Elementwise f32 lane math instead of complex64 / batched tiny einsums:
    [T, 2, 2] matmuls at Precision.HIGHEST lowered to a ~50x-slower program
    on this TPU (1.7 s for an 8-biquad EQ window) — and full f32 multiplies
    here are exactly what HIGHEST emulates, so accuracy is unchanged."""
    ar1, ai1, br1, bi1 = left
    ar2, ai2, br2, bi2 = right
    return (
        ar2 * ar1 - ai2 * ai1,
        ar2 * ai1 + ai2 * ar1,
        ar2 * br1 - ai2 * bi1 + br2,
        ar2 * bi1 + ai2 * br1 + bi2,
    )


_CAFF_IDENT = (1.0, 0.0, 0.0, 0.0)


def _first_order_complex(
    f_r: jnp.ndarray, f_i: jnp.ndarray, pr, pi, s_r, s_i,
    axis_name: str | None,
):
    """u[n] = p*u[n-1] + f[n] with u[-1] = s, all complex as (re, im) real
    lanes; f [T, C], p and s broadcastable to [C].

    Returns (u_r, u_i, ufin_r, ufin_i): the full window and the global
    final value. Under `axis_name` (timeline-sharded) the per-device affine
    summaries are boundary-composed across devices (exclusive_total); the
    final value is the global stream's, replicated."""
    shape = f_r.shape
    elems = (
        jnp.broadcast_to(jnp.asarray(pr, jnp.float32), shape),
        jnp.broadcast_to(jnp.asarray(pi, jnp.float32), shape),
        f_r, f_i,
    )
    ar, ai, br, bi = tiled_cumulative(_caffine_combine, _CAFF_IDENT, elems)

    def apply(m, vr, vi):
        mar, mai, mbr, mbi = m
        return mar * vr - mai * vi + mbr, mar * vi + mai * vr + mbi

    if axis_name is None:
        u_r = ar * s_r - ai * s_i + br
        u_i = ar * s_i + ai * s_r + bi
        return u_r, u_i, u_r[-1], u_i[-1]
    last = (ar[-1], ai[-1], br[-1], bi[-1])
    pre, tot = exclusive_total(
        _caffine_combine, _CAFF_IDENT, last, axis_name
    )
    # seed entering THIS device's slice = earlier devices' composition
    # applied to the global seed; global final = total composition of the
    # global seed (replicated on every device)
    l_r, l_i = apply(pre, s_r, s_i)
    u_r = ar * l_r - ai * l_i + br
    u_i = ar * l_i + ai * l_r + bi
    ufin_r, ufin_i = apply(tot, s_r, s_i)
    return u_r, u_i, ufin_r, ufin_i


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


def biquad_apply_sequential(
    x: jnp.ndarray, coefs: tuple, state: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact-order sequential biquad: the same recurrence as biquad_apply
    evaluated frame-by-frame with a `lax.scan`, reproducing a per-frame
    float32 reference bit-for-bit (no parallel-prefix reassociation).

    This is the precision lane for parity-critical use (VERDICT weak 10):
    the parallel prefix in biquad_apply accumulates ~1e-3 relative error
    over long windows near the unit circle; this one is O(T) sequential
    (orders of magnitude slower on TPU — use it for verification or when
    an effect must sit on a parity-critical path, selected via
    TERMDAW_EXACT_BIQUAD=1, read at trace time)."""
    b0, b1, b2, a1, a2 = [jnp.asarray(c, jnp.float32) for c in coefs]

    def step(s, xt):
        x1, x2, y1, y2 = s
        y = b0 * xt + b1 * x1 + b2 * x2 - a1 * y1 - a2 * y2
        return (xt, x1, y, y1), y

    s0 = (state[0], state[1], state[2], state[3])
    (x1, x2, y1, y2), ys = jax.lax.scan(step, s0, x)
    return ys, jnp.stack([x1, x2, y1, y2], axis=0)


# Pinned by CompiledGraph for the duration of a render call: the compiled
# graph reads TERMDAW_EXACT_BIQUAD once at build and folds it into its
# program-cache spec, then pins this override while tracing so a mid-process
# env toggle can neither serve a stale compiled program nor trace
# inconsistently with the cache key. A ContextVar (not a module global,
# VERDICT r3 weak 8): interleaved or concurrent renders from graphs built
# with different settings each trace under their own pinned value.
_EXACT_BIQUAD_OVERRIDE: contextvars.ContextVar[bool | None] = (
    contextvars.ContextVar("exact_biquad_override", default=None)
)


@contextlib.contextmanager
def exact_biquad_scope(value: bool):
    """Pin the biquad evaluation strategy for the calls traced inside."""
    token = _EXACT_BIQUAD_OVERRIDE.set(bool(value))
    try:
        yield
    finally:
        _EXACT_BIQUAD_OVERRIDE.reset(token)


def exact_biquad_env() -> bool:
    import os

    return os.environ.get("TERMDAW_EXACT_BIQUAD", "0") == "1"


def _exact_biquad() -> bool:
    pinned = _EXACT_BIQUAD_OVERRIDE.get()
    if pinned is not None:
        return pinned
    return exact_biquad_env()


def biquad_apply(
    x: jnp.ndarray, coefs: tuple, state: jnp.ndarray,
    axis_name: str | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Direct-form-1 biquad over a window [T, C]; exact cross-window state.

    `coefs` = (b0, b1, b2, a1, a2), each a scalar or a per-channel [C]
    array — per-channel coefficients let independent filter branches run
    batched in one scan (the 3-band EQ runs its whole LR4 tree as 4
    stages of a 4-channel biquad).

    The feedback recurrence y[n] = f[n] - a1*y[n-1] - a2*y[n-2] (with the
    feed-forward part f computed in parallel) is factored into a CASCADE of
    two first-order complex recurrences through the section's poles p1, p2
    (roots of z^2 + a1 z + a2):

        u[n] = p1*u[n-1] + f[n],    y[n] = p2*y[n-1] + u[n]

    each evaluated as one tiled associative scan of complex affine maps in
    real-lane form (_caffine_combine). This is dramatically better
    conditioned in float32 than the equivalent single 2x2-matrix scan: the
    matrix prefix products of a near-unit-circle section (e.g. a 120 Hz
    highpass at 48 kHz) amplify rounding by the ~n*r^n transient growth of
    the DOUBLE pole and were measured at ~0.24 max relative error over a
    32k window; the cascade's scalar products decay monotonically (|p|<1)
    and measure ~3e-5 on the same section (see
    tests/test_fx.py::TestBuildingBlocks). For bit-exact per-frame order
    (verification, parity-critical paths) set TERMDAW_EXACT_BIQUAD=1 —
    the sequential lane (biquad_apply_sequential) is used instead.

    Under `axis_name` (timeline-sharded) the feed-forward taps come from a
    2-frame halo exchange (prev_frames) and each scan's seed is
    boundary-composed across devices (exclusive_total); the returned state
    is the global stream's, replicated.
    """
    if axis_name is None and _exact_biquad():
        return biquad_apply_sequential(x, coefs, state)
    b0, b1, b2, a1, a2 = [
        jnp.asarray(c, jnp.float32) for c in coefs
    ]
    T, C = x.shape
    if axis_name is None:
        x1 = jnp.concatenate([state[0:1], x[:-1]], axis=0)
        x2 = jnp.concatenate([state[1:2], x1[:-1]], axis=0) if T > 1 else \
            jnp.broadcast_to(state[1:2], x.shape)
        new_x1, new_x2 = x[-1], (x1[-1] if T > 1 else state[0])
    else:
        # halo: the 2 global-stream frames before this device's slice
        halo, new_tail = prev_frames(
            x, jnp.stack([state[1], state[0]]), axis_name
        )
        xcat = jnp.concatenate([halo, x], axis=0)  # [T+2, C]
        x1 = xcat[1 : T + 1]
        x2 = xcat[0:T]
        new_x1, new_x2 = new_tail[1], new_tail[0]
    f = b0 * x + b1 * x1 + b2 * x2  # [T, C]

    # poles of z^2 + a1 z + a2 (complex-conjugate for Butterworth-q
    # sections, real for overdamped ones — the same lane math covers both)
    disc = a1 * a1 - 4.0 * a2
    sq = jnp.sqrt(jnp.abs(disc))
    is_real = disc >= 0.0
    p1r = jnp.where(is_real, (-a1 + sq) * 0.5, -a1 * 0.5)
    p1i = jnp.where(is_real, 0.0, sq * 0.5)
    p2r = jnp.where(is_real, (-a1 - sq) * 0.5, -a1 * 0.5)
    p2i = -p1i

    y1, y2 = state[2], state[3]  # y[n-1], y[n-2], each [C]
    # u[-1] = y[-1] - p2*y[-2] (from y[n] = p2*y[n-1] + u[n])
    u0r = y1 - p2r * y2
    u0i = -p2i * y2
    u_r, u_i, ufin_r, ufin_i = _first_order_complex(
        f, jnp.zeros_like(f), p1r, p1i, u0r, u0i, axis_name
    )
    y_r, y_i, yfin_r, yfin_i = _first_order_complex(
        u_r, u_i, p2r, p2i, y1, jnp.zeros_like(y1), axis_name
    )
    # y is real by construction; the imaginary lane carries only rounding
    new_y1 = yfin_r
    if axis_name is None:
        new_y2 = y_r[-2] if T > 1 else state[2]
    else:
        # the global y[T-2] isn't local to this device; recover it from
        # y[T-1] = p2*y[T-2] + u[T-1] with a magnitude-clamped complex
        # division (|p2|^2 = a2 -> tiny only when the section is nearly
        # first-order, where y[n-2]'s a2 weight vanishes anyway)
        dr, di = yfin_r - ufin_r, yfin_i - ufin_i
        den = jnp.maximum(p2r * p2r + p2i * p2i, 1e-12)
        new_y2 = (dr * p2r + di * p2i) / den
    new_state = jnp.stack([new_x1, new_x2, new_y1, new_y2], axis=0)
    return y_r, new_state
