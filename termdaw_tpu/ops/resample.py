"""Windowed-sinc sample-rate conversion, MXU-native.

Replaces the reference's rubato `SincFixedIn` (sample.rs:150-175 import
path; state.rs:533-561 render downsampling) with the same filter recipe —
256-tap sinc, Blackman-Harris window, cutoff 0.95 (scaled by the ratio when
downsampling) — formulated for TPU:

**Polyphase convolution** (the fast path, used whenever the reduced ratio
L/M has L <= 4096 — true for every musical rate pair): output phase
p in [0, L) reads the input window at offset floor(p*M/L) with fractional
delay (p*M mod L)/L. Packing each phase's exact sinc into one kernel row at
its offset turns the whole resample into a single
`lax.conv_general_dilated` with stride M and L output channels — a dense
matmul on the MXU, no gathers. Filters are computed exactly per phase in
float64 on the host (no oversampled-bank interpolation needed) and cached.

A gather-based fallback (oversampled bank + linear interpolation, rubato
style) covers pathological ratios.

Alignment convention (first-party, documented): output sample n
corresponds exactly to input position n*M/L; the filter is centered (zero
group delay), edges are zero-padded, output length = ceil(len*L/M).
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
MAX_PHASES = 4096
_TILE = 8192


def _window_at(x: np.ndarray) -> np.ndarray:
    """4-term Blackman-Harris evaluated at tap positions x (centered
    coordinates, window support [-SINC_LEN/2, SINC_LEN/2])."""
    n = SINC_LEN
    wpos = np.clip((x / n + 0.5) * (n - 1), 0, n - 1)
    return (
        0.35875
        - 0.48829 * np.cos(2 * np.pi * wpos / (n - 1))
        + 0.14128 * np.cos(4 * np.pi * wpos / (n - 1))
        - 0.01168 * np.cos(6 * np.pi * wpos / (n - 1))
    )


def _exact_filter(frac: float, cutoff: float) -> np.ndarray:
    """Exact windowed-sinc for one fractional delay, unity DC gain."""
    j = np.arange(SINC_LEN, dtype=np.float64)
    x = (j - (SINC_LEN // 2 - 1)) - frac
    h = cutoff * np.sinc(cutoff * x) * _window_at(x)
    return h / h.sum()


@lru_cache(maxsize=16)
def polyphase_kernel(from_sr: int, to_sr: int) -> tuple[np.ndarray, int, int]:
    """Conv kernel [L, 1, K] for the polyphase formulation + (L, M).

    Row p holds phase p's exact 256-tap filter placed at offset
    floor(p*M/L) within the K = (M-1) + SINC_LEN window."""
    g = math.gcd(from_sr, to_sr)
    L, M = to_sr // g, from_sr // g
    ratio = to_sr / from_sr
    cutoff = F_CUTOFF * min(1.0, ratio)
    K = (M - 1) + SINC_LEN
    w = np.zeros((L, 1, K), dtype=np.float64)
    for p in range(L):
        off = (p * M) // L
        frac = (p * M % L) / L
        w[p, 0, off : off + SINC_LEN] = _exact_filter(frac, cutoff)
    return w.astype(np.float32), L, M


@partial(jax.jit, static_argnames=("from_sr", "to_sr", "n_out"))
def _polyphase_jit(
    x: jnp.ndarray, from_sr: int, to_sr: int, n_out: int
) -> jnp.ndarray:
    """x [N, C] -> [n_out, C] as ONE matmul on the MXU.

    Row q of the window matrix X[q] = xpad[q*M : q*M + K] is built with
    ceil(K/M) shifted reshapes (pure layout ops, no gather); the resample
    is then X[Q, K] @ W[K, L] -> out[Q, L] -> flatten phases."""
    w, L, M = polyphase_kernel(from_sr, to_sr)
    n = x.shape[0]
    c = x.shape[1]
    q = -(-n_out // L)  # output rows
    half = SINC_LEN // 2
    k = w.shape[2]
    lead = half - 1
    n_slabs = -(-k // M)
    need = (q - 1) * M + n_slabs * M  # room for the slab construction
    trail = max(0, need - lead - n)
    xp = jnp.pad(x, ((lead, trail), (0, 0)))  # [W, C]
    slabs = [
        jax.lax.dynamic_slice_in_dim(xp, s * M, q * M, axis=0).reshape(q, M, c)
        for s in range(n_slabs)
    ]
    X = jnp.concatenate(slabs, axis=1)[:, :k, :]  # [Q, K, C]
    W = jnp.asarray(w[:, 0, :].T)  # [K, L]
    # Precision.HIGHEST: the default matmul precision feeds the MXU bf16
    # inputs, which is far too coarse for a 256-tap reconstruction filter
    # (~1e-3 error). HIGHEST uses 6-pass bf16 (f32-equivalent) on TPU.
    out = jnp.einsum(
        "qkc,kl->qlc", X, W, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [Q, L, C]
    return out.reshape(q * L, c)[:n_out]


# ---------------------------------------------------------------------------
# gather fallback (irrational-ish ratios): oversampled bank, rubato-style
# ---------------------------------------------------------------------------

@lru_cache(maxsize=8)
def filter_bank(ratio_key: tuple[int, int]) -> np.ndarray:
    from_sr, to_sr = ratio_key
    cutoff = F_CUTOFF * min(1.0, to_sr / from_sr)
    bank = np.zeros((OVERSAMPLE + 1, SINC_LEN), dtype=np.float64)
    for p in range(OVERSAMPLE + 1):
        bank[p] = _exact_filter(p / OVERSAMPLE, cutoff)
    return bank.astype(np.float32)


@partial(jax.jit, static_argnames=("n_out", "from_sr", "to_sr"))
def _gather_jit(
    xpad: jnp.ndarray, bank: jnp.ndarray, n_out: int, from_sr: int, to_sr: int
) -> jnp.ndarray:
    n_tiles = -(-n_out // _TILE)
    c = xpad.shape[1]

    def tile_fn(tile_idx):
        n = tile_idx * _TILE + jnp.arange(_TILE)
        num = n * from_sr
        int_pos = num // to_sr
        frac = (num % to_sr).astype(jnp.float32) / jnp.float32(to_sr)
        idx = int_pos[:, None] + jnp.arange(SINC_LEN)[None, :]
        idx = jnp.clip(idx, 0, xpad.shape[0] - 1)
        windows = xpad[idx]  # [T, taps, C]
        pf = frac * OVERSAMPLE
        p0 = jnp.floor(pf).astype(jnp.int32)
        w = (pf - p0.astype(jnp.float32))[:, None]
        filt = bank[p0] * (1.0 - w) + bank[p0 + 1] * w
        return jnp.einsum(
            "tjc,tj->tc", windows, filt, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    tiles = jax.lax.map(tile_fn, jnp.arange(n_tiles))
    return tiles.reshape(n_tiles * _TILE, c)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def _n_out(n: int, from_sr: int, to_sr: int) -> int:
    return math.ceil(n * to_sr / from_sr)


def resample_device(x: jnp.ndarray, from_sr: int, to_sr: int) -> jnp.ndarray:
    """Device-resident resample: [N, C] -> [ceil(N*to/from), C]."""
    if from_sr == to_sr:
        return x
    n_out = _n_out(x.shape[0], from_sr, to_sr)
    g = math.gcd(from_sr, to_sr)
    if to_sr // g <= MAX_PHASES:
        return _polyphase_jit(x, from_sr, to_sr, n_out)
    half = SINC_LEN // 2
    n = x.shape[0]
    xpad = jnp.zeros((n + SINC_LEN, x.shape[1]), jnp.float32)
    xpad = xpad.at[half - 1 : half - 1 + n].set(x)
    bank = jnp.asarray(filter_bank((from_sr, to_sr)))
    return _gather_jit(xpad, bank, n_out, from_sr, to_sr)[:n_out]


def resample_sample(x: np.ndarray, from_sr: int, to_sr: int) -> np.ndarray:
    """Sample-import resample (reference sample.rs:305-310), computed ON
    THE HOST with the same oversampled-bank + linear-interpolation recipe
    as rubato's SincFixedIn (and this module's device gather path).

    Host, deliberately: imports are a refresh-time one-shot per sample, and
    on the dev harness's remote-PJRT tunnel a device round-trip here both
    wastes ~100 ms per sample and — measured — permanently degrades every
    SUBSEQUENT dispatch in the process (the tunnel's first synchronous
    device->host fetch switches it out of pipelined dispatch; see
    docs/perf.md). float64 accumulation over the 256 taps, rounded once.
    """
    x = np.asarray(x, dtype=np.float32)
    if from_sr == to_sr:
        return x
    n = x.shape[0]
    c = x.shape[1]
    n_out = _n_out(n, from_sr, to_sr)
    half = SINC_LEN // 2
    xpad = np.zeros((n + SINC_LEN, c), np.float64)
    xpad[half - 1 : half - 1 + n] = x
    bank = filter_bank((from_sr, to_sr)).astype(np.float64)
    out = np.empty((n_out, c), np.float32)
    tile = 16384
    taps = np.arange(SINC_LEN)
    for t0 in range(0, n_out, tile):
        nn = np.arange(t0, min(t0 + tile, n_out))
        num = nn * from_sr
        int_pos = num // to_sr
        frac = (num % to_sr) / float(to_sr)
        idx = np.clip(int_pos[:, None] + taps[None, :], 0, len(xpad) - 1)
        windows = xpad[idx]  # [T, taps, C]
        pf = frac * OVERSAMPLE
        p0 = np.floor(pf).astype(np.int64)
        w = (pf - p0)[:, None]
        filt = bank[p0] * (1.0 - w) + bank[p0 + 1] * w
        out[t0 : t0 + len(nn)] = np.einsum(
            "tjc,tj->tc", windows, filt
        ).astype(np.float32)
    return out


# ---------------------------------------------------------------------------
# streaming (chunked) resample — exact
# ---------------------------------------------------------------------------

@partial(jax.jit,
         static_argnames=("rows", "K", "M", "trail", "keep", "take"))
def _stream_step(
    tail: jnp.ndarray, x: jnp.ndarray, W: jnp.ndarray,
    rows: int, K: int, M: int, trail: int, keep: int,
    take: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One streaming chunk: concat carry + new input, emit `rows` polyphase
    rows (each L outputs), retain the last `keep` frames as the next carry.
    Same window-slab matmul as _polyphase_jit; static ints are pure host
    arithmetic so no device sync is ever needed for bookkeeping. `take`
    statically trims the output to its first `take` frames — flush()'s
    exact-length cut, folded in here so it is not an eager device slice."""
    parts = x if isinstance(x, tuple) else (x,)
    c = parts[0].shape[1]
    buf = jnp.concatenate([tail, *parts], axis=0)
    n_slabs = -(-K // M)
    # slab construction reads up to (n_slabs-1+rows)*M; elements past each
    # row's K-window are sliced off below, but dynamic_slice must never
    # clamp (that would shift valid data), so guarantee the length
    need = max((n_slabs - 1 + rows) * M, rows * M + keep)
    grow = max(trail, need - int(buf.shape[0]))
    if grow > 0:
        buf = jnp.pad(buf, ((0, grow), (0, 0)))
    slabs = [
        jax.lax.dynamic_slice_in_dim(buf, s * M, rows * M, axis=0)
        .reshape(rows, M, c)
        for s in range(n_slabs)
    ]
    X = jnp.concatenate(slabs, axis=1)[:, :K, :]  # [rows, K, C]
    out = jnp.einsum(
        "qkc,kl->qlc", X, W, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    L = W.shape[1]
    new_tail = jax.lax.dynamic_slice_in_dim(
        buf, rows * M, keep, axis=0
    ) if keep else buf[:0]
    out = out.reshape(rows * L, c)
    if take is not None:
        out = out[:take]
    return out, new_tail


@jax.jit
def _stream_append(tail: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([tail, x], axis=0)


class StreamingResampler:
    """Chunked polyphase resample with carried state — mathematically
    identical to `resample_device` on the full concatenation (the FIR is
    local; the carry keeps exactly the halo the next chunk's windows reach
    back for). Observed difference is only float32 reduction-order
    rounding (~1e-6 abs — below one LSB even at 24-bit), because XLA tiles
    the einsum differently per chunk shape.

    This is the TPU analog of rubato's chunked `SincFixedIn` streaming that
    the reference render uses (state.rs:533-561), minus its chunk-edge
    artifacts: chunking here is exact by construction (verified in
    tests/test_ops.py). Feed device windows, get device output chunks
    (possibly empty); `flush()` zero-pads the tail and emits the rest so
    total output length == ceil(total_in * to/from).

    All row/offset bookkeeping is host-side integer arithmetic — no device
    round-trips; with uniform window sizes the (tail_len, rows) signature
    cycles through a handful of values, so only a few programs compile.
    """

    # device-resident constants per (from_sr, to_sr, channels): the
    # filter-bank upload and the initial zero tail cost ~1 ms of eager
    # dispatch per construction, and render_device builds a fresh
    # resampler every render. jax arrays are immutable, so sharing the
    # templates across instances is safe.
    _DEV_CONSTS: dict[tuple, tuple] = {}

    def __init__(self, from_sr: int, to_sr: int, channels: int = 2) -> None:
        key = (from_sr, to_sr, channels)
        c = self._DEV_CONSTS.get(key)
        if c is None:
            w, L, M = polyphase_kernel(from_sr, to_sr)
            lead = SINC_LEN // 2 - 1
            c = (
                jnp.asarray(w[:, 0, :].T),  # [K, L]
                L, M, w.shape[2],
                jnp.zeros((lead, channels), jnp.float32),
                lead,
                jnp.zeros((0, channels), jnp.float32),
            )
            self._DEV_CONSTS[key] = c
        self.W, self.L, self.M, self.K, self.tail, lead, self._empty = c
        self.channels = channels
        self.avail = lead   # padded-stream frames held = len(tail)
        self.q_done = 0     # rows emitted (row q covers xp[q*M : q*M+K])
        self.n_in = 0       # raw frames fed
        self.n_emitted = 0

    def feed(self, x: jnp.ndarray) -> jnp.ndarray:
        """Feed [n, C]; returns the ready output chunk [m, C] (m may be 0)."""
        self.n_in += int(x.shape[0])
        self.avail += int(x.shape[0])
        q_ready = self.q_done
        if self.avail >= self.K:
            q_ready = max(self.q_done, (self.avail - self.K) // self.M + 1)
        return self._step(x, q_ready, trail=0)

    def flush(self) -> jnp.ndarray:
        """Emit everything left (zero-padded tail), completing the exact
        whole-signal output length ceil(n_in * L / M)."""
        n_out_total = math.ceil(self.n_in * self.L / self.M)
        q_total = -(-n_out_total // self.L)
        rows = q_total - self.q_done
        if rows <= 0:
            return self._empty
        # semantic end-of-signal zero padding so every remaining row's
        # K-window is defined; the exact-length cut of the final partial
        # row rides the jitted step as a static `take` (an eager device
        # slice here cost ~0.3 ms per render through the remote tunnel)
        trail = max(0, (q_total - 1) * self.M + self.K - self.avail)
        return self._step(
            self._empty, q_total, trail=trail,
            take=n_out_total - self.n_emitted,
        )

    def render_whole(self, xs: list) -> jnp.ndarray:
        """One-dispatch resample of a COMPLETE signal given as device
        chunks: semantically `feed()` per chunk + `flush()`, with the
        concat, the polyphase matmul, and the exact-length trim in a
        single jitted program. A 5-window render paid ~6 pipelined
        dispatches through the chunked path — pure enqueue latency on a
        sub-3 ms steady render. Output differs from the chunked walk
        only by float32 reduction-order rounding (the documented
        streaming-vs-one-shot drift class, ~1e-6 abs — below half a
        16-bit LSB). Must be called on a fresh resampler."""
        assert self.n_in == 0 and self.q_done == 0, "resampler not fresh"
        n_in = sum(int(x.shape[0]) for x in xs)
        if n_in == 0:
            return self._empty
        self.n_in = n_in
        self.avail += n_in
        n_out_total = math.ceil(n_in * self.L / self.M)
        q_total = -(-n_out_total // self.L)
        trail = max(0, (q_total - 1) * self.M + self.K - self.avail)
        out, self.tail = _stream_step(
            self.tail, tuple(xs), self.W, q_total, self.K, self.M,
            trail, 0, n_out_total,
        )
        self.q_done = q_total
        self.avail = q_total * self.M
        self.n_emitted = n_out_total
        return out

    def _step(self, x: jnp.ndarray, q_ready: int, trail: int,
              take: int | None = None) -> jnp.ndarray:
        rows = q_ready - self.q_done
        if rows <= 0:
            if x.shape[0]:
                self.tail = _stream_append(self.tail, x)
            return self._empty
        # buffer holds padded-stream frames [q_done*M, avail+trail); after
        # emitting through row q_ready-1 keep from q_ready*M on
        keep = max(0, self.avail + trail - q_ready * self.M)
        out, self.tail = _stream_step(
            self.tail, x, self.W, rows, self.K, self.M, trail, keep, take
        )
        self.avail = q_ready * self.M + keep
        self.q_done = q_ready
        self.n_emitted += int(out.shape[0])
        return out
