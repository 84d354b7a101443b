"""One-off probe: device->host transfer patterns over the axon tunnel.

Measures what the render fetch path can expect:
  1. single fused fetch of the full int16 payload (current strategy)
  2. per-window fetches, serial np.asarray
  3. per-window copy_to_host_async issued together, then gathered
  4. overlap: dispatch compute for window k+1 while fetching window k

Prints one line per pattern (stderr-free, safe to run standalone).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, reps=5):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), sorted(ts)[len(ts) // 2]


def main():
    n_win, win_frames = 4, 512 * 1024 // 2   # ~40s at 44.1k in 4 windows
    total = n_win * win_frames

    @jax.jit
    def make(seed):
        k = jax.random.PRNGKey(seed)
        x = jax.random.normal(k, (total, 2), jnp.float32)
        return (x * 20000).astype(jnp.int16)

    buf = make(0)
    buf.block_until_ready()
    _ = np.asarray(buf)  # absorb the first-fetch tax
    size_mb = total * 2 * 2 / 1e6

    best, p50 = timed(lambda: np.asarray(make(1)))
    print(f"fused single fetch: {size_mb:.1f} MB best {best*1e3:.0f} ms "
          f"p50 {p50*1e3:.0f} ms -> {size_mb/best:.0f} MB/s")

    @jax.jit
    def make_win(seed):
        k = jax.random.PRNGKey(seed)
        x = jax.random.normal(k, (win_frames, 2), jnp.float32)
        return (x * 20000).astype(jnp.int16)

    wins = [make_win(i) for i in range(n_win)]
    jax.block_until_ready(wins)

    def serial():
        return [np.asarray(w) for w in wins]

    best, p50 = timed(serial)
    print(f"serial per-window fetch: best {best*1e3:.0f} ms p50 {p50*1e3:.0f} ms "
          f"-> {size_mb/best:.0f} MB/s")

    def async_all():
        for w in wins:
            w.copy_to_host_async()
        return [np.asarray(w) for w in wins]

    best, p50 = timed(async_all)
    print(f"async-issued fetch: best {best*1e3:.0f} ms p50 {p50*1e3:.0f} ms "
          f"-> {size_mb/best:.0f} MB/s")

    # overlap compute with fetch: dispatch all windows, then fetch k while
    # k+1.. computes (async dispatch means fetches serialize after their
    # producer only)
    def overlapped():
        ws = [make_win(10 + i) for i in range(n_win)]
        for w in ws:
            w.copy_to_host_async()
        return [np.asarray(w) for w in ws]

    best, p50 = timed(overlapped)
    print(f"compute+fetch overlapped: best {best*1e3:.0f} ms p50 {p50*1e3:.0f} ms")

    # does a bigger single buffer beat chunks? and f32 vs i16 rate
    big32 = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(3), (total, 2), jnp.float32))()
    big32.block_until_ready()
    best, p50 = timed(lambda: np.asarray(big32))
    print(f"f32 fused fetch: {total*2*4/1e6:.1f} MB best {best*1e3:.0f} ms "
          f"-> {total*2*4/1e6/best:.0f} MB/s")


if __name__ == "__main__":
    main()
