"""Persistent XLA compilation cache setup.

A cold State.refresh+render compiles ~1 min of programs on the real chip;
the reference (an interpreter) has no compile step to amortize, so cold
start is the one place it wins. The persistent cache makes every process
after the first pay ~nothing for unchanged programs.

Call before the first jit executes (cli.py, bench.py, __graft_entry__).
Disable with TERMDAW_COMPILE_CACHE=0; point elsewhere by setting it to a
path.
"""

from __future__ import annotations

import hashlib
import os


def host_fingerprint() -> str:
    """Short hash of this host's CPU feature set. XLA:CPU cache entries
    embed the compile machine's features and loading them on a host with
    a different set risks SIGILL (observed across harness rounds: the
    loader warns 'prefer-no-scatter is not supported on the host
    machine'); keying the cache directory by host features makes stale
    cross-host CPU entries unreachable. TPU executables live tunnel-side
    and don't care, so sharing the suffixed dir costs nothing."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = line
                    break
            else:
                feats = "unknown"
    except OSError:
        feats = "unknown"
    return hashlib.blake2b(feats.encode(), digest_size=4).hexdigest()


def enable_persistent_compile_cache() -> str | None:
    env = os.environ.get("TERMDAW_COMPILE_CACHE", "")
    if env == "0":
        return None
    path = env or os.path.expanduser(
        f"~/.cache/termdaw_tpu/xla-{host_fingerprint()}"
    )
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return path
    except Exception:  # pragma: no cover - cache is best-effort
        return None
