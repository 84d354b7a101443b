"""Disk cache of AOT-serialized XLA executables for the window programs.

Why this exists on top of the persistent XLA compilation cache
(`jaxcache.py`): even a persistent-cache HIT pays Python tracing plus
StableHLO lowering before the key can be computed — measured ~2-4 s trace
+ ~2 s lower for the full-graph window program on this machine, putting a
"warm" start at ~8 s. `jax.experimental.serialize_executable` skips both:
the loaded executable is called directly (measured ~1.4 s deserialize+load
+ ~0.1 s first dispatch for the same program). The reference interpreter
(graph.rs) has no compile step at all, so warm start is the one place it
could win; this closes that gap.

Scope: single-device window programs (`CompiledGraph._get_fn`). The
sharded/mesh programs keep the plain jit path (the multichip dryrun runs
with caches disabled and real meshes vary by host). Entries are keyed by
the full program spec repr + argument shape/dtype signature + a backend
fingerprint, so a stale entry can never be served for a changed program;
loading is best-effort with a silent fall-back to the normal jit path.

Disable with TERMDAW_COMPILE_CACHE=0 (same switch as the XLA cache).
"""

from __future__ import annotations

import hashlib
import os
import pickle
import time
from pathlib import Path

# only executables whose compile took at least this long are persisted:
# the tiny playback window programs (nb 1..32) compile in well under a
# second and would just burn disk
SAVE_MIN_COMPILE_S = 2.0

# total cache budget; oldest entries beyond it are dropped at save time
MAX_BYTES = 20 * 1024**3

_FINGERPRINT: str | None = None


def cache_dir() -> Path | None:
    env = os.environ.get("TERMDAW_COMPILE_CACHE", "")
    if env == "0":
        return None
    if not env:
        from .jaxcache import host_fingerprint

        env = os.path.expanduser(f"~/.cache/termdaw_tpu/xla-"
                                 f"{host_fingerprint()}")
    p = Path(env) / "aot"
    try:
        p.mkdir(parents=True, exist_ok=True)
    except OSError:
        return None
    return p


def _fingerprint() -> str:
    """Everything environment-side that invalidates a serialized
    executable: jax version, PJRT platform/build, device kind."""
    global _FINGERPRINT
    if _FINGERPRINT is None:
        import jax

        dev = jax.devices()[0]
        client = dev.client
        _FINGERPRINT = repr((
            jax.__version__,
            getattr(client, "platform_version", ""),
            getattr(dev, "device_kind", ""),
            client.platform,
        ))
    return _FINGERPRINT


_DTYPE_STR: dict = {}


def _dtype_str(dt) -> str:
    """str(np.dtype) memoized — it shows up in per-dispatch profiles."""
    s = _DTYPE_STR.get(dt)
    if s is None:
        s = _DTYPE_STR[dt] = str(dt)
    return s


def args_signature(args) -> tuple:
    import jax

    leaves = jax.tree_util.tree_leaves(args)
    return tuple(
        (tuple(getattr(x, "shape", ())),
         _dtype_str(getattr(x, "dtype", type(x).__name__)))
        for x in leaves
    )


def _disk_cache_allowed() -> bool:
    # CPU-backend executables embed host machine features the fingerprint
    # cannot see (XLA logs "could lead to SIGILL" when loading an entry
    # from a different x86 feature set), and CPU compiles are cheap —
    # keep the disk AOT cache for accelerator backends only.
    import jax

    return jax.devices()[0].platform != "cpu"


def _entry_path(key_repr: str, sig: tuple) -> Path | None:
    if not _disk_cache_allowed():
        return None
    d = cache_dir()
    if d is None:
        return None
    h = hashlib.blake2b(
        (key_repr + repr(sig) + _fingerprint()).encode(), digest_size=24
    ).hexdigest()
    return d / f"prog-{h}.pkl"


def _evict_to_budget(d: Path, incoming: int) -> None:
    entries = sorted(
        ((f.stat().st_mtime, f.stat().st_size, f) for f in d.glob("*.pkl")),
        reverse=True,
    )
    total = incoming
    for mtime, size, f in entries:
        total += size
        if total > MAX_BYTES:
            try:
                f.unlink()
            except OSError:
                pass


class AotProgram:
    """Callable wrapper over one jitted window program.

    First call resolves the executable: disk AOT entry if present, else
    trace+lower+compile (which still consults the persistent XLA cache)
    and persist the result when it was expensive. Later calls dispatch the
    loaded executable directly. A changed argument signature (e.g. the
    time table grew after a stream append) permanently falls back to the
    plain jit path for this instance — jit retraces per shape, exactly the
    old behavior."""

    def __init__(self, jitfn, key_repr: str):
        self._jitfn = jitfn
        self._key = key_repr
        self._compiled = None
        self._sig: tuple | None = None
        self._fallback = None

    def call_pinned(self, *args):
        """Dispatch the resolved executable WITHOUT re-deriving the args
        signature. For chain-served window programs the signature is
        pinned by construction — bake buffers are stored at chain build,
        state shapes are the program's own fixed outputs, the time table
        is memoized per pow2 length — and re-hashing ~65 leaf shapes per
        window showed up in steady-render profiles (~0.2 ms at 5 windows,
        a tenth of the whole wall). The compiled call validates input
        avals itself, so a pin violation raises loudly; it is caught and
        rerouted through the checked path, which routes a genuinely
        changed signature to the plain-jit fallback exactly as before."""
        c = self._compiled
        if c is None or self._fallback is not None:
            return self(*args)
        try:
            return c(*args)
        except (TypeError, ValueError):
            return self(*args)

    def __call__(self, *args):
        if self._fallback is not None:
            return self._fallback(*args)
        sig = args_signature(args)
        if self._compiled is not None:
            if sig == self._sig:
                return self._compiled(*args)
            self._fallback = self._jitfn
            return self._fallback(*args)
        path = _entry_path(self._key, sig)
        if path is not None and path.exists():
            try:
                payload, in_tree, out_tree = pickle.loads(path.read_bytes())
                from jax.experimental.serialize_executable import (
                    deserialize_and_load,
                )

                self._compiled = deserialize_and_load(
                    payload, in_tree, out_tree
                )
                self._sig = sig
                return self._compiled(*args)
            except Exception:
                # corrupt / version-skewed entry: drop it, compile fresh
                self._compiled = None
                try:
                    path.unlink()
                except OSError:
                    pass
        t0 = time.perf_counter()
        try:
            compiled = self._jitfn.trace(*args).lower().compile()
        except Exception:
            # any AOT-path surprise (donation, unusual avals): plain jit
            self._fallback = self._jitfn
            return self._fallback(*args)
        took = time.perf_counter() - t0
        self._compiled, self._sig = compiled, sig
        if path is not None and took >= SAVE_MIN_COMPILE_S:
            try:
                from jax.experimental.serialize_executable import serialize

                payload, in_tree, out_tree = serialize(compiled)
                blob = pickle.dumps((payload, in_tree, out_tree))
                _evict_to_budget(path.parent, len(blob))
                tmp = path.with_suffix(".tmp")
                tmp.write_bytes(blob)
                os.replace(tmp, path)
            except Exception:
                pass
        return self._compiled(*args)
