"""AotProgram behavior: disk round-trip, signature fallback, CPU gating.

The disk cache is production-gated to accelerator backends
(aotcache._disk_cache_allowed); these tests force it on so the
serialize/deserialize round-trip runs on the CPU backend (same-host CPU
entries are feature-compatible — the gate exists for cross-host reuse).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from termdaw_tpu.utils import aotcache


@pytest.fixture
def disk(tmp_path, monkeypatch):
    monkeypatch.setenv("TERMDAW_COMPILE_CACHE", str(tmp_path / "xla"))
    monkeypatch.setattr(aotcache, "_disk_cache_allowed", lambda: True)
    monkeypatch.setattr(aotcache, "SAVE_MIN_COMPILE_S", 0.0)
    return tmp_path / "xla" / "aot"


def _fn(x, y):
    return (x * 2.0 + y, jnp.sum(x))


def test_roundtrip_and_reload(disk):
    x = jnp.arange(8, dtype=jnp.float32)
    y = jnp.float32(3.0)
    p1 = aotcache.AotProgram(jax.jit(_fn), "prog-roundtrip")
    a1, s1 = p1(x, y)
    entries = list(disk.glob("*.pkl"))
    assert len(entries) == 1  # compiled result persisted

    # a fresh instance with the same key+signature loads from disk
    p2 = aotcache.AotProgram(jax.jit(_fn), "prog-roundtrip")
    a2, s2 = p2(x, y)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert float(s1) == float(s2)
    assert p2._compiled is not None and p2._fallback is None

    # dispatching the loaded executable again works
    a3, _ = p2(x + 1.0, y)
    np.testing.assert_allclose(np.asarray(a3), np.asarray(x + 1.0) * 2 + 3.0)


def test_changed_signature_falls_back_to_jit(disk):
    p = aotcache.AotProgram(jax.jit(_fn), "prog-fallback")
    p(jnp.arange(8, dtype=jnp.float32), jnp.float32(1.0))
    assert p._fallback is None
    # a grown shape (e.g. a stream append grew the time table) must
    # permanently fall back to the retracing jit path
    out, _ = p(jnp.arange(16, dtype=jnp.float32), jnp.float32(1.0))
    assert p._fallback is not None
    assert out.shape == (16,)
    # and further calls (any shape) keep working through the fallback
    out2, _ = p(jnp.arange(4, dtype=jnp.float32), jnp.float32(2.0))
    assert out2.shape == (4,)


def test_corrupt_entry_recompiles(disk):
    p1 = aotcache.AotProgram(jax.jit(_fn), "prog-corrupt")
    x = jnp.arange(8, dtype=jnp.float32)
    p1(x, jnp.float32(1.0))
    (entry,) = disk.glob("*.pkl")
    entry.write_bytes(b"garbage")
    p2 = aotcache.AotProgram(jax.jit(_fn), "prog-corrupt")
    out, _ = p2(x, jnp.float32(1.0))  # drops the bad entry, compiles fresh
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2 + 1.0)


def test_cpu_backend_skips_disk(tmp_path, monkeypatch):
    monkeypatch.setenv("TERMDAW_COMPILE_CACHE", str(tmp_path / "xla"))
    monkeypatch.setattr(aotcache, "SAVE_MIN_COMPILE_S", 0.0)
    if jax.devices()[0].platform != "cpu":
        pytest.skip("real accelerator backend: disk cache is intended on")
    p = aotcache.AotProgram(jax.jit(_fn), "prog-cpu")
    p(jnp.arange(8, dtype=jnp.float32), jnp.float32(1.0))
    assert not list((tmp_path / "xla" / "aot").glob("*.pkl"))


def test_call_pinned_skips_signature_and_reroutes(disk):
    p = aotcache.AotProgram(jax.jit(_fn), "prog-pinned")
    x = jnp.arange(8, dtype=jnp.float32)
    p(x, jnp.float32(1.0))  # resolve the executable (signature-checked)
    assert p._compiled is not None and p._fallback is None
    out, _ = p.call_pinned(x, jnp.float32(2.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2 + 2.0)
    # a pin violation (grown shape) raises inside the compiled call and
    # reroutes through the checked path, which falls back to plain jit
    # exactly like __call__ would have
    y = jnp.arange(16, dtype=jnp.float32)
    out3, _ = p.call_pinned(y, jnp.float32(1.0))
    assert out3.shape == (16,)
    assert p._fallback is not None
    # and later pinned calls (any shape) keep working via the fallback
    out4, _ = p.call_pinned(x, jnp.float32(0.0))
    np.testing.assert_allclose(np.asarray(out4), np.asarray(x) * 2)


def test_call_pinned_before_resolution_is_checked(disk):
    p = aotcache.AotProgram(jax.jit(_fn), "prog-pinned-cold")
    x = jnp.arange(8, dtype=jnp.float32)
    out, _ = p.call_pinned(x, jnp.float32(3.0))  # no executable yet
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2 + 3.0)
    assert p._compiled is not None or p._fallback is not None
