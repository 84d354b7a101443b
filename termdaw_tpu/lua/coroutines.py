"""Lua coroutines on handoff threads.

The reference gets coroutines for free by embedding real Lua via mlua
(reference Cargo.toml:13); a tree-walking interpreter cannot suspend a
Python call stack, so each Lua coroutine runs on its own daemon thread
and `resume`/`yield` hand control back and forth through a pair of
1-slot queues. The GIL plus the strict handoff protocol (the resumer
blocks until the coroutine yields, returns, or errors; a suspended
coroutine blocks until resumed) mean exactly one thread executes Lua at
any moment — the interpreter's single-threaded semantics are preserved,
including across host-function frames (a Lua callback invoked from a
registered Python function can still yield, which a generator-based
design could not do).

Lifecycle matches Lua 5.3 (coroutine.* in the manual): statuses
suspended/running/normal/dead, `resume` returns `(true, ...)` or
`(false, message)`, `wrap` re-raises the error instead. A coroutine
that is never resumed to completion leaves its daemon thread parked on
a queue forever; daemon threads cost ~8 KB each and die with the
process, which is acceptable for project scripts (documented in
docs/manual.md).
"""

from __future__ import annotations

import queue
import threading


class CoroutineError(RuntimeError):
    """Raised for misuse detected by the library itself (bad resume /
    yield outside a coroutine). Converted to LuaError by the stdlib
    wrappers in interp.py so pcall can trap it like any runtime error."""


# which Coroutine the *current Python thread* is executing (None on the
# interpreter's main thread)
_current = threading.local()


def current_coroutine():
    return getattr(_current, "co", None)


class Coroutine:
    """One Lua coroutine: a parked daemon thread plus two handoff slots.

    `_to_co` carries resume arguments into the coroutine; `_from_co`
    carries `(kind, payload)` out, where kind is "yield" (payload =
    tuple of yielded values), "return" (tuple of return values), or
    "error" (message string).
    """

    __slots__ = ("_fn", "status", "_to_co", "_from_co", "_thread")

    def __init__(self, fn):
        if not callable(fn):
            raise CoroutineError(
                "bad argument #1 to 'create' (function expected)"
            )
        self._fn = fn
        self.status = "suspended"
        self._to_co: queue.Queue = queue.Queue(maxsize=1)
        self._from_co: queue.Queue = queue.Queue(maxsize=1)
        self._thread: threading.Thread | None = None

    # -- the coroutine side ---------------------------------------------------
    def _body(self) -> None:
        _current.co = self
        args = self._to_co.get()
        try:
            res = self._fn(*args)
            if not isinstance(res, tuple):
                res = (res,) if res is not None else ()
            self._from_co.put(("return", res))
        except BaseException as e:  # noqa: BLE001 — a dying thread must report
            # LuaError carries a script message; anything else (host bug,
            # _Break/_Goto escaping a frame) is surfaced as text so resume
            # returns (false, msg) instead of deadlocking the resumer
            self._from_co.put(("error", str(e) or type(e).__name__))

    # -- the resumer side -----------------------------------------------------
    def resume(self, *args) -> tuple:
        if self.status == "dead":
            return (False, "cannot resume dead coroutine")
        if self.status != "suspended":
            return (False, f"cannot resume non-suspended coroutine "
                           f"(status: {self.status})")
        caller = current_coroutine()
        if caller is not None:
            caller.status = "normal"
        self.status = "running"
        if self._thread is None:
            self._thread = threading.Thread(
                target=self._body, daemon=True, name="lua-coroutine"
            )
            self._thread.start()
        self._to_co.put(tuple(args))
        kind, payload = self._from_co.get()
        if caller is not None:
            caller.status = "running"
        if kind == "yield":
            self.status = "suspended"
            return (True, *payload)
        self.status = "dead"
        if kind == "return":
            return (True, *payload)
        return (False, payload)


def co_yield(*values) -> tuple:
    co = current_coroutine()
    if co is None:
        raise CoroutineError("attempt to yield from outside a coroutine")
    co._from_co.put(("yield", tuple(values)))
    return co._to_co.get()
