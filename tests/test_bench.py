"""bench.py robustness (VERDICT r3 item 1): the watchdog parent must print
exactly ONE JSON line on EVERY exit path — healthy, backend outage
(injected with BENCH_FAKE_OUTAGE), and mid-run stall (BENCH_FAKE_STALL) —
with rc=0, and bank partial results when killed mid-run.

All runs happen in PYTHONPATH-scrubbed CPU subprocesses (the parent itself
never imports jax; the child runs on the CPU backend here).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def run_bench(env_extra: dict, timeout: float,
              sidecar: str | None = None) -> dict:
    import tempfile

    from .conftest import scrubbed_env

    # default the sidecar OUT of the repo — a CPU test run must never
    # overwrite the committed docs/captures/bench_full_latest.json
    if sidecar is None:
        sidecar = str(Path(tempfile.mkdtemp(prefix="termdaw_sidecar_"))
                      / "full.json")
    env = scrubbed_env(BENCH_SIDECAR=sidecar, **env_extra)
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env, capture_output=True, text=True, timeout=timeout,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected ONE json line, got: {lines!r}"
    # the driver's capture parses a bounded stdout tail; r4's line grew
    # past it and the round's official record was "parsed": null
    assert len(lines[0]) <= 2000, f"stdout line too big: {len(lines[0])}"
    out = json.loads(lines[0])
    assert out["metric"] == "render_throughput_chip_sample_project"
    assert out["unit"] == "x_realtime_48k"
    out["_sidecar_path"] = sidecar
    return out


def test_outage_fast_fail():
    """A backend whose init raises must produce the failure JSON within the
    bounded probe window, value 0, error naming the cause."""
    out = run_bench(
        {
            "BENCH_FAKE_OUTAGE": "fail",
            "BENCH_PROBE_WINDOW_S": "4",
            "BENCH_PROBE_RETRY_S": "1",
            "BENCH_PROBE_TIMEOUT_S": "10",
        },
        timeout=120,
    )
    assert out["value"] == 0.0
    assert "backend unavailable" in out["error"]
    attempts = out["extra"]["probe_attempts"]
    assert len(attempts) >= 2
    assert "injected backend outage" in attempts[0]


def test_outage_hang():
    """A backend whose init HANGS (the round-3 failure mode: ~25 min per
    attempt) must be killed by the per-attempt probe timeout, not waited
    on."""
    out = run_bench(
        {
            "BENCH_FAKE_OUTAGE": "hang",
            "BENCH_PROBE_WINDOW_S": "6",
            "BENCH_PROBE_RETRY_S": "1",
            "BENCH_PROBE_TIMEOUT_S": "2",
        },
        timeout=120,
    )
    assert out["value"] == 0.0
    assert "backend unavailable" in out["error"]
    assert any("did not return within" in a
               for a in out["extra"]["probe_attempts"])


@pytest.mark.slow
def test_stall_mid_run_reports_partial():
    """A child that wedges after measuring c1 (a mid-run backend stall)
    must be killed by the stall watchdog and the banked c1 headline
    reported alongside the error."""
    out = run_bench(
        {
            "BENCH_SKIP_PROBE": "1",
            "BENCH_LENGTH_SEC": "2",
            "BENCH_REPS": "2",
            "BENCH_CONFIGS": "c1",
            "BENCH_FAKE_STALL": "chip:c1",
            "BENCH_STALL_S": "10",
        },
        timeout=300,
    )
    assert out["value"] > 0.0, "partial c1 headline must survive the kill"
    assert "stalled" in out["error"]
    assert out["extra"]["c1_chip_xrt"] == out["value"]


@pytest.mark.slow
def test_healthy_short_run():
    """Happy path on CPU: headline + per-config extras + roofline, no
    error key, done marker stripped."""
    out = run_bench(
        {
            "BENCH_SKIP_PROBE": "1",
            "BENCH_LENGTH_SEC": "2",
            "BENCH_REPS": "2",
            "BENCH_CONFIGS": "c1",
            "BENCH_SKIP_PLAYBACK": "1",
        },
        timeout=560,
    )
    assert "error" not in out
    assert "done" not in out
    assert out["value"] > 0.0
    assert out["extra"]["c1_chip_xrt"] == out["value"]
    # bench rounds vs_baseline to 3 decimals (bench.py:691) — compare
    # against the same rounding, not a rel-tolerance the rounding step
    # can exceed when value/500 lands near a .0005 boundary
    assert out["vs_baseline"] == round(out["value"] / 500.0, 3)
    # roofline accounting rode along (CPU backend: no peak percentages,
    # but XLA flop/byte counts must be there) — the stdout line keeps the
    # slim summary, the sidecar the full dict (VERDICT r4 item 1)
    assert out["extra"]["c1_util"]["gflops_per_s"] > 0.0
    full = json.loads(Path(out["_sidecar_path"]).read_text())
    assert full["extra"]["c1_chip_p50_ms"] > 0.0
    assert full["extra"]["c1_compile_s"] >= 0.0
    assert out["extra"]["sidecar"] == out["_sidecar_path"]


def test_roofline_bound_label():
    """The bound label logic (VERDICT r4 weak 1): utilization estimates
    above 100% of a physical peak must demote to estimate-unreliable,
    never print as a saturated wall. Cases are the committed r4b
    capture's actual numbers."""
    from termdaw_tpu.utils.roofline import bound_label

    assert bound_label(0.35, 0.96) == "dispatch"          # c1
    assert bound_label(0.07, 3.67) == "hbm"               # c2
    assert bound_label(0.12, 237.74) == "estimate-unreliable"  # c3 (r4b)
    assert bound_label(0.32, 187.07) == "estimate-unreliable"  # c4 (r4b)
    assert bound_label(150.0, 3.0) == "estimate-unreliable"
    assert bound_label(55.0, 12.0) == "mxu"
    assert bound_label(1.9, 1.9) == "dispatch"


def test_slim_extra_and_budget():
    """The stdout slimming keeps exactly the headline keys and the
    shrinker enforces the 2000-char budget."""
    sys.path.insert(0, str(REPO))
    from bench import _slim_extra, _shrink_to_budget, MAX_LINE_CHARS

    extra = {
        "c1_chip_xrt": 14398.6, "c1_chip_p50_ms": 2.78, "c1_chip_s": 0.00278,
        "c1_compile_s": 1.3, "c1_chip_spread": 1.2, "c1_e2e_xrt": 181.0,
        "c1_e2e_p50_ms": 221.0, "c1_fresh_process": True,
        "c1_util": {"gflops_per_s": 684.3, "hbm_gbps_phys_est": 7.9,
                    "window_gbytes_phys_est": 0.022, "bound": "dispatch"},
        "link_mbps": 33.8, "tunnel_floor_xrt": 192.0,
        "stream_latency_p50_ms": 28.7, "stream_latency_ok": True,
        "playback_gen_per_wall": 1.0, "playback_realtime_ok": True,
        "playback_max_deficit_ms": 0.0, "playback_deficit_ok": True,
        "backend_probe": {"platform": "tpu"},
        "probe_attempts": ["a", "b", "c", "d", "e"],
        "c7_error": "late config subprocess timed out after 600s",
    }
    slim = _slim_extra(extra)
    assert slim["c1_chip_xrt"] == 14398.6
    assert slim["c1_util"] == {"gflops_per_s": 684.3, "bound": "dispatch"}
    assert slim["probe_attempts"] == ["c", "d", "e"]
    assert "c1_chip_p50_ms" not in slim and "c1_chip_s" not in slim
    assert "playback_max_deficit_ms" not in slim
    assert slim["c7_error"].startswith("late config")
    # a pathological 7-config result still fits the driver's parse budget
    big = {}
    for i in range(1, 8):
        for k, v in extra.items():
            big[k.replace("c1", f"c{i}").replace("c7_error",
                                                 f"c{i}x_error")] = v
    line = _shrink_to_budget({"metric": "m", "value": 1.0, "unit": "u",
                              "vs_baseline": 0.0, "extra": _slim_extra(big)})
    assert len(line) <= MAX_LINE_CHARS
    json.loads(line)
    # error-heavy outage run: 7 configs x ~300-char messages must also
    # fit — the shrinker truncates error values rather than ever
    # emitting an unparseable-length line (the r4 failure mode)
    errs = {f"c{i}_error": "x" * 300 for i in range(1, 8)}
    errs.update({f"c{i}_chip_xrt": 0.0 for i in range(1, 8)})
    errs["probe_attempts"] = ["y" * 280] * 12
    line = _shrink_to_budget({"metric": "m", "value": 0.0, "unit": "u",
                              "vs_baseline": 0.0, "error": "z" * 300,
                              "extra": _slim_extra(errs)})
    assert len(line) <= MAX_LINE_CHARS
    out = json.loads(line)
    assert any(k.endswith("_error") for k in out["extra"])


def test_probe_real_cpu_backend():
    """The actual probe code (no fake) against the CPU backend: verifies
    the probe subprocess protocol (tiny jit + JSON status line) end-to-end
    in a scrubbed env, so it works even when the TPU tunnel is down."""
    sys.path.insert(0, str(REPO))
    from bench import probe_backend_once  # parent half imports jax-free

    from .conftest import scrubbed_env

    env = scrubbed_env()
    env.pop("BENCH_FAKE_OUTAGE", None)
    info, reason = probe_backend_once(timeout_s=240, env=env)
    assert info is not None, reason
    assert info["n_devices"] >= 1
    assert info["platform"] == "cpu"


def test_unknown_configs_error():
    """A BENCH_CONFIGS typo must produce value 0 WITH an error naming the
    unknown names — never a silent 'successful' 0x measurement."""
    out = run_bench(
        {"BENCH_SKIP_PROBE": "1", "BENCH_CONFIGS": "c2,typo"},
        timeout=120,
    )
    assert out["value"] == 0.0
    assert "matched no known configs" in out["error"]
    assert out["extra"]["bench_configs_unknown"] == ["c2", "typo"]


@pytest.mark.slow
def test_late_config_fresh_subprocess():
    """A config routed through BENCH_LATE must be measured in a fresh
    subprocess (pre-fetch dispatch mode), its extras merged, and — when it
    is c1 — still feed the headline."""
    out = run_bench(
        {
            "BENCH_SKIP_PROBE": "1",
            "BENCH_LENGTH_SEC": "2",
            "BENCH_REPS": "2",
            "BENCH_CONFIGS": "c1",
            "BENCH_LATE": "c1",
            "BENCH_SKIP_PLAYBACK": "1",
            "BENCH_SKIP_E2E": "1",
            "BENCH_SKIP_ROOFLINE": "1",
        },
        timeout=560,
    )
    assert "error" not in out
    assert out["value"] > 0.0
    assert out["extra"]["c1_chip_xrt"] == out["value"]
    assert out["extra"]["c1_fresh_process"] is True


@pytest.mark.slow
def test_late_config_stall_is_bounded():
    """A late-config subprocess that wedges must be killed by its own
    BENCH_LATE_TIMEOUT_S without costing the run (rc=0, error recorded
    per-config, run reaches done). slow: full parent+child with a jax
    import and link probe before the injected wedge (ADVICE r4)."""
    out = run_bench(
        {
            "BENCH_SKIP_PROBE": "1",
            "BENCH_LENGTH_SEC": "2",
            "BENCH_REPS": "2",
            "BENCH_CONFIGS": "c1",
            "BENCH_LATE": "c1",
            "BENCH_FAKE_STALL": "late:c1",
            "BENCH_LATE_TIMEOUT_S": "5",
            "BENCH_SKIP_PLAYBACK": "1",
            "BENCH_SKIP_E2E": "1",
            "BENCH_SKIP_ROOFLINE": "1",
        },
        timeout=300,
    )
    assert "timed out" in out["extra"]["c1_error"]
    # nothing was measured, so the headline is honestly 0 — but the run
    # itself completed (no watchdog kill, no top-level crash)
    assert out["value"] == 0.0
    assert "stalled" not in out.get("error", "")


@pytest.mark.slow
def test_sigterm_reports_partials_and_reaps_child():
    """A driver SIGTERM mid-run must still print the one JSON line with
    the banked partials, and must not leave the measurement child alive
    on the (single) chip."""
    import signal
    import time as _time

    from .conftest import scrubbed_env

    import tempfile

    env = scrubbed_env(
        BENCH_SKIP_PROBE="1", BENCH_LENGTH_SEC="2",
        BENCH_REPS="2", BENCH_CONFIGS="c1",
        BENCH_FAKE_STALL="chip:c1",  # wedge after banking c1
        # keep the sidecar out of the repo (this test bypasses run_bench)
        BENCH_SIDECAR=str(Path(tempfile.mkdtemp(prefix="termdaw_sc_"))
                          / "full.json"),
    )
    proc = subprocess.Popen(
        [sys.executable, str(REPO / "bench.py")],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True,
    )
    # wait for the child to bank c1 (it then wedges), then SIGTERM parent
    deadline = _time.monotonic() + 240
    t_start = _time.time()
    import glob
    banked = False
    while _time.monotonic() < deadline and not banked:
        for rp in glob.glob("/tmp/termdaw_bench_*/result.json"):
            try:
                if os.stat(rp).st_mtime < t_start:
                    continue  # stale result from an earlier bench run
                data = json.loads(open(rp).read())
            except (OSError, json.JSONDecodeError):
                continue
            if data.get("value", 0) > 0:
                banked = True
                break
        _time.sleep(1.0)
    assert banked, "child never banked c1"
    proc.send_signal(signal.SIGTERM)
    stdout, _ = proc.communicate(timeout=60)
    lines = [ln for ln in stdout.splitlines() if ln.strip()]
    assert len(lines) == 1
    out = json.loads(lines[0])
    assert out["value"] > 0.0, "partials lost on SIGTERM"
    assert "terminated" in out["error"]
