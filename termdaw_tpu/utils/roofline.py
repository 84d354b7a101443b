"""Roofline / utilization accounting for the bench (VERDICT r3 item 4).

Answers "is it actually fast or just correct?" with hardware math: per
bench config, total the flops and bytes of the exact compiled window
programs (XLA's own `Compiled.cost_analysis()`, via
`CompiledGraph.window_cost`), add the streamed-resample matmul
analytically (it runs in separate jits that the window programs don't
see), divide by the measured chip render time, and compare against the
chip's public peaks.

Caveats, stated where the numbers land (docs/perf.md "Roofline"):
  * XLA's "bytes accessed" is a LOGICAL count — gathers and scans are
    inflated vs physical HBM traffic — so the derived GB/s is an upper
    estimate of demand, not a DMA measurement. A physically-scaled
    estimate (args read + outputs written + temps written+read, from the
    executable's memory_analysis) lands alongside as `*_phys_est`, and
    the `bound` label uses it: a fused program whose LOGICAL traffic
    exceeds the HBM peak is fusion saving traffic, not a saturated bus.
    And when even the PHYSICAL estimate exceeds the bus peak (it
    over-counts VMEM-resident/aliased scan state), no utilization
    percentage is claimed and the label is "estimate-unreliable" —
    an impossible traffic number must never print as `"bound": "hbm"`.
  * flops are counted at the HLO level; the engine computes in f32 with
    `Precision.HIGHEST` (CLAUDE.md), which the MXU executes as multiple
    bf16 passes, so f32 utilization vs the bf16 peak is the honest
    ceiling statement.
"""

from __future__ import annotations

import sys


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


# public peak numbers per device kind: (bf16 TFLOP/s, HBM GB/s).
# Sources: cloud.google.com/tpu/docs system architecture pages.
_PEAKS = {
    "v4": (275.0, 1228.0),
    "v5e": (197.0, 819.0),
    "v5lite": (197.0, 819.0),   # device_kind spells v5e "TPU v5 lite..."
    "v5p": (459.0, 2765.0),
    "v6e": (918.0, 1640.0),
    "trillium": (918.0, 1640.0),
}


def bound_label(mxu_pct: float, hbm_pct: float) -> str:
    """Which wall is closer, given utilization percentages of the MXU and
    HBM peaks. "dispatch" when both sit under 2% (fixed per-dispatch
    latency dominates); "estimate-unreliable" when either estimate
    exceeds 100% of a physical peak — impossible traffic must never be
    presented as a saturated wall (VERDICT r4 weak 1: the r4b capture
    printed 238% phys-est as "hbm")."""
    if max(hbm_pct, mxu_pct) < 2.0:
        return "dispatch"
    if hbm_pct > 100.0 or mxu_pct > 100.0:
        return "estimate-unreliable"
    return "hbm" if hbm_pct >= mxu_pct else "mxu"


def chip_peaks(device) -> tuple[float, float] | None:
    """(peak TFLOP/s bf16, peak HBM GB/s) for the device, or None when
    unknown (CPU backend, unrecognized kind)."""
    kind = str(getattr(device, "device_kind", "")).lower().replace(" ", "")
    if getattr(device, "platform", "") == "cpu":
        return None
    for key, peaks in _PEAKS.items():
        if key in kind:
            return peaks
    return None


def _window_counts(st) -> dict[int, int] | None:
    """Window sizes a single-device render uses, as {nb: count} — the same
    loop shape as State.render_device (engine/state.py:631-635). Returns
    None on a multi-device mesh: the timed render dispatched SHARDED
    programs there, and window_cost only models the single-device ones —
    mixing them would attribute the wrong flop/byte totals to the
    measured time."""
    left = st.cs
    counts: dict[int, int] = {}
    _, n_dev, step = st._mesh_plan()
    if n_dev > 1:
        return None
    while left > 0:
        nb = st._pick_nb(left, step, 1)
        counts[nb] = counts.get(nb, 0) + 1
        left -= nb
    return counts


def _resampler_flops(st, length_sec: float) -> float:
    """Analytic flops of the streamed polyphase resample (one 256-tap dot
    per output frame per channel; ops/resample.py SINC_LEN) — it runs in
    its own jits, outside the window programs cost_analysis sees."""
    from ..ops.resample import SINC_LEN

    psr = st.config.settings.project_samplerate
    if psr <= st.render_sr:
        return 0.0
    out_frames = length_sec * st.render_sr
    return out_frames * SINC_LEN * 2 * 2  # taps x channels x (mul+add)


def _analytic_window_model(cg, counts: dict[int, int]) -> tuple[float, float]:
    """Crude traffic/compute floor when XLA cost analysis is unavailable:
    every vertex reads+writes a stereo f32 window (~16 B/frame) and does
    ~12 flops/sample (gain/pan/mix/envelope scale). A floor, not a
    measurement — the output labels it 'analytic_floor'."""
    n_v = max(1, len(cg.order))
    flops = 0.0
    byts = 0.0
    for nb, cnt in counts.items():
        frames = nb * cg.bl
        byts += n_v * frames * 2 * 4 * 2 * cnt
        flops += n_v * frames * 2 * 12 * cnt
    return flops, byts


def config_roofline(st, chip_s: float, length_sec: float) -> dict | None:
    """Per-config achieved GFLOP/s and logical GB/s over the measured chip
    render time, plus utilization vs chip peaks when known."""
    counts = _window_counts(st)
    if counts is None:
        return None
    cg = st.compiled
    _, _, step = st._mesh_plan()
    cg.seed_caps(st.fb, st.cs, step)
    cg.set_time(0)
    st.fb.set_time(0)
    flops = 0.0
    byts = 0.0
    phys = 0.0          # physical-traffic estimate (see below)
    peak_hbm_window = 0  # largest per-dispatch HBM footprint
    have_mem = True
    source = "xla_cost_analysis"
    for nb, cnt in sorted(counts.items()):
        ca = cg.window_cost(st.fb, nb)
        if ca is None:
            # some PJRT backends don't expose cost analysis on loaded
            # executables; fall back to a crude analytic floor so the
            # bench still reports SOMETHING hardware-denominated, labeled
            flops, byts = _analytic_window_model(cg, counts)
            source = "analytic_floor"
            have_mem = False
            break
        flops += float(ca.get("flops", 0.0)) * cnt
        byts += float(ca.get("bytes accessed", 0.0)) * cnt
        mem = ca.get("_mem")
        if mem is None:
            have_mem = False
        else:
            # per-dispatch physical HBM traffic estimate: every argument
            # read once, output written once, temps written+read once.
            # An ESTIMATE, not a bound in either direction: gathers may
            # touch only part of an argument (overcount), re-reads of a
            # hot argument are counted once (undercount), temps may live
            # in VMEM (overcount). Still physically scaled, unlike the
            # logical count, which fusion can inflate far beyond 100% of
            # the HBM peak.
            phys += (mem["arg_bytes"] + mem["out_bytes"]
                     + 2 * mem["temp_bytes"]) * cnt
            peak_hbm_window = max(peak_hbm_window, mem["peak_bytes"])
    cg.set_time(0)
    st.fb.set_time(0)
    flops += _resampler_flops(st, length_sec)
    out = {
        "gflops_per_s": round(flops / chip_s / 1e9, 1),
        "hbm_gbps_logical": round(byts / chip_s / 1e9, 1),
        "window_gflops": round(flops / 1e9, 2),
        "window_gbytes_logical": round(byts / 1e9, 2),
        "source": source,
    }
    if have_mem:
        out["hbm_gbps_phys_est"] = round(phys / chip_s / 1e9, 1)
        out["window_gbytes_phys_est"] = round(phys / 1e9, 3)
        out["peak_hbm_window_mb"] = round(peak_hbm_window / 1e6, 1)
    import jax

    peaks = chip_peaks(jax.devices()[0])
    if peaks is not None:
        peak_tflops, peak_gbps = peaks
        out["mxu_util_pct"] = round(
            flops / chip_s / (peak_tflops * 1e12) * 100.0, 2
        )
        out["hbm_util_pct"] = round(
            byts / chip_s / (peak_gbps * 1e9) * 100.0, 2
        )
        # which wall is closer: judge HBM by the physically-scaled
        # estimate when available (the logical count can exceed 100% of
        # peak on fused programs — that's fusion SAVING traffic, not a
        # saturated bus). When both walls sit below 2%, the window is
        # dominated by fixed per-dispatch latency, not a roofline.
        #
        # VERDICT r4 weak 1: the phys estimate counts temps written+read
        # to HBM once each, which over-counts scan state XLA keeps
        # VMEM-resident or aliases in place — in the r4b capture it read
        # up to 238% of the bus peak. A traffic estimate ABOVE the
        # physical bus peak is impossible traffic; it cannot name the
        # binding wall, so it is never emitted as a utilization claim
        # and the label demotes to "estimate-unreliable".
        hbm_pct = out["hbm_util_pct"]
        if have_mem:
            hbm_pct = round(phys / chip_s / (peak_gbps * 1e9) * 100.0, 2)
            if hbm_pct <= 100.0:
                out["hbm_util_pct_phys_est"] = hbm_pct
            else:
                out["phys_est_exceeds_peak"] = True
        out["bound"] = bound_label(out["mxu_util_pct"], hbm_pct)
    return out


def roofline_extras(states: dict, extra: dict, length_sec: float) -> None:
    """Fill extra["c*_util"] for every measured config (bench.py child)."""
    for name, st in states.items():
        chip_ms = extra.get(f"{name}_chip_p50_ms")
        if chip_ms is None:
            continue
        try:
            util = config_roofline(st, chip_ms / 1e3, length_sec)
        except Exception as e:
            extra[f"{name}_util_error"] = str(e)[:200]
            continue
        if util is None:
            extra[f"{name}_util_error"] = "cost analysis unavailable"
            continue
        extra[f"{name}_util"] = util
        phys = (f" ({util['hbm_gbps_phys_est']} GB/s phys-est)"
                if "hbm_gbps_phys_est" in util else "")
        log(f"{name}: {util['gflops_per_s']} GFLOP/s, "
            f"{util['hbm_gbps_logical']} GB/s logical{phys}"
            + (f" -> {util.get('mxu_util_pct')}% MXU / "
               f"{util.get('hbm_util_pct_phys_est', util.get('hbm_util_pct'))}"
               f"% HBM ({util.get('bound')}-bound)"
               if "bound" in util else ""))
