"""Native effect suite tests: sanity, parameter plumbing, and exact
cross-window state chaining (delay tails, scan carries)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from termdaw_tpu.engine.plugins import PluginHost, AddPluginError
from termdaw_tpu.ops.fx import (
    EFFECTS, resolve_uri, resolve_param, feedback_line, max_decay_scan,
    static_values,
)

SR = 8000


def a(x):
    return np.asarray(x)


def process(kind, x, params=None, state=None, sr=SR):
    eff = EFFECTS[kind]
    p = dict(eff.defaults)
    if params:
        p.update(params)
    static = static_values(eff, p)
    p = {k: jnp.float32(v) for k, v in p.items()
         if k not in eff.static_params}
    st = state if state is not None else eff.init_state(sr, static)
    fn = jax.jit(lambda x, st, p: eff.process(x, st, p, sr, static))
    return fn(jnp.asarray(x), st, p)


class TestBuildingBlocks:
    def test_feedback_line_matches_sequential(self, rng):
        x = rng.normal(size=(300, 2)).astype(np.float32)
        D, g = 37, 0.7
        y, tail = jax.jit(
            lambda x, t: feedback_line(x, t, g, D)
        )(jnp.asarray(x), jnp.zeros((D, 2), jnp.float32))
        # sequential oracle
        exp = np.zeros_like(x, dtype=np.float64)
        for t in range(len(x)):
            prev = exp[t - D] if t >= D else 0.0
            exp[t] = x[t] + g * prev
        np.testing.assert_allclose(a(y), exp, atol=1e-4)
        np.testing.assert_allclose(a(tail), exp[-D:], atol=1e-4)

    def test_feedback_line_chains_across_windows(self, rng):
        x = rng.normal(size=(256, 2)).astype(np.float32)
        D, g = 31, 0.6
        f = jax.jit(lambda x, t: feedback_line(x, t, g, D))
        full, _ = f(jnp.asarray(x), jnp.zeros((D, 2), jnp.float32))
        tail = jnp.zeros((D, 2), jnp.float32)
        parts = []
        for i in range(0, 256, 64):
            y, tail = f(jnp.asarray(x[i : i + 64]), tail)
            parts.append(a(y))
        np.testing.assert_allclose(np.concatenate(parts), a(full), atol=1e-4)

    def test_max_decay_scan(self, rng):
        x = np.abs(rng.normal(size=(200, 1))).astype(np.float32)
        r = 0.95
        y = a(jax.jit(lambda x: max_decay_scan(x, r, jnp.zeros(1)))(
            jnp.asarray(x)))
        exp = np.zeros_like(x)
        prev = 0.0
        for t in range(len(x)):
            prev = max(x[t, 0], r * prev)
            exp[t, 0] = prev
        np.testing.assert_allclose(y, exp, atol=1e-5)


    def test_biquad_sequential_matches_float64(self, rng):
        """The exact lane reproduces a per-frame float64 recurrence to f32
        rounding (VERDICT weak 10 precision fallback)."""
        from termdaw_tpu.ops.filters import (
            biquad_apply_sequential, biquad_coefs, biquad_init_state,
        )

        x = rng.normal(size=(4096, 2)).astype(np.float32)
        coefs = biquad_coefs("lowpass", 800.0, 48000)
        y, _ = jax.jit(biquad_apply_sequential)(
            jnp.asarray(x), coefs, biquad_init_state(2)
        )
        b0, b1, b2, a1, a2 = [float(c) for c in coefs]
        exp = np.zeros_like(x, dtype=np.float64)
        x64 = x.astype(np.float64)
        for t in range(len(x)):
            x1 = x64[t - 1] if t >= 1 else 0.0
            x2 = x64[t - 2] if t >= 2 else 0.0
            y1 = exp[t - 1] if t >= 1 else 0.0
            y2 = exp[t - 2] if t >= 2 else 0.0
            exp[t] = b0 * x64[t] + b1 * x1 + b2 * x2 - a1 * y1 - a2 * y2
        np.testing.assert_allclose(a(y), exp, atol=5e-5)

    @pytest.mark.slow
    def test_biquad_parallel_close_to_sequential(self, rng):
        """Bounds the parallel prefix-scan reassociation error the code
        documents (~1e-3 relative over long windows)."""
        from termdaw_tpu.ops.filters import (
            biquad_apply, biquad_apply_sequential, biquad_coefs,
            biquad_init_state,
        )

        x = rng.normal(size=(32768, 2)).astype(np.float32)
        coefs = biquad_coefs("highpass", 120.0, 48000)
        ys, _ = jax.jit(biquad_apply_sequential)(
            jnp.asarray(x), coefs, biquad_init_state(2)
        )
        yp, _ = jax.jit(biquad_apply)(
            jnp.asarray(x), coefs, biquad_init_state(2)
        )
        scale = np.max(np.abs(a(ys))) + 1e-9
        assert np.max(np.abs(a(yp) - a(ys))) / scale < 2e-3

    def test_exact_biquad_env_routes_sequential(self, rng, monkeypatch):
        from termdaw_tpu.ops import filters

        monkeypatch.setenv("TERMDAW_EXACT_BIQUAD", "1")
        x = rng.normal(size=(512, 2)).astype(np.float32)
        coefs = filters.biquad_coefs("lowpass", 1000.0, 48000)
        ye, _ = filters.biquad_apply(
            jnp.asarray(x), coefs, filters.biquad_init_state(2)
        )
        ys, _ = filters.biquad_apply_sequential(
            jnp.asarray(x), coefs, filters.biquad_init_state(2)
        )
        np.testing.assert_array_equal(a(ye), a(ys))


class TestEffects:
    @pytest.mark.slow
    def test_reverb_tail_rings(self):
        x = np.zeros((SR, 2), np.float32)
        x[0] = 1.0  # impulse
        y, _ = process("reverb", x)
        y = a(y)
        # energy must persist well after the impulse (a tail)
        assert np.max(np.abs(y[SR // 2 :])) > 1e-4
        assert np.all(np.isfinite(y))

    @pytest.mark.slow
    def test_reverb_chains_across_windows(self, rng):
        x = rng.normal(size=(1024, 2)).astype(np.float32) * 0.2
        full, _ = process("reverb", x)
        eff = EFFECTS["reverb"]
        st = eff.init_state(SR, {})
        p = {k: jnp.float32(v) for k, v in eff.defaults.items()}
        fn = jax.jit(lambda x, st: eff.process(x, st, p, SR, {}))
        parts = []
        for i in range(0, 1024, 256):
            y, st = fn(jnp.asarray(x[i : i + 256]), st)
            parts.append(a(y))
        np.testing.assert_allclose(
            np.concatenate(parts), a(full), atol=1e-4
        )

    def test_compressor_reduces_loud(self):
        t = np.arange(SR) / SR
        x = np.stack([np.sin(2 * np.pi * 100 * t)] * 2, 1).astype(np.float32)
        y, _ = process(
            "compressor", x,
            {"threshold": -20.0, "ratio": 10.0, "attack": 1.0,
             "release": 50.0, "knee": 0.0},
        )
        # steady state: 0 dBFS input with -20dB threshold, ratio 10
        # -> output ~ -18 dB
        rms_in = np.sqrt(np.mean(x[SR // 2 :, 0] ** 2))
        rms_out = np.sqrt(np.mean(a(y)[SR // 2 :, 0] ** 2))
        assert rms_out < rms_in * 0.25

    def test_chorus_modulates(self):
        t = np.arange(SR // 2) / SR
        x = np.stack([np.sin(2 * np.pi * 440 * t)] * 2, 1).astype(np.float32)
        y, _ = process("chorus", x, {"rate": 2.0, "depth": 5.0})
        y = a(y)
        assert np.all(np.isfinite(y))
        # output differs from input (modulated delays)
        assert np.max(np.abs(y[1000:] - x[1000:])) > 0.05

    def test_tape_saturates(self):
        x = np.full((1000, 2), 0.95, np.float32)
        y, _ = process("tape", x, {"drive": 5.0})
        assert np.max(a(y)) <= 1.0 + 1e-5

    def test_delay_echoes(self):
        x = np.zeros((SR, 2), np.float32)
        x[100] = 1.0
        y, _ = process("delay", x, {"time": 125.0, "feedback": 0.5})
        y = a(y)
        d = int(0.125 * SR)
        assert abs(y[100 + d, 0]) > 0.4   # first echo
        assert abs(y[100 + 2 * d, 0]) > 0.2  # second echo

    def test_delay_exact_comb_high_feedback(self):
        """Impulse response must match the exact comb y[t]=x[t]+fb*y[t-D]
        for fb=0.9 far beyond any truncated echo horizon (VERDICT r1 #6)."""
        fb, time_ms = 0.9, 50.0
        D = int(round(time_ms / 1000.0 * SR))
        n_echo = 20
        x = np.zeros((D * (n_echo + 1), 2), np.float32)
        x[0] = 1.0
        y, _ = process("delay", x, {"time": time_ms, "feedback": fb})
        y = a(y)
        for k in range(n_echo + 1):
            np.testing.assert_allclose(
                y[k * D, 0], fb ** k, rtol=1e-3,
                err_msg=f"echo {k} wrong",
            )
        # nothing between echoes
        assert abs(y[D // 2, 0]) < 1e-6

    def test_delay_chains_across_windows(self, rng):
        x = rng.normal(size=(1200, 2)).astype(np.float32) * 0.3
        prm = {"time": 37.5, "feedback": 0.8}
        full, _ = process("delay", x, prm)
        eff = EFFECTS["delay"]
        static = static_values(eff, {**eff.defaults, **prm})
        st = eff.init_state(SR, static)
        p = {"feedback": jnp.float32(0.8)}
        fn = jax.jit(lambda x, st: eff.process(x, st, p, SR, static))
        parts = []
        for i in range(0, 1200, 300):
            y, st = fn(jnp.asarray(x[i : i + 300]), st)
            parts.append(a(y))
        np.testing.assert_allclose(np.concatenate(parts), a(full), atol=1e-4)

    def test_bitcrush(self):
        x = np.linspace(-1, 1, 100, dtype=np.float32)[:, None].repeat(2, 1)
        y, _ = process("bitcrush", x, {"bits": 3.0})
        assert len(np.unique(a(y)[:, 0])) <= 9


class TestPluginHost:
    def test_uri_resolution(self):
        assert resolve_uri("http://calf.sourceforge.net/plugins/Reverb").kind \
            == "reverb"
        assert resolve_uri("http://x/MultiChorus").kind == "chorus"
        assert resolve_uri("native:tape").kind == "tape"
        assert resolve_uri("http://unknown/Phaser9000") is None

    def test_param_aliases(self):
        assert resolve_param("Attack") == "attack"
        assert resolve_param("Room Size") == "room"
        assert resolve_param("nonsense") is None

    def test_host_lifecycle(self, capsys):
        h = PluginHost()
        h.add_plugin("native:compressor", "c")
        h.set_value("c", "Ratio", 8.0)
        assert h.param_values(h.get_index("c"))["ratio"] == 8.0
        h.reset_value("c", "Ratio")
        assert h.param_values(h.get_index("c"))["ratio"] == 4.0
        with pytest.raises(AddPluginError):
            h.add_plugin("native:compressor", "c")  # dup name
        with pytest.raises(AddPluginError):
            h.add_plugin("http://unknown/Thing", "x")
        h.set_value("c", "NoSuchParam", 1.0)
        assert "has no parameter" in capsys.readouterr().out
        h.remove_plugin("c")
        assert h.get_index("c") is None

    def test_version_tracks_param_mutations(self, capsys):
        """PluginHost.version must bump on every mutation that can change
        param_values() (CompiledGraph._pack_fx memoizes against it) and
        stay put on no-op failures."""
        h = PluginHost()
        v0 = h.version
        h.add_plugin("native:compressor", "c")
        assert h.version > v0
        v1 = h.version
        h.set_value("c", "Ratio", 8.0)
        assert h.version > v1
        v2 = h.version
        h.set_value("c", "NoSuchParam", 1.0)   # rejected: no bump
        h.set_value("nope", "Ratio", 1.0)      # unknown plugin: no bump
        h.reset_value("c", "Attack")           # nothing stored: no bump
        assert h.version == v2
        h.reset_value("c", "Ratio")            # stored override popped
        assert h.version > v2
        v3 = h.version
        h.remove_plugin("c")
        assert h.version > v3
        capsys.readouterr()


class TestEq3AndFlanger:
    @pytest.mark.slow
    def test_eq3_band_gains(self):
        sr = 8000
        t = np.arange(sr) / sr
        low = np.sin(2 * np.pi * 60 * t)
        high = np.sin(2 * np.pi * 3500 * t)
        x = np.stack([low + high] * 2, 1).astype(np.float32)
        y, _ = process(
            "eq3", x,
            {"low_gain": -40.0, "high_gain": 0.0, "low_freq": 250.0,
             "high_freq": 2000.0},
            sr=sr,
        )
        y = a(y)
        # the 60 Hz component must be strongly attenuated, 3.5k kept
        spec = np.abs(np.fft.rfft(y[sr // 2 :, 0]))
        freqs = np.fft.rfftfreq(sr - sr // 2, 1 / sr)
        lo_bin = spec[np.argmin(np.abs(freqs - 60))]
        hi_bin = spec[np.argmin(np.abs(freqs - 3500))]
        assert lo_bin < hi_bin * 0.25

    @pytest.mark.slow
    def test_eq3_low_freq_param_moves_crossover(self):
        """VERDICT item 7 'Done' criterion: `parameter("eq", "low freq", x)`
        must actually move the LR4 crossover. A 400 Hz tone with the low
        band cut -40 dB is untouched when the crossover sits at 250 Hz
        (tone is in the mid band) and strongly attenuated when the
        crossover moves to 800 Hz (tone now in the low band)."""
        sr = 8000
        t = np.arange(sr) / sr
        x = np.stack([np.sin(2 * np.pi * 400 * t)] * 2, 1).astype(np.float32)

        def level(low_freq):
            y, _ = process(
                "eq3", x,
                {"low_gain": -40.0, "high_gain": 0.0,
                 "low_freq": low_freq, "high_freq": 3000.0},
                sr=sr,
            )
            tail = a(y)[sr // 2 :, 0]
            return float(np.sqrt(np.mean(tail**2)))

        kept = level(250.0)     # 400 Hz in the mid band: ~unity
        cut = level(800.0)      # 400 Hz in the low band: ~-40 dB
        assert kept > 0.5
        assert cut < kept * 0.1

    def test_flanger_runs_and_chains(self, rng):
        x = rng.normal(size=(512, 2)).astype(np.float32) * 0.3
        full, _ = process("flanger", x)
        eff = EFFECTS["flanger"]
        st = eff.init_state(SR, {})
        p = {k: jnp.float32(v) for k, v in eff.defaults.items()}
        fn = jax.jit(lambda x, st: eff.process(x, st, p, SR, {}))
        parts = []
        for i in range(0, 512, 128):
            y, st = fn(jnp.asarray(x[i : i + 128]), st)
            parts.append(a(y))
        # 1e-4: the LFO phase accumulates t0 in f32 across windows
        np.testing.assert_allclose(np.concatenate(parts), a(full), atol=1e-4)

    def test_uri_resolution_new(self):
        assert resolve_uri("http://x/Equalizer5Band").kind == "eq3"
        assert resolve_uri("native:flanger").kind == "flanger"
