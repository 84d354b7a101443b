"""Kernel unit tests.

The ADSR vectors are the reference's only unit tests (adsr.rs:116-205),
re-expressed against our vectorized evaluators.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from termdaw_tpu.ops.adsr import (
    AdsrConf, hit_conf, build_adsr_conf,
    apply_ads, apply_r, apply_adsr, apply_r_rt, np_apply_ads,
)
from termdaw_tpu.ops import osc
from termdaw_tpu.ops.filters import (
    band_pass_timeline, BandPassState, gamma_from_cutoff,
)
from termdaw_tpu.ops.mix import (
    apply_angle, apply_gain, normalize_live, normalize_scan, sum_inputs,
)
from termdaw_tpu.ops.quantize import quantize_interleave, amplitude_for


def a(x):
    return np.asarray(x)


# This environment remote-compiles every eager op (PALLAS_AXON_REMOTE_COMPILE),
# which makes op-by-op dispatch pathologically slow. Production code always
# runs kernels inside one jitted graph program; tests do the same by jitting
# the kernel entry points (AdsrConf is a hashable NamedTuple -> static).
apply_ads = jax.jit(apply_ads, static_argnums=0)
apply_r = jax.jit(apply_r, static_argnums=0)
apply_adsr = jax.jit(apply_adsr, static_argnums=0)
apply_r_rt = jax.jit(apply_r_rt, static_argnums=0)
apply_angle = jax.jit(apply_angle)
apply_gain = jax.jit(apply_gain)
sum_inputs = jax.jit(sum_inputs)
normalize_live = jax.jit(normalize_live)
normalize_scan = jax.jit(normalize_scan)
band_pass_timeline = jax.jit(band_pass_timeline, static_argnums=4)
osc_square = jax.jit(osc.square_sine)
osc_topflat = jax.jit(osc.topflat_sine)
osc_triangle = jax.jit(osc.triangle)
osc_note_hz = jax.jit(osc.note_hz)


class TestAdsr:
    def test_adsr_0(self):  # reference adsr.rs:121-133
        conf = hit_conf(1.0, 1.0, 0.5, 1.0, 0.25, 1.0)
        ts = [0.0, 0.5, 1.0, 1.5, 2.0, 2.5, 3.0, 3.5, 4.0, 8.0]
        expect = [0.0, 0.5, 1.0, 0.75, 0.5, 0.375, 0.25, 0.125, 0.0, 0.0]
        got = a(apply_adsr(conf, jnp.asarray(ts)))
        np.testing.assert_allclose(got, expect, atol=1e-3)

    def test_adsr_1(self):  # reference adsr.rs:136-150
        conf = hit_conf(1.0, 1.0, 0.5, 1.0, 0.25, 1.0)
        ads_ts = [0.5, 1.0, 1.5, 2.0, 2.5, 3.0, 7.0]
        ads_expect = [0.5, 1.0, 0.75, 0.5, 0.375, 0.25, 0.25]
        np.testing.assert_allclose(
            a(apply_ads(conf, jnp.asarray(ads_ts))), ads_expect, atol=1e-3
        )
        r_ts = [0.0, 0.5, 1.0, 9.0]
        r_expect = [0.25, 0.125, 0.0, 0.0]
        np.testing.assert_allclose(
            a(apply_r(conf, jnp.asarray(r_ts), 0.25)), r_expect, atol=1e-3
        )

    def test_adsr_2(self):  # reference adsr.rs:153-165
        conf = hit_conf(1.0, 1.0, 0.5, 2.0, 0.25, 1.0)
        np.testing.assert_allclose(
            a(apply_ads(conf, jnp.asarray([2.0, 3.0]))), [0.5, 0.375], atol=1e-3
        )
        np.testing.assert_allclose(
            a(apply_r(conf, jnp.asarray([0.0, 0.5, 1.0, 9.0]), 0.375)),
            [0.375, 0.1875, 0.0, 0.0], atol=1e-3,
        )

    def test_adsr_3(self):  # reference adsr.rs:168-180 (apply_r_rt)
        conf = hit_conf(1.0, 1.0, 0.5, 2.0, 0.25, 1.0)
        np.testing.assert_allclose(
            a(apply_r_rt(conf, jnp.asarray([0.0, 0.5, 1.0, 9.0]), 3.0)),
            [0.375, 0.1875, 0.0, 0.0], atol=1e-3,
        )

    def test_adsr_4_dipping(self):  # reference adsr.rs:183-204
        conf = AdsrConf(
            std_vel=1.0, attack_sec=1.0, attack_vel=0.0, decay_sec=0.5,
            decay_vel=0.0, sustain_sec=0.5, sustain_vel=0.0,
            release_sec=1.0, release_vel=1.0,
        )
        ts = [0.0, 0.5, 1.0, 1.5, 2.0, 2.5, 3.0, 4.0, 8.0]
        expect = [1.0, 0.5, 0.0, 0.0, 0.0, 0.5, 1.0, 1.0, 1.0]
        np.testing.assert_allclose(
            a(apply_adsr(conf, jnp.asarray(ts))), expect, atol=1e-3
        )

    def test_below_minus_one_clamps_to_sustain(self):
        """The reference clamps ANY apply_ads value <= -1.0 to sustain_vel
        (adsr.rs:62-69) — not just the past-window -1000 sentinel. A
        velocity below -1.0 makes a mid-segment lerp cross the threshold."""
        conf = AdsrConf(
            std_vel=0.0, attack_sec=1.0, attack_vel=-2.0, decay_sec=0.0,
            decay_vel=-2.0, sustain_sec=0.0, sustain_vel=0.7,
            release_sec=1.0, release_vel=0.0,
        )
        ts = jnp.asarray([0.0, 0.25, 0.5, 0.75, 1.0])
        got = a(apply_ads(conf, ts))
        # lerp(0, -2, t): crosses -1.0 at t=0.5 -> sustain_vel from there
        np.testing.assert_allclose(got, [0.0, -0.5, 0.7, 0.7, 0.7],
                                   atol=1e-6)
        # and apply_adsr routes <= -1.0 into the release lerp instead
        got2 = a(apply_adsr(conf, ts))
        assert got2[0] == 0.0 and got2[1] == -0.5
        # np oracle agrees
        from termdaw_tpu.ops.adsr import np_apply_ads

        np.testing.assert_allclose(
            np_apply_ads(conf, np.asarray([0.0, 0.25, 0.5, 0.75, 1.0])),
            [0.0, -0.5, 0.7, 0.7, 0.7], atol=1e-6,
        )

    def test_build_conf(self):
        assert build_adsr_conf([]) == AdsrConf()
        c6 = build_adsr_conf([0.1, 0.2, 0.5, 0.3, 0.25, 0.4])
        assert c6.attack_vel == 1.0 and c6.release_vel == 0.0
        c9 = build_adsr_conf([1, 2, 3, 4, 5, 6, 7, 8, 9])
        assert c9.release_vel == 9.0
        assert build_adsr_conf([1, 2, 3]) is None
        assert AdsrConf(std_vel=0.3, attack_vel=0.9).max_vel() == 0.9

    def test_jnp_matches_numpy_oracle(self, rng):
        conf = hit_conf(0.01, 0.1, 0.8, 5.0, 0.2, 0.5)
        ts = rng.uniform(0, 8, size=200).astype(np.float32)
        np.testing.assert_allclose(
            a(apply_ads(conf, jnp.asarray(ts))), np_apply_ads(conf, ts),
            atol=1e-6,
        )


class TestOsc:
    def test_square_sine_limits(self):
        t = jnp.linspace(0, 1, 1000)
        s = a(osc_square(t, 100.0, 0.3))
        assert np.max(np.abs(s)) <= 1.0 + 1e-5
        # z=1 -> pure sine
        s1 = a(osc_square(t, 100.0, 1.0))
        np.testing.assert_allclose(s1, np.sin(2 * np.pi * 100.0 * a(t)), atol=1e-4)

    def test_topflat(self):
        t = jnp.linspace(0, 0.01, 441)
        s = a(osc_topflat(t, 440.0, 0.5))
        assert np.max(s) <= 1.0 + 1e-5

    def test_triangle(self):
        # triangle of period 1: t=0 -> -1, t=0.25 -> 0, t=0.5 -> 1
        vals = a(osc_triangle(jnp.asarray([0.0, 0.25, 0.5, 0.75]), 1.0))
        np.testing.assert_allclose(vals, [-1.0, 0.0, 1.0, 0.0], atol=1e-6)

    def test_note_hz(self):
        np.testing.assert_allclose(a(osc_note_hz(69.0)), 440.0, rtol=1e-6)
        np.testing.assert_allclose(a(osc_note_hz(81.0)), 880.0, rtol=1e-6)


class TestMix:
    def test_pan_center_skip(self, rng):
        x = jnp.asarray(rng.normal(size=(64, 2)).astype(np.float32))
        np.testing.assert_array_equal(a(apply_angle(x, 0.0)), a(x))

    def test_pan_full_left(self, rng):
        x = jnp.ones((8, 2), jnp.float32)
        out = a(apply_angle(x, 90.0))
        # reference pan law (sample.rs:97-106): full left -> L amp 1.0, R 0.0
        np.testing.assert_allclose(out[:, 0], 1.0, atol=1e-4)
        np.testing.assert_allclose(out[:, 1], 0.0, atol=1e-4)
        # half left keeps constant power: l^2 + r^2 == 1 (x2 for both ch)
        half = a(apply_angle(jnp.ones((1, 2), jnp.float32), 45.0))
        np.testing.assert_allclose(half[0, 0] ** 2 + half[0, 1] ** 2, 1.0,
                                   atol=1e-4)

    def test_gain_skip_and_apply(self, rng):
        x = jnp.asarray(rng.normal(size=(16, 2)).astype(np.float32))
        np.testing.assert_array_equal(a(apply_gain(x, 1.0005)), a(x))
        np.testing.assert_allclose(a(apply_gain(x, 2.0)), a(x) * 2.0, rtol=1e-6)

    def test_sum_inputs_order(self):
        xs = [jnp.full((4, 2), v, jnp.float32) for v in (1.0, 2.0, 3.0)]
        np.testing.assert_allclose(a(sum_inputs(xs)), 6.0)

    def test_normalize_live_growth(self):
        # block peaks 0.5 then 2.0 then 1.0: scales are 1/0.5, 1/2, 1/2
        nb, bl = 3, 4
        x = np.zeros((nb, bl, 2), np.float32)
        x[0, 0, 0] = 0.5
        x[1, 0, 0] = 2.0
        x[2, 0, 0] = 1.0
        out, mx = normalize_live(jnp.asarray(x), jnp.float32(1e-6))
        out = a(out)
        assert abs(out[0, 0, 0] - 1.0) < 1e-6
        assert abs(out[1, 0, 0] - 1.0) < 1e-6
        assert abs(out[2, 0, 0] - 0.5) < 1e-6
        assert abs(float(mx) - 2.0) < 1e-6

    def test_normalize_scan_freezes(self):
        x = np.full((2, 4, 2), 0.25, np.float32)
        out, scan_max = normalize_scan(jnp.asarray(x), jnp.float32(2.0),
                                       jnp.float32(0.0))
        np.testing.assert_allclose(a(out), 0.125)
        assert abs(float(scan_max) - 0.25) < 1e-7


class TestBandPass:
    def test_lowpass_matches_sequential_oracle(self, rng):
        sr = 48000
        lg = gamma_from_cutoff(1000.0, sr)
        hg = gamma_from_cutoff(0.0, sr)  # = 0 -> low path only
        x = rng.normal(size=(512, 2)).astype(np.float32)
        out, st = band_pass_timeline(
            jnp.asarray(x), BandPassState.init(), lg, hg, True, 1.0
        )
        # sequential oracle (reference extensions.rs:653-689 semantics,
        # with the passr fix)
        lprev = np.array([x[0, 0], x[0, 1]], np.float64)
        exp = np.zeros_like(x)
        for i in range(len(x)):
            lprev = lprev + lg * (x[i] - lprev)
            cut = (1.0 * lprev + 0.0) * 0.5
            exp[i] = x[i] - cut  # pass mode
        np.testing.assert_allclose(a(out), exp, atol=1e-4)
        np.testing.assert_allclose(a(st.prevs)[:2], lprev, atol=1e-4)
        assert not bool(a(st.first))

    def test_skip_when_wet_zero(self, rng):
        x = jnp.asarray(rng.normal(size=(64, 2)).astype(np.float32))
        st = BandPassState.init()
        out, st2 = band_pass_timeline(x, st, 0.5, 0.5, True, 0.0)
        np.testing.assert_array_equal(a(out), a(x))
        assert bool(a(st2.first))  # state untouched

    def test_carry_across_windows(self, rng):
        """Two windows must equal one continuous run."""
        sr = 48000
        lg = gamma_from_cutoff(500.0, sr)
        x = rng.normal(size=(256, 2)).astype(np.float32)
        full, _ = band_pass_timeline(
            jnp.asarray(x), BandPassState.init(), lg, 0.0, False, 1.0
        )
        st = BandPassState.init()
        o1, st = band_pass_timeline(jnp.asarray(x[:128]), st, lg, 0.0, False, 1.0)
        o2, st = band_pass_timeline(jnp.asarray(x[128:]), st, lg, 0.0, False, 1.0)
        np.testing.assert_allclose(
            np.concatenate([a(o1), a(o2)]), a(full), atol=1e-5
        )


class TestQuantize:
    def test_values(self):
        x = jnp.asarray([[0.5, -0.5], [2.0, -2.0], [0.0, 1.0]], jnp.float32)
        out = a(quantize_interleave(x, 16))
        assert out[0] == int(0.5 * 32767)
        assert out[2] == 32767  # saturated
        assert out[3] == -32768
        assert out[5] == 32767

    def test_amplitude(self):
        assert amplitude_for(16) == 32767.0
        assert amplitude_for(24) == 8388607.0
        assert amplitude_for(32) == 2147483647.0


class TestResample:
    def test_sine_preserved(self):
        from termdaw_tpu.ops.resample import resample_sample

        from_sr, to_sr = 44100, 48000
        dur = 0.5
        t_in = np.arange(int(from_sr * dur)) / from_sr
        freq = 997.0
        x = np.stack([np.sin(2 * np.pi * freq * t_in)] * 2, 1).astype(np.float32)
        y = resample_sample(x, from_sr, to_sr)
        assert y.shape[0] == int(np.ceil(len(x) * to_sr / from_sr))
        t_out = np.arange(y.shape[0]) / to_sr
        expect = np.sin(2 * np.pi * freq * t_out)
        # ignore filter edges
        m = slice(512, y.shape[0] - 512)
        err = np.max(np.abs(y[m, 0] - expect[m]))
        assert err < 1e-3, f"resample error {err}"

    def test_downsample_antialias(self):
        from termdaw_tpu.ops.resample import resample_sample

        # a tone above the target nyquist must be strongly attenuated
        from_sr, to_sr = 96000, 48000
        t_in = np.arange(from_sr // 2) / from_sr
        x = np.stack([np.sin(2 * np.pi * 30000.0 * t_in)] * 2, 1).astype(np.float32)
        y = resample_sample(x, from_sr, to_sr)
        m = slice(512, y.shape[0] - 512)
        assert np.max(np.abs(y[m])) < 1e-2

    def test_identity(self):
        from termdaw_tpu.ops.resample import resample_sample

        x = np.random.default_rng(0).normal(size=(100, 2)).astype(np.float32)
        np.testing.assert_array_equal(resample_sample(x, 48000, 48000), x)

    @pytest.mark.slow
    @pytest.mark.parametrize(
        "from_sr,to_sr", [(48000, 44100), (96000, 48000), (44100, 48000)]
    )
    def test_streaming_equals_whole(self, from_sr, to_sr, rng):
        """Chunked StreamingResampler output must equal the one-shot
        resample of the concatenation to float32 reduction-order rounding
        (exact chunking — replaces the whole-bounce-only deviation,
        state.rs:533-561). 1e-5 is well below one 16-bit LSB (3.05e-5)."""
        import jax.numpy as jnp
        from termdaw_tpu.ops.resample import (
            StreamingResampler, resample_device,
        )

        n = 20000
        x = rng.normal(size=(n, 2)).astype(np.float32)
        whole = np.asarray(resample_device(jnp.asarray(x), from_sr, to_sr))

        for chunks in ([4096] * 4 + [n - 4 * 4096], [1000, 7000, 12000],
                       [n]):
            sr_ = StreamingResampler(from_sr, to_sr)
            outs = []
            i = 0
            for cn in chunks:
                outs.append(np.asarray(sr_.feed(jnp.asarray(x[i:i + cn]))))
                i += cn
            assert i == n
            outs.append(np.asarray(sr_.flush()))
            got = np.concatenate(outs, axis=0)
            assert got.shape == whole.shape, (got.shape, whole.shape)
            np.testing.assert_allclose(got, whole, atol=1e-5)

    @pytest.mark.parametrize("from_sr,to_sr", [(48000, 44100), (96000, 48000)])
    def test_render_whole_equals_chunked(self, from_sr, to_sr, rng):
        """render_whole (one-dispatch feed+flush of a complete signal,
        the render path) must match the chunked walk and the one-shot
        resample to reduction-order rounding, at the exact output
        length. Also: an empty render and a fresh-only contract."""
        import jax.numpy as jnp
        import pytest as _pytest
        from termdaw_tpu.ops.resample import (
            StreamingResampler, resample_device,
        )

        n = 20000
        x = rng.normal(size=(n, 2)).astype(np.float32)
        whole = np.asarray(resample_device(jnp.asarray(x), from_sr, to_sr))
        chunks = [4096] * 4 + [n - 4 * 4096]
        xs, i = [], 0
        for cn in chunks:
            xs.append(jnp.asarray(x[i:i + cn]))
            i += cn
        sr_ = StreamingResampler(from_sr, to_sr)
        got = np.asarray(sr_.render_whole(xs))
        assert got.shape == whole.shape, (got.shape, whole.shape)
        np.testing.assert_allclose(got, whole, atol=1e-5)
        # a used resampler must refuse (feed/flush bookkeeping differs)
        with _pytest.raises(AssertionError):
            sr_.render_whole(xs)
        # an empty render emits the empty chunk
        sr2 = StreamingResampler(from_sr, to_sr)
        assert np.asarray(sr2.render_whole([])).shape == (0, 2)


class TestSinF32:
    def test_accurate_sine_large_args(self, rng):
        """sin_f32 must stay libm-class (<= ~1e-6) where the TPU-native
        sin drifts to ~5e-4 at large arguments."""
        import jax
        import jax.numpy as jnp
        from termdaw_tpu.ops.osc import sin_f32

        x = rng.uniform(-3.9e5, 3.9e5, 20000).astype(np.float32)
        got = np.asarray(jax.jit(sin_f32)(jnp.asarray(x)))
        exact = np.sin(x.astype(np.float64))
        assert np.max(np.abs(got - exact)) < 2e-6

    def test_small_args_exactness(self, rng):
        import jax
        import jax.numpy as jnp
        from termdaw_tpu.ops.osc import sin_f32

        x = rng.uniform(-6.3, 6.3, 5000).astype(np.float32)
        got = np.asarray(jax.jit(sin_f32)(jnp.asarray(x)))
        exact = np.sin(x.astype(np.float64))
        assert np.max(np.abs(got - exact)) < 2e-7
