"""WAV codec round-trip tests (replaces reference `hound` surface)."""

import numpy as np
import pytest

from termdaw_tpu.fileio.wav import read_wav, write_wav, WavWriter, WavError


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
def test_int_roundtrip(tmp_path, bits, rng):
    sr = 44100
    frames = 1000
    data = rng.uniform(-0.9, 0.9, size=(frames, 2)).astype(np.float32)
    path = tmp_path / f"t{bits}.wav"
    write_wav(path, data, sr, bits=bits)
    out, spec = read_wav(path, scale=True)
    assert spec.sample_rate == sr
    assert spec.channels == 2
    assert spec.bits_per_sample == bits
    assert spec.sample_format == "int"
    assert out.shape == (frames, 2)
    tol = 2.0 / (1 << (bits - 1))
    assert np.max(np.abs(out - data)) < tol


def test_float32_read(tmp_path):
    """Hand-build a float32 WAV and read it back."""
    import struct

    sr = 48000
    data = np.linspace(-1, 1, 256).astype(np.float32)
    raw = data.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVEfmt "
    hdr += struct.pack("<IHHIIHH", 16, 3, 1, sr, sr * 4, 4, 32)
    hdr += b"data" + struct.pack("<I", len(raw))
    p = tmp_path / "f32.wav"
    p.write_bytes(hdr + raw)
    out, spec = read_wav(p)
    assert spec.sample_format == "float"
    np.testing.assert_allclose(out[:, 0], data, rtol=0, atol=0)


def test_mono_and_raw_counts(tmp_path):
    sr = 22050
    data = np.array([[0.5], [-0.5], [1.0], [-1.0]], dtype=np.float32)
    p = tmp_path / "m.wav"
    write_wav(p, data, sr, bits=16)
    out, spec = read_wav(p, scale=False)
    assert spec.channels == 1
    # raw counts: 0.5 * 32767 truncated
    assert out[0, 0] == np.trunc(0.5 * 32767)
    assert out[2, 0] == 32767


def test_saturation(tmp_path):
    """Out-of-range floats saturate rather than wrap (Rust `as` semantics,
    reference state.rs:521)."""
    p = tmp_path / "s.wav"
    with WavWriter(p, 1, 8000, 16) as w:
        w.write_scaled(np.array([1e9, -1e9, 0.0], dtype=np.float32))
    out, _ = read_wav(p)
    assert out[0, 0] == 32767
    assert out[1, 0] == -32768
    assert out[2, 0] == 0


def test_streaming_writer_matches_oneshot(tmp_path, rng):
    data = rng.uniform(-1, 1, size=(500, 2)).astype(np.float32)
    p1, p2 = tmp_path / "a.wav", tmp_path / "b.wav"
    write_wav(p1, data, 48000, bits=24)
    amp = float((1 << 23) - 1)
    with WavWriter(p2, 2, 48000, 24) as w:
        for i in range(0, 500, 100):
            w.write_scaled(data[i : i + 100] * amp)
    assert p1.read_bytes() == p2.read_bytes()


def test_bad_file(tmp_path):
    p = tmp_path / "bad.wav"
    p.write_bytes(b"not a wav file")
    with pytest.raises(WavError):
        read_wav(p)


def test_odd_interleaved_tail_pushed_to_left(tmp_path):
    """A stereo data chunk with an odd value count: the dangling value
    becomes a final L frame (sample.rs:283-292), R zero-filled."""
    import struct

    vals = np.array([100, -100, 200, -200, 300], dtype="<i2")  # odd count
    data = vals.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 8000 * 4, 4, 16)
    body = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data + b"\x00"
    )
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    p = tmp_path / "odd.wav"
    p.write_bytes(blob)
    audio, spec = read_wav(p, scale=False)
    assert audio.shape == (3, 2)
    np.testing.assert_array_equal(audio[2], [300.0, 0.0])
