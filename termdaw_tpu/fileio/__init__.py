"""File-format IO: WAV codec, MIDI (SMF) parsing, wavetables, floww packets.

Everything here is first-party. The reference delegates these to external
Rust crates (`hound` for WAV, `floww` for MIDI+packets, `sampsyn` for
wavetables — reference Cargo.toml:12-24); the target environment has none of
them, so this package owns the formats.
"""
