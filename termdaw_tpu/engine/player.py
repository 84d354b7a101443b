"""Wall-clock-paced playback: render blocks just ahead of real time.

Mirrors the reference's engine-side playback loop (ui_workflow.rs:195-211):
while wall-elapsed milliseconds exceed generated milliseconds (minus a
0.5 ms lead — the reference's comment says half a second but the code
compares milliseconds, ui_workflow.rs:200-201), render one block, interleave
and queue it; poll every 10 ms.

The block render goes through the compiled window program with nb=1 (one
compile, reused every block). `tick()` is driven by the workflow loop.
"""

from __future__ import annotations

import time

import numpy as np


class Player:
    def __init__(self, state, sink, proj_sr: int, buffer_len: int) -> None:
        self.state = state
        self.sink = sink
        self.proj_sr = proj_sr
        self.buffer_len = buffer_len
        self.playing = False
        self.since = time.monotonic()
        self.millis_generated = 0.0
        self.resync_fb_each_block = False  # stream workflow turns this on

    # blocks rendered and queued BEFORE the wall clock starts: absorbs
    # per-window dispatch+fetch latency spikes so the instantaneous
    # deficit stays bounded (~341 ms of audio at 48k/1024; measured
    # tunnel hiccups reach ~300 ms against an unbuffered start)
    PREBUFFER_BLOCKS = 16
    # lead (in blocks) that tick() MAINTAINS while playing. The reference
    # paces to a 0.5 ms lead (ui_workflow.rs:200-201), which on this
    # tunnel lets the prebuffer erode to zero and a single slow dispatch
    # then starves the sink (measured spikes ~250 ms). Rendering while
    # the queued lead is below this many blocks keeps the prebuffer's
    # margin for the whole session; audio sits in the sink queue, so the
    # worst instantaneous deficit is (spike - lead) instead of (spike).
    LEAD_BLOCKS = 16

    def play(self) -> None:
        if self.playing:
            return  # a second 'play' must not re-prebuffer / reset pacing
        cg = self.state.compiled
        if cg is not None and self.state.cs > 0:
            # pin bake-table caps to the full known schedule so playback
            # windows reuse one compiled layout per window size
            from ..engine.state import render_chunk_blocks

            cg.seed_caps(
                self.state.fb, self.state.cs,
                render_chunk_blocks(self.state.cs),
            )
        self.playing = True
        self._restart_pacing()
        self.sink.resume()

    def _restart_pacing(self) -> None:
        """Reset the pacing epoch and queue the prebuffer lead."""
        cg = self.state.compiled
        self.millis_generated = 0.0
        if cg is not None and self.PREBUFFER_BLOCKS > 0:
            nb = self.PREBUFFER_BLOCKS
            audio = cg.render_window(self.state.fb, nb)
            self.state.fb.advance_blocks(nb)
            self.sink.queue_audio(np.asarray(audio).reshape(-1))
            self.millis_generated = nb * self.buffer_len / self.proj_sr * 1e3
        self.since = time.monotonic()

    def pause(self) -> None:
        self.playing = False
        self.sink.pause()

    def stop(self) -> None:
        self.playing = False
        self.sink.pause()
        self.sink.clear()
        if self.state.compiled is not None:
            self.state.compiled.set_time(0)
        self.state.fb.set_time(0)

    def seek(self, t_frames: int) -> None:
        self.sink.clear()
        if self.state.compiled is not None:
            self.state.compiled.set_time(t_frames)
        self.state.fb.set_time(t_frames)
        if self.playing:
            # clear() discarded the queued lead; without re-prebuffering,
            # playback would continue just-in-time on an empty queue and
            # every dispatch spike from here on would underrun
            self._restart_pacing()

    # window sizes for catch-up batching: a deficit of many blocks renders
    # in one device call (each call costs a fixed sync round-trip on the
    # TPU tunnel, so block-at-a-time rendering can't keep up at 48kHz);
    # powers of two keep the jit cache small
    _WINDOWS = (32, 16, 8, 4, 2, 1)

    def tick(self) -> int:
        """Render as many blocks as wall-clock pacing demands.
        Returns the number of blocks rendered (0 = idle)."""
        rendered = 0
        if not self.playing:
            return 0
        if not self.state.loaded:
            self.playing = False
            return 0
        cg = self.state.compiled
        block_ms = self.buffer_len / self.proj_sr * 1000.0
        while True:
            # `stop()`/`pause()` from another thread must be able to end a
            # long catch-up drain: when per-block dispatch+fetch latency
            # rides at the block budget (~21 ms at 48k/1024 on the dev
            # tunnel) the deficit never reaches zero and this loop runs
            # for as long as playback is wanted — which is correct
            # (audio keeps flowing, reference ui_workflow.rs:199-208
            # drains identically) but must stay interruptible.
            if not self.playing:
                break
            elapsed_ms = (time.monotonic() - self.since) * 1000.0
            lead_ms = self.LEAD_BLOCKS * block_ms
            deficit_ms = elapsed_ms - (self.millis_generated - lead_ms)
            if deficit_ms <= 0:
                break
            want = max(1, int(deficit_ms / block_ms) + 1)
            nb = next(w for w in self._WINDOWS if w <= want)
            if self.resync_fb_each_block:
                self.state.fb.set_time(cg.get_time())
            audio = cg.render_window(self.state.fb, nb)
            self.state.fb.advance_blocks(nb)
            chunk = np.asarray(audio)  # [nb*bl, 2]
            self.sink.queue_audio(chunk.reshape(-1))
            self.millis_generated += nb * block_ms
            rendered += nb
        return rendered
