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

    def play(self) -> None:
        self.playing = True
        self.since = time.monotonic()
        self.millis_generated = 0.0
        self.sink.resume()

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

    def tick(self) -> None:
        """Render as many blocks as wall-clock pacing demands."""
        if not self.playing:
            return
        if not self.state.loaded:
            self.playing = False
            return
        cg = self.state.compiled
        elapsed_ms = (time.monotonic() - self.since) * 1000.0
        while elapsed_ms > self.millis_generated - 0.5:
            if self.resync_fb_each_block:
                self.state.fb.set_time(cg.get_time())
            audio = cg.render_window(self.state.fb, 1)
            self.state.fb.set_time_to_next_block()
            chunk = np.asarray(audio)  # [bl, 2]
            self.sink.queue_audio(chunk.reshape(-1))
            self.millis_generated += (
                self.buffer_len / self.proj_sr * 1000.0
            )
