"""Stream workflow: live floww packets from stdin drive the graph.

Mirrors the reference (stream_workflow.rs:13-106): a reader thread decodes
binary floww packets from stdin (our first-party framing,
fileio/packets.py) and feeds them to the engine loop; on each feed the
consumed stream prefixes are trimmed, new events appended, and the floww
cursor re-synced to the graph time (stream_workflow.rs:63-71). Playback
starts immediately and re-syncs the cursor every block
(stream_workflow.rs:93-95). A decode error terminates the workflow
(reference exits the process, stream_workflow.rs:33-36).
"""

from __future__ import annotations

import queue
import sys
import threading

from ..engine.player import Player
from ..fileio.packets import PacketDecoder, PacketError
from ..utils.term import DEFAULT, RED


def run_stream_workflow(
    proj_sr: int, buffer_len: int, state, sink, input_stream=None,
    max_idle_s: float | None = None,
) -> None:
    raw_in = input_stream if input_stream is not None else sys.stdin.buffer
    feed_queue: queue.Queue = queue.Queue()

    def reader() -> None:
        dec = PacketDecoder()
        # read through the raw fd when possible: a daemon thread blocked in
        # a BufferedReader.read holds the buffer lock and aborts CPython at
        # interpreter shutdown ("could not acquire lock ... at interpreter
        # shutdown")
        import os

        try:
            fd = raw_in.fileno()
        except Exception:  # BytesIO etc. raise UnsupportedOperation
            fd = None

        def read_chunk():
            if fd is not None:
                return os.read(fd, 4096)
            return raw_in.read(4096)

        try:
            while True:
                data = read_chunk()
                if not data:
                    break
                for pkt in dec.feed(data):
                    feed_queue.put(("feed", [pkt]))
        except PacketError:
            print(f"{RED}Error: could not decode std input.{DEFAULT}")
            feed_queue.put(("fatal", None))
            return
        except OSError:
            pass
        feed_queue.put(("eof", None))

    t = threading.Thread(target=reader, daemon=True)
    t.start()

    player = Player(state, sink, proj_sr, buffer_len)
    player.resync_fb_each_block = True
    # live mode: the rendering lead is audible latency for incoming
    # events (an event lands behind `lead` ms of already-queued audio),
    # so trade underrun margin for responsiveness (~85 ms at 48k/1024)
    player.PREBUFFER_BLOCKS = 4
    player.LEAD_BLOCKS = 4
    if state.loaded:
        player.play()
    else:
        print(f"{RED}State not loaded!{DEFAULT}")

    import time as _time

    idle_since = _time.monotonic()
    while True:
        try:
            kind, payload = feed_queue.get(timeout=0.01)
            idle_since = _time.monotonic()
        except queue.Empty:
            player.tick()
            # like the reference, EOF does not stop playback
            # (stream_workflow.rs loops forever); max_idle_s gives batch
            # runs and tests a clean exit. Only trip it when no packets are
            # pending: a tick can block for seconds in first-use compiles
            # while input piles up in the queue.
            if max_idle_s is not None and feed_queue.empty() and (
                _time.monotonic() - idle_since > max_idle_s
            ):
                break
            continue
        if kind == "fatal":
            break
        if kind == "eof":
            continue
        if not state.loaded:
            print(f"{RED}State not loaded!{DEFAULT}")
            continue
        state.fb.trim_streams()
        msgs = state.fb.append_streams(payload)
        state.fb.set_time(state.compiled.get_time())
        if msgs:
            print(f"MSGs: {msgs}")
        # pace playback on EVERY iteration, not only when the queue is
        # momentarily empty: a sustained dense packet stream would
        # otherwise keep the queue non-empty for longer than the ~85 ms
        # lead and starve the sink while events pile up
        player.tick()
    sink.close()
