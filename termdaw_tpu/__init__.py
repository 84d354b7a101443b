"""termdaw_tpu — a TPU-native (JAX/XLA/Pallas) terminal DAW framework.

A from-scratch rebuild of the capabilities of the reference terminal DAW
(`codybloemhard/termdaw`, Rust): a Lua-scripted, graph-based, non-realtime
friendly digital audio workstation — re-architected for TPU hardware.

The project API is identical to the reference (see reference doc.md:56-130):
a `project.toml` config plus a Lua script that loads resources (WAV samples,
MIDI "flowws", effect plugins, raw blobs) and declares a DAG of audio
vertices. The engine, however, is entirely different: instead of a pull-based
recursive per-frame interpreter (reference graph.rs:98-121), each `refresh`
compiles the vertex DAG into jitted XLA programs:

* the **timeline engine** renders the whole song as one parallel program —
  generators are vectorized across the timeline, sequential semantics
  (1-pole IIR band-pass, causal normalize) become `associative_scan`s,
  and note events are pre-baked into dense, shape-static instance tables;
* the **block engine** is a `lax.scan` over fixed-size blocks with carried
  vertex state, used for live playback and the stream workflow.

Public entry points:
    python -m termdaw_tpu [workdir]   — CLI, same as the reference binary.
"""

__version__ = "0.1.0"
