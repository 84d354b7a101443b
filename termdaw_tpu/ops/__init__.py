"""Compute kernels (JAX/XLA/Pallas) — the DSP math of every vertex.

All kernels are pure, shape-static, float32, and written to vectorize over
the render timeline: sequential semantics in the reference's per-frame Rust
loops (extensions.rs:310-689) become parallel formulations here —
first-order IIRs and causal peak-tracking are `associative_scan`s, envelope
clocks are analytic functions of event times, and voice queues are dense
masked instance tables baked by the host.
"""
