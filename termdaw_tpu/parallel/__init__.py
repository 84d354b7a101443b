"""Multi-chip scaling: device meshes + sequence-parallel timeline rendering.

The reference engine is deliberately single-threaded (SURVEY.md §2e); the
TPU-native analog of "more compute" is sharding the render timeline over a
`jax.sharding.Mesh` — see CompiledGraph.render_window_sharded
(graph/compile.py) for the collective design (all-gathered block maxima for
the causal Normalize prefix, affine-summary composition for IIR device
boundaries).
"""

from .mesh import make_mesh, sharded_render

__all__ = ["make_mesh", "sharded_render"]
