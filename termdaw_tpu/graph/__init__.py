"""The audio graph: DAG of vertices, event baking, and XLA compilation.

The reference interprets its DAG per block with a recursive memoized pull
(graph.rs:98-121) calling per-frame Rust loops per vertex. Here the DAG is
*compiled*: after each refresh the reachable subgraph is topo-sorted and
lowered into one jitted XLA program that renders an arbitrary window of
blocks in a single device call — generators vectorized over the whole
window, IIR/normalize as associative scans, and note events pre-baked into
dense instance tables (graph/bake.py).
"""

from .graph import Graph, VertexDecl
from .compile import CompiledGraph

__all__ = ["Graph", "VertexDecl", "CompiledGraph"]
