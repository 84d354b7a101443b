"""Resource banks: samples, flowws (event streams), raw byte blobs.

Mirrors the reference's L1 layer (SampleBank sample.rs:187-349, FlowwBank
floww.rs:6-146, BufferBank bufferbank.rs:11-83) including the mark-dead +
compacting-refresh hot-reload protocol.
"""

from .samplebank import Sample, SampleBank, SampleLoadMethod
from .flowwbank import FlowwBank
from .bufferbank import BufferBank

__all__ = ["Sample", "SampleBank", "SampleLoadMethod", "FlowwBank", "BufferBank"]
