"""Multi-chip sharding: frame-axis and clip-axis data parallelism."""

from .mesh import (
    CLIP_AXIS,
    FRAME_AXIS,
    MultiClipEngine,
    ShardedCRTEngine,
    make_mesh,
)

__all__ = [
    "CLIP_AXIS",
    "FRAME_AXIS",
    "MultiClipEngine",
    "ShardedCRTEngine",
    "make_mesh",
]
