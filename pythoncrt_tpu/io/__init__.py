"""Host media I/O (decode/encode/probes) and transfer plumbing."""

from . import video

__all__ = ["video"]
