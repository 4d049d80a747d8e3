"""Device-side effect primitives (JAX/XLA; Pallas variants in ..kernels)."""

from . import blur, color, glitch, resize, warp

__all__ = ["blur", "color", "glitch", "resize", "warp"]
