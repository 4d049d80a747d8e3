"""Hand-written Pallas TPU kernels for ops where XLA's lowering is weak
(elementwise gathers). Each has an XLA fallback in pythoncrt_tpu.ops."""

from . import warp

__all__ = ["warp"]
