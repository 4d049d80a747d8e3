"""Separable Gaussian blur with replicate borders (JAX).

Tap-order-compatible with oracle.ops.gaussian_blur_replicate so f32
results match the ground truth bit-for-bit modulo VPU rounding of
identical operation sequences. The kernel is a static tuple of Python
floats, so each tap's multiply-add unrolls and XLA fuses the whole blur
with neighbouring elementwise stages.

Replaces cv2.GaussianBlur at crt_filter.py:610 (bloom) and :234 (triad
softness, computed host-side instead). A Pallas VMEM-tiled variant lives
in pythoncrt_tpu.kernels.bloom for large sigmas.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _blur_axis(img: jnp.ndarray, taps: tuple, axis: int) -> jnp.ndarray:
    k = len(taps)
    if k == 1:
        return img * taps[0]
    r = k // 2
    pad = [(0, 0)] * img.ndim
    pad[axis] = (r, r)
    padded = jnp.pad(img, pad, mode="edge")
    n = img.shape[axis]
    out = None
    for i, t in enumerate(taps):
        sl = [slice(None)] * img.ndim
        sl[axis] = slice(i, i + n)
        term = np.float32(t) * padded[tuple(sl)]
        out = term if out is None else out + term
    return out


def gaussian_blur_replicate(img: jnp.ndarray, taps_x: tuple, taps_y: tuple) -> jnp.ndarray:
    """Horizontal-then-vertical separable blur (same axis order as the oracle)."""
    out = img
    if len(taps_x) > 1:
        out = _blur_axis(out, taps_x, axis=1)
    if len(taps_y) > 1:
        out = _blur_axis(out, taps_y, axis=0)
    return out
