"""Row-shear glitch (JAX).

The heavy part — a per-row modulo-wrapped horizontal gather over the
bottom band (crt_filter.py:852-858 export, :680-685 preview) — runs on
device. The tiny per-row/segment random draws either come from the host
(reference-exact streams, see oracle.engine.glitch_fields_export) or are
generated on device with counter-based jax.random keys ("native" mode,
distribution-equivalent, fully jit-contained).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def shear_band(img: jnp.ndarray, y0: int, offsets_px: jnp.ndarray) -> jnp.ndarray:
    """Gather the band img[y0:] by per-(row, col) f32 pixel offsets with
    modulo wrap; rows above y0 pass through. offsets_px: (rows, W) or (rows,)."""
    h, w = img.shape[0], img.shape[1]
    if y0 >= h:
        return img
    bottom = img[y0:]
    x = jnp.arange(w, dtype=jnp.int32)[None, :]
    if offsets_px.ndim == 1:
        offs = jnp.rint(offsets_px)[:, None].astype(jnp.int32)
    else:
        offs = jnp.rint(offsets_px).astype(jnp.int32)
    xi = (x + offs) % w
    sheared = jnp.take_along_axis(bottom, xi[:, :, None], axis=1)
    return jnp.concatenate([img[:y0], sheared], axis=0)


def export_offsets(base: jnp.ndarray, seg_offsets: jnp.ndarray, seg_index: jnp.ndarray) -> jnp.ndarray:
    """Combine random-walk base [rows] + per-segment offsets [rows, segs]
    into full (rows, W) offsets via the static segment index map
    (crt_filter.py:851-853)."""
    return base[:, None] + jnp.take(seg_offsets, seg_index, axis=1)


def native_export_fields(
    key: jax.Array, rows: int, num_segs: int, amp_rows: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """On-device draw of (base [rows], seg_offsets [rows, segs]) matching the
    export algorithm's distribution (crt_filter.py:846-850): per-segment
    N(0,1)*0.7*amp and a clipped random-walk base."""
    k1, k2 = jax.random.split(key)
    seg = jax.random.normal(k1, (rows, num_segs), jnp.float32) * (amp_rows[:, None] * 0.7)
    rw = jax.random.normal(k2, (rows,), jnp.float32)
    base = jnp.clip(jnp.cumsum(rw) * 0.1, -amp_rows * 0.4, amp_rows * 0.4)
    return base, seg


def native_preview_offsets(key: jax.Array, rows: int, amp_rows: jnp.ndarray) -> jnp.ndarray:
    """On-device per-row offsets matching the preview algorithm's
    distribution (crt_filter.py:670-679)."""
    k1, k2, k3 = jax.random.split(key, 3)
    base = jnp.clip(jax.random.normal(k1, (rows,), jnp.float32) * 0.5, -1.0, 1.0)
    jump = (jax.random.uniform(k2, (rows,), jnp.float32) < 0.03).astype(jnp.float32)
    sign = jnp.where(jax.random.bernoulli(k3, 0.5, (rows,)), 1.0, -1.0).astype(jnp.float32)
    base = base + jump * sign
    return jnp.clip(base * amp_rows, -amp_rows, amp_rows)
