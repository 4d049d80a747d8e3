"""Pallas TPU kernel for the glitch row-shear.

The glitch gathers each bottom-band row by a per-(row, segment) pixel
offset with modulo wrap (crt_filter.py:852-858). XLA lowers that
take_along_axis to a scalar-loop gather (~13 ms/frame at 1080p,
measured). The structure is friendlier than a general gather: within a
row the offset is piecewise-constant over segments, and the modulo wrap
is exactly a circular rotate — so each (row, segment) is one dynamic
lane-roll of the row followed by a masked select:

    out[x] = row[(x + off[r, seg(x)]) mod W] = roll(row, -off)[x]

This is a pure VPU kernel (no gathers, no matmuls) and bit-exact: the
roll moves values, never recomputes them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TR = 8  # band rows per program (f32 sublane quantum)


def _glitch_kernel(band_ref, offw_ref, out_ref, *, w: int, seg_len: int, nseg: int):
    # band_ref: (1, 3, TR, W) f32; offw_ref: (1, TR, NSEG) int32 in [0, W)
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    sid = xs // seg_len  # (1, W) static segment ids
    for r in range(TR):
        row = band_ref[0, :, r, :]  # (3, W)
        acc = row
        for s in range(nseg):
            off = offw_ref[0, r, s]
            # roll(x, shift)[k] = x[(k - shift) mod W]; want x[(k + off) mod W]
            rolled = pltpu.roll(row, w - off, axis=1)
            acc = jnp.where(sid == s, rolled, acc)
        out_ref[0, :, r, :] = acc


def shear_planar(band: jax.Array, offw: jax.Array, seg_len: int,
                 interpret: bool = False) -> jax.Array:
    """band (B, 3, R, W) f32; offw (B, R, NSEG) int32 with values in
    [0, W); segment s covers columns [s*seg_len, (s+1)*seg_len).
    Requires R % 8 == 0 and W % 128 == 0."""
    b, _, r, w = band.shape
    nseg = offw.shape[-1]
    assert r % TR == 0 and w % 128 == 0, (r, w)
    grid = (b, r // TR)
    return pl.pallas_call(
        functools.partial(_glitch_kernel, w=w, seg_len=seg_len, nseg=nseg),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, TR, w), lambda bb, rb: (bb, 0, rb, 0)),
            pl.BlockSpec((1, TR, nseg), lambda bb, rb: (bb, rb, 0)),
        ],
        out_specs=pl.BlockSpec((1, 3, TR, w), lambda bb, rb: (bb, 0, rb, 0)),
        out_shape=jax.ShapeDtypeStruct(band.shape, jnp.float32),
        interpret=interpret,
    )(band, offw)


def shear_band_batched(
    imgs: jax.Array,
    y0: int,
    seg_offsets_px: jax.Array,
    seg_len: int,
    interpret: bool = False,
) -> jax.Array:
    """Batched glitch: imgs (B, H, W, 3) f32; seg_offsets_px (B, rows,
    NSEG) f32 — the per-(row, segment) offsets BEFORE rounding (the
    reference rounds per pixel, crt_filter.py:855, but base+segment is
    constant within a segment so per-segment rint is identical). Pads
    the band upward to a multiple of 8 rows (zero offset = identity)."""
    b, h, w, _ = imgs.shape
    rows = h - y0
    if rows <= 0:
        return imgs
    pad = (-rows) % TR
    y0p = y0 - pad
    assert y0p >= 0, "band padding underflow — use the XLA fallback"

    offw = jnp.rint(seg_offsets_px).astype(jnp.int32) % w  # (B, rows, NSEG)
    if pad:
        ident = jnp.zeros((b, pad, offw.shape[-1]), jnp.int32)
        offw = jnp.concatenate([ident, offw], axis=1)

    band = jnp.transpose(imgs[:, y0p:], (0, 3, 1, 2))  # (B, 3, RP, W)
    out_band = shear_planar(band, offw, seg_len, interpret)
    out_band = jnp.transpose(out_band, (0, 2, 3, 1))  # (B, RP, W, 3)
    return jnp.concatenate([imgs[:, :y0p], out_band], axis=1)
