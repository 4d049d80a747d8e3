"""Pallas TPU kernel for the glitch row-shear.

The glitch gathers each bottom-band row by a per-(row, segment) pixel
offset with modulo wrap (crt_filter.py:852-858):

    out[x] = row[(x + off[r, seg(x)]) mod W]

XLA lowers that take_along_axis to a scalar-loop gather (~13 ms/frame
at 1080p, measured). Here the per-pixel source map u (computed
elementwise by XLA from the per-segment offsets) drives a one-hot MXU
matmul per (row, output tile): every added term is an exact zero except
the selected value. Values ride in a 2-term bf16 hi/lo split (error
bound ~2^-17 relative, far below the <=1 LSB output contract).
Alternatives measured and rejected on this toolchain: dynamic
per-(row, segment) lane-rolls (8.8 ms — DynamicRotate is multi-pass)
and HIGHEST-precision f32 matmuls (6.1 ms vs 4.4 ms for this kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

TR = 8  # band rows per program (f32 sublane quantum)
TX = 128  # output tile columns per matmul


def _glitch_kernel(band_ref, u_ref, out_ref, *, w: int, exact: bool):
    # band_ref: (1, 3, TR, W) f32; u_ref: (1, TR, W) int32 source columns
    # in [0, W). The gather runs as a one-hot MXU matmul per (row, output
    # tile). Two bf16 passes (hi + residual) reconstruct 16 mantissa
    # bits: max error ~2^-17 relative (~4e-6 measured) — ~160x below the
    # uint8 LSB budget. (Exact f32 would need a third term for the last
    # 8 bits; measured not worth it vs Precision.HIGHEST.)
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (w, TX), 0)
    for r in range(TR):
        row3 = band_ref[0, :, r, :]  # (3, W)
        r_hi = row3.astype(jnp.bfloat16)
        if exact:
            r_lo = (row3 - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        u_r = u_ref[0, r, :]  # (W,)
        for jt in range(w // TX):
            m = (iota_n == u_r[jt * TX:(jt + 1) * TX][None, :]).astype(jnp.bfloat16)
            acc = jnp.dot(r_hi, m, preferred_element_type=jnp.float32)
            if exact:
                acc = acc + jnp.dot(r_lo, m, preferred_element_type=jnp.float32)
            # fast (exact=False): single bf16 pass, ~2^-8 relative error
            out_ref[0, :, r, jt * TX:(jt + 1) * TX] = acc


def shear_planar(
    band: jax.Array, u: jax.Array, interpret: bool = False, exact: bool = True
) -> jax.Array:
    """band (B, 3, R, W) f32; u (B, R, W) int32 source columns in [0, W):
    out[b, c, r, x] = band[b, c, r, u[b, r, x]].
    Requires R % 8 == 0 and W % 128 == 0."""
    b, _, r, w = band.shape
    assert r % TR == 0 and w % 128 == 0, (r, w)
    grid = (b, r // TR)
    return pl.pallas_call(
        functools.partial(_glitch_kernel, w=w, exact=exact),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, TR, w), lambda bb, rb: (bb, 0, rb, 0)),
            pl.BlockSpec((1, TR, w), lambda bb, rb: (bb, rb, 0)),
        ],
        out_specs=pl.BlockSpec((1, 3, TR, w), lambda bb, rb: (bb, 0, rb, 0)),
        out_shape=jax.ShapeDtypeStruct(band.shape, jnp.float32),
        interpret=interpret,
    )(band, u)


def shear_band_batched(
    imgs: jax.Array,
    y0: int,
    seg_offsets_px: jax.Array,
    seg_len: int,
    interpret: bool = False,
    exact: bool = True,
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

    offw = jnp.rint(seg_offsets_px).astype(jnp.int32)  # (B, rows, NSEG)
    seg_index = jnp.arange(w, dtype=jnp.int32) // seg_len
    x = jnp.arange(w, dtype=jnp.int32)[None, None, :]
    u_band = (x + jnp.take(offw, seg_index, axis=2)) % w  # (B, rows, W)
    if pad:
        ident = jnp.broadcast_to(x, (b, pad, w))
        u_band = jnp.concatenate([ident, u_band], axis=1)

    band = jnp.transpose(imgs[:, y0p:], (0, 3, 1, 2))  # (B, 3, RP, W)
    out_band = shear_planar(band, u_band, interpret, exact)
    out_band = jnp.transpose(out_band, (0, 2, 3, 1))  # (B, RP, W, 3)
    # keep ORIGINAL rows above y0 (the pad rows went through the kernel
    # only to satisfy the 8-row grid; their values must pass through
    # untouched, not via the bf16-split identity)
    return jnp.concatenate([imgs[:, :y0], out_band[:, pad:]], axis=1)
