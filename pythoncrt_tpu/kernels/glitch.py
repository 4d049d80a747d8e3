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

Offsets can't be precomputed like the warp's (they are per-frame
random), but they are SMALL: output tile jt only reads source columns
within +-max|off| of itself. The bounded-window kernel exploits that
with a circular row extension in VMEM and a K = TX + 2*CLAMP = 384
contraction instead of K = W (5x fewer MACs and 5x less VPU one-hot
building at 1080p). Draws beyond +-CLAMP px (beyond ~7 sigma at the c4
amplitude) route the whole batch to the full-width kernel via lax.cond,
so parity with the reference's unbounded Gaussians is unconditional.

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


CLAMP = 128  # bounded-window half-width (max |offset| the window covers)
KWIN = TX + 2 * CLAMP  # per-tile contraction width (384 vs full W)


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


def _glitch_kernel_window(band_ref, u_ref, out_ref, *, w: int, exact: bool):
    # Bounded-window variant: offsets are guaranteed in [-CLAMP, CLAMP]
    # (callers route larger draws to the exact fallback), so output tile
    # jt only reads source columns [jt*TX - CLAMP, (jt+1)*TX + CLAMP)
    # with circular wrap. Per row, a circularly-extended copy
    # ext[k] = row[(k - CLAMP) mod W] is built once in VMEM; each tile's
    # matmul then contracts K=KWIN=384 instead of K=W (5x fewer MACs and
    # 5x less VPU mask-building at 1080p). u_ref here carries UNWRAPPED
    # source columns x + off in [-CLAMP, W + CLAMP).
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (KWIN, TX), 0)
    for r in range(TR):
        row3 = band_ref[0, :, r, :]  # (3, W)
        ext = jnp.concatenate(
            [row3[:, w - CLAMP:], row3, row3[:, :CLAMP]], axis=1
        )  # (3, W + 2*CLAMP); ext[k] = row[(k - CLAMP) mod W]
        e_hi = ext.astype(jnp.bfloat16)
        if exact:
            e_lo = (ext - e_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        u_r = u_ref[0, r, :]  # (W,) unwrapped
        for jt in range(w // TX):
            win_hi = e_hi[:, jt * TX:jt * TX + KWIN]
            # in-window index: u + CLAMP - jt*TX in [0, KWIN)
            ul = u_r[jt * TX:(jt + 1) * TX] + (CLAMP - jt * TX)
            m = (iota_n == ul[None, :]).astype(jnp.bfloat16)
            acc = jnp.dot(win_hi, m, preferred_element_type=jnp.float32)
            if exact:
                win_lo = e_lo[:, jt * TX:jt * TX + KWIN]
                acc = acc + jnp.dot(win_lo, m, preferred_element_type=jnp.float32)
            out_ref[0, :, r, jt * TX:(jt + 1) * TX] = acc


def shear_planar(
    band: jax.Array, u: jax.Array, interpret: bool = False, exact: bool = True,
    window: bool = False,
) -> jax.Array:
    """band (B, 3, R, W) f32; u (B, R, W) int32 source columns:
    out[b, c, r, x] = band[b, c, r, u[b, r, x] mod W].
    Requires R % 8 == 0 and W % 128 == 0.

    window=True uses the bounded-window kernel: u must be UNWRAPPED
    x + off with off in [-CLAMP, CLAMP] (callers check; shear_band_batched
    routes violating batches to the exact fallback)."""
    b, _, r, w = band.shape
    assert r % TR == 0 and w % 128 == 0, (r, w)
    grid = (b, r // TR)
    kern = _glitch_kernel_window if window else _glitch_kernel
    return pl.pallas_call(
        functools.partial(kern, w=w, exact=exact),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, TR, w), lambda bb, rb: (bb, 0, rb, 0)),
            pl.BlockSpec((1, TR, w), lambda bb, rb: (bb, rb, 0)),
        ],
        out_specs=pl.BlockSpec((1, 3, TR, w), lambda bb, rb: (bb, 0, rb, 0)),
        out_shape=jax.ShapeDtypeStruct(band.shape, jnp.float32),
        interpret=interpret,
    )(band, u)


def _band_maps(b, w, rows, pad, seg_offsets_px, seg_len):
    """Per-pixel source columns for the band (shared by both layouts):
    returns (offw, u_unwrapped, u_wrapped), pad rows prepended as
    identity."""
    offw = jnp.rint(seg_offsets_px).astype(jnp.int32)  # (B, rows, NSEG)
    seg_index = jnp.arange(w, dtype=jnp.int32) // seg_len
    x = jnp.arange(w, dtype=jnp.int32)[None, None, :]
    off_px = jnp.take(offw, seg_index, axis=2)  # (B, rows, W)
    u_unwrapped = x + off_px
    u_wrapped = u_unwrapped % w
    if pad:
        ident = jnp.broadcast_to(x, (b, pad, w))
        u_unwrapped = jnp.concatenate([ident, u_unwrapped], axis=1)
        u_wrapped = jnp.concatenate([ident, u_wrapped], axis=1)
    return offw, u_unwrapped, u_wrapped


def _shear_band(band, offw, u_unwrapped, u_wrapped, interpret, exact):
    # Bounded-window fast path when every offset fits +-CLAMP (the
    # reference's Gaussian draws exceed 128 px only at absurd sigma —
    # ~7 sigma even at amp 24 — but the runtime cond keeps parity
    # unconditional: oversized draws take the full-width kernel).
    fits = jnp.all(jnp.abs(offw) <= CLAMP)
    return jax.lax.cond(
        fits,
        lambda bd, uu, uw: shear_planar(bd, uu, interpret, exact,
                                        window=True),
        lambda bd, uu, uw: shear_planar(bd, uw, interpret, exact,
                                        window=False),
        band, u_unwrapped, u_wrapped,
    )


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

    offw, u_unwrapped, u_wrapped = _band_maps(
        b, w, rows, pad, seg_offsets_px, seg_len)
    band = jnp.transpose(imgs[:, y0p:], (0, 3, 1, 2))  # (B, 3, RP, W)
    out_band = _shear_band(band, offw, u_unwrapped, u_wrapped,
                           interpret, exact)
    out_band = jnp.transpose(out_band, (0, 2, 3, 1))  # (B, RP, W, 3)
    # keep ORIGINAL rows above y0 (the pad rows went through the kernel
    # only to satisfy the 8-row grid; their values must pass through
    # untouched, not via the bf16-split identity). dynamic_update_slice
    # instead of slice+concatenate: XLA updates the buffer in place,
    # where the concat materialized the whole frame again (~0.5 ms/f at
    # 4K, round-3 c5 trace).
    return jax.lax.dynamic_update_slice(
        imgs, out_band[:, pad:], (0, y0, 0, 0))


def shear_band_batched_planar(
    imgs: jax.Array,
    y0: int,
    seg_offsets_px: jax.Array,
    seg_len: int,
    interpret: bool = False,
    exact: bool = True,
) -> jax.Array:
    """shear_band_batched for PLANAR (B, 3, H, W) f32 frames — the
    kernel is planar-native, so the band slices straight out of the
    batch with no transpose at all (the engine's planar layout runs the
    glitch chain without a single relayout)."""
    b, _, h, w = imgs.shape
    rows = h - y0
    if rows <= 0:
        return imgs
    pad = (-rows) % TR
    y0p = y0 - pad
    assert y0p >= 0, "band padding underflow — use the XLA fallback"

    offw, u_unwrapped, u_wrapped = _band_maps(
        b, w, rows, pad, seg_offsets_px, seg_len)
    band = imgs[:, :, y0p:]  # (B, 3, RP, W) — already the kernel layout
    out_band = _shear_band(band, offw, u_unwrapped, u_wrapped,
                           interpret, exact)
    return jax.lax.dynamic_update_slice(
        imgs, out_band[:, :, pad:], (0, 0, y0, 0))
