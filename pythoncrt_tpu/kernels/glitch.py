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
with a circular row extension in VMEM and a K = TX + 2*clamp
contraction instead of K = W, where clamp is sized STATICALLY from the
(static) amplitude param (_pick_clamp: {32, 64, 128}). Draws beyond
+-clamp px route to the full-width kernel, so parity with the
reference's unbounded Gaussians is unconditional.

On the production path (planar frames, H % 8 == 0) the kernel runs IN
PLACE on the full frames via input_output_aliases, and the window/
full-width fallback choice branches IN-KERNEL on an SMEM flag
(_glitch_kernel_dual) — an XLA-level lax.cond around aliased calls
cannot donate through the conditional and inserted ~235 us/f of
defensive full-frame copies (measured r4: 1234 vs 1737 fps on c4).
Unaligned or NHWC callers keep the band-slice + lax.cond + DUS form
(no aliasing there, so the cond is copy-free).

Alternatives measured and rejected on this toolchain: dynamic
per-(row, segment) lane-rolls (8.8 ms — DynamicRotate is multi-pass)
and HIGHEST-precision f32 matmuls (6.1 ms vs 4.4 ms for this kernel).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TR = 8  # band rows per program (f32 sublane quantum)
TX = 128  # output tile columns per matmul


CLAMP = 128  # bounded-window half-width (max |offset| the window covers)
KWIN = TX + 2 * CLAMP  # per-tile contraction width (384 vs full W)


def _glitch_kernel(band_ref, u_ref, out_ref, *, w: int, exact: bool,
                   pad: int = 0, wrap: bool = False, first_block=None):
    # band_ref: (1, 3, TR, W) f32; u_ref: (1, TR, W) int32 source columns
    # in [0, W). The gather runs as a one-hot MXU matmul per (row, output
    # tile). Two bf16 passes (hi + residual) reconstruct 16 mantissa
    # bits: max error ~2^-17 relative (~4e-6 measured) — ~160x below the
    # uint8 LSB budget. (Exact f32 would need a third term for the last
    # 8 bits; measured not worth it vs Precision.HIGHEST.)
    #
    # pad > 0 (in-place path): the first `pad` rows of row-block 0 are
    # ABOVE the band (they exist only to 8-align it) and must pass
    # through BITWISE — the bf16-split identity matmul is ~2^-17 off —
    # so those rows select the raw input instead of the accumulator.
    #
    # wrap=True (dual-kernel fallback branch): u arrives UNWRAPPED
    # (x + off, the window branch's form) and the % w moves in-kernel —
    # it only executes when a draw exceeded the +-CLAMP window.
    if pad and first_block is None:
        first_block = pl.program_id(1) == 0
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (w, TX), 0)
    for r in range(TR):
        row3 = band_ref[0, :, r, :]  # (3, W)
        r_hi = row3.astype(jnp.bfloat16)
        if exact:
            r_lo = (row3 - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        u_r = u_ref[0, r, :]  # (W,)
        if wrap:
            u_r = u_r % w
        for jt in range(w // TX):
            m = (iota_n == u_r[jt * TX:(jt + 1) * TX][None, :]).astype(jnp.bfloat16)
            acc = jnp.dot(r_hi, m, preferred_element_type=jnp.float32)
            if exact:
                acc = acc + jnp.dot(r_lo, m, preferred_element_type=jnp.float32)
            # fast (exact=False): single bf16 pass, ~2^-8 relative error
            if pad and r < pad:
                acc = jnp.where(first_block,
                                row3[:, jt * TX:(jt + 1) * TX], acc)
            out_ref[0, :, r, jt * TX:(jt + 1) * TX] = acc


def _glitch_kernel_window(band_ref, u_ref, out_ref, *, w: int, exact: bool,
                          pad: int = 0, first_block=None,
                          clamp: int = CLAMP):
    # Bounded-window variant: offsets are guaranteed in [-clamp, clamp]
    # (callers route larger draws to the exact fallback), so output tile
    # jt only reads source columns [jt*TX - clamp, (jt+1)*TX + clamp)
    # with circular wrap. Per row, a circularly-extended copy
    # ext[k] = row[(k - clamp) mod W] is built once in VMEM; each tile's
    # matmul then contracts K = TX + 2*clamp (384 at the default 128)
    # instead of K=W (5x fewer MACs and 5x less VPU mask-building at
    # 1080p). clamp is STATIC per compile: the glitch amplitude is a
    # static effect param, so callers shrink the window to the smallest
    # {64, 128} covering the draw distribution (the runtime fits-cond
    # keeps parity unconditional either way). u_ref carries UNWRAPPED
    # source columns x + off in [-clamp, W + clamp).
    if pad and first_block is None:
        first_block = pl.program_id(1) == 0
    kwin = TX + 2 * clamp
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (kwin, TX), 0)
    for r in range(TR):
        row3 = band_ref[0, :, r, :]  # (3, W)
        ext = jnp.concatenate(
            [row3[:, w - clamp:], row3, row3[:, :clamp]], axis=1
        )  # (3, W + 2*clamp); ext[k] = row[(k - clamp) mod W]
        e_hi = ext.astype(jnp.bfloat16)
        if exact:
            e_lo = (ext - e_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        u_r = u_ref[0, r, :]  # (W,) unwrapped
        for jt in range(w // TX):
            win_hi = e_hi[:, jt * TX:jt * TX + kwin]
            # in-window index: u + clamp - jt*TX in [0, kwin)
            ul = u_r[jt * TX:(jt + 1) * TX] + (clamp - jt * TX)
            m = (iota_n == ul[None, :]).astype(jnp.bfloat16)
            acc = jnp.dot(win_hi, m, preferred_element_type=jnp.float32)
            if exact:
                win_lo = e_lo[:, jt * TX:jt * TX + kwin]
                acc = acc + jnp.dot(win_lo, m, preferred_element_type=jnp.float32)
            if pad and r < pad:
                acc = jnp.where(first_block,
                                row3[:, jt * TX:(jt + 1) * TX], acc)
            out_ref[0, :, r, jt * TX:(jt + 1) * TX] = acc


def _glitch_kernel_dual(fits_ref, band_ref, u_ref, out_ref, *, w: int,
                        exact: bool, pad: int, clamp: int = CLAMP):
    # Runtime-branched body: fits_ref is a (1, 1) int32 SMEM scalar —
    # 1 when every draw fits the +-CLAMP window (the always case for
    # sane amplitudes), 0 otherwise. Branching IN-KERNEL instead of via
    # jax.lax.cond around two aliased pallas_calls matters enormously:
    # the XLA cond cannot donate its operand into the branch bodies'
    # aliased buffers, so it inserted defensive full-frame copies
    # measured at ~235 us/f on c4 1080p (1234 vs 1737 fps, r4).
    # u arrives UNWRAPPED (x + off); the fallback wraps in-kernel.
    fits = fits_ref[0, 0]
    # program_id must be read OUTSIDE the pl.when bodies (interpret
    # mode can't interpret it from inside the cond sub-trace)
    first = pl.program_id(1) == 0 if pad else None

    @pl.when(fits != 0)
    def _window():
        _glitch_kernel_window(band_ref, u_ref, out_ref, w=w, exact=exact,
                              pad=pad, first_block=first, clamp=clamp)

    @pl.when(fits == 0)
    def _full():
        _glitch_kernel(band_ref, u_ref, out_ref, w=w, exact=exact,
                       pad=pad, wrap=True, first_block=first)


def shear_planar(
    band: jax.Array, u: jax.Array, interpret: bool = False, exact: bool = True,
    window: bool = False, clamp: int = CLAMP,
) -> jax.Array:
    """band (B, 3, R, W) f32; u (B, R, W) int32 source columns:
    out[b, c, r, x] = band[b, c, r, u[b, r, x] mod W].
    Requires R % 8 == 0 and W % 128 == 0.

    window=True uses the bounded-window kernel: u must be UNWRAPPED
    x + off with off in [-clamp, clamp] (callers check; shear_band_batched
    routes violating batches to the exact fallback)."""
    b, _, r, w = band.shape
    assert r % TR == 0 and w % 128 == 0, (r, w)
    grid = (b, r // TR)
    kern = (functools.partial(_glitch_kernel_window, clamp=clamp)
            if window else _glitch_kernel)
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


def shear_planar_inplace(
    imgs: jax.Array, u: jax.Array, fits: jax.Array, y0p: int, pad: int,
    interpret: bool = False, exact: bool = True, clamp: int = CLAMP,
) -> jax.Array:
    """In-place band shear on FULL planar frames: imgs (B, 3, H, W) f32,
    u (B, RP, W) int32 UNWRAPPED source columns covering rows [y0p, H),
    fits a (1, 1) int32 flag (1 = every offset within +-CLAMP). The grid
    walks only band row-blocks; the in/out BlockSpec index maps add
    y0p//TR, and input_output_aliases donates imgs so every row above
    the band stays in place — no band slice, no dynamic_update_slice
    (those two copy passes measured ~88 us/f of the c4 step at 1080p,
    r4 xprof). The window/full-width choice branches IN-KERNEL on the
    SMEM flag (an XLA-level cond around aliased calls forces ~235 us/f
    of defensive copies — see _glitch_kernel_dual). The `pad`
    8-alignment rows inside the first block pass through bitwise via
    the kernel's program-0 select. Requires y0p % TR == 0 (callers
    check; true whenever H % 8 == 0)."""
    b, _, h, w = imgs.shape
    rp = h - y0p
    assert y0p % TR == 0 and rp % TR == 0 and w % 128 == 0, (y0p, rp, w)
    r0 = y0p // TR
    return pl.pallas_call(
        functools.partial(_glitch_kernel_dual, w=w, exact=exact, pad=pad,
                          clamp=clamp),
        grid=(b, rp // TR),
        in_specs=[
            pl.BlockSpec((1, 1), lambda bb, rb: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, TR, w), lambda bb, rb: (bb, 0, rb + r0, 0)),
            pl.BlockSpec((1, TR, w), lambda bb, rb: (bb, rb, 0)),
        ],
        out_specs=pl.BlockSpec((1, 3, TR, w),
                               lambda bb, rb: (bb, 0, rb + r0, 0)),
        out_shape=jax.ShapeDtypeStruct(imgs.shape, jnp.float32),
        input_output_aliases={1: 0},
        interpret=interpret,
    )(fits, imgs, u)


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


def _pick_clamp(off_bound_px) -> int:
    """Static window half-width for a STATIC offset bound (the glitch
    amplitude is an effect param — compile-time constant). Smallest of
    {32, 64, 128} covering the bound shrinks the per-tile contraction
    K = TX + 2*clamp (384 -> 192 at clamp 32); draws beyond the chosen
    clamp still take the full-width fallback at runtime, so any choice
    is parity-safe. PCRT_GLITCH_CLAMP forces a value for A/B."""
    env = os.environ.get("PCRT_GLITCH_CLAMP")
    if env:
        return int(env)
    if off_bound_px is None:
        return CLAMP
    for c in (32, 64, 128):
        if off_bound_px <= c:
            return c
    return CLAMP


def _shear_band(band, offw, u_unwrapped, u_wrapped, interpret, exact,
                clamp=CLAMP):
    # Bounded-window fast path when every offset fits +-clamp (the
    # reference's Gaussian draws exceed the window only at absurd sigma
    # — but the runtime cond keeps parity unconditional: oversized
    # draws take the full-width kernel).
    fits = jnp.all(jnp.abs(offw) <= clamp)
    return jax.lax.cond(
        fits,
        lambda bd, uu, uw: shear_planar(bd, uu, interpret, exact,
                                        window=True, clamp=clamp),
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
    off_bound_px=None,
) -> jax.Array:
    """Batched glitch: imgs (B, H, W, 3) f32; seg_offsets_px (B, rows,
    NSEG) f32 — the per-(row, segment) offsets BEFORE rounding (the
    reference rounds per pixel, crt_filter.py:855, but base+segment is
    constant within a segment so per-segment rint is identical). Pads
    the band upward to a multiple of 8 rows (zero offset = identity).
    off_bound_px: static caller-known bound on |offset| (from the
    static amplitude param) — sizes the bounded window (_pick_clamp)."""
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
                           interpret, exact, _pick_clamp(off_bound_px))
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
    off_bound_px=None,
) -> jax.Array:
    """shear_band_batched for PLANAR (B, 3, H, W) f32 frames — the
    kernel is planar-native, so no transpose at all (the engine's planar
    layout runs the glitch chain without a single relayout).

    When H % 8 == 0 (every production size) the kernel runs IN PLACE on
    the full frames (shear_planar_inplace): the band slice and the
    dynamic_update_slice write-back disappear, the window/full-width
    choice branches in-kernel on an SMEM flag (no XLA cond — see
    _glitch_kernel_dual), and the `u % W` wrap for the full-width
    fallback moves inside that branch (it only executes when a draw
    exceeds the +-CLAMP window, which the reference's Gaussian draws
    essentially never do). Measured c4 1080p: 1463.9 -> 1736.8 fps.
    PCRT_GLITCH_INPLACE=0 restores the slice+DUS form for A/B."""
    b, _, h, w = imgs.shape
    rows = h - y0
    if rows <= 0:
        return imgs
    pad = (-rows) % TR
    y0p = y0 - pad
    assert y0p >= 0, "band padding underflow — use the XLA fallback"

    offw, u_unwrapped, u_wrapped = _band_maps(
        b, w, rows, pad, seg_offsets_px, seg_len)
    clamp = _pick_clamp(off_bound_px)
    if y0p % TR == 0 and os.environ.get("PCRT_GLITCH_INPLACE", "1") != "0":
        fits = jnp.all(jnp.abs(offw) <= clamp).astype(jnp.int32)
        return shear_planar_inplace(
            imgs, u_unwrapped, fits.reshape(1, 1), y0p, pad, interpret,
            exact, clamp)
    band = imgs[:, :, y0p:]  # (B, 3, RP, W) — already the kernel layout
    out_band = _shear_band(band, offw, u_unwrapped, u_wrapped,
                           interpret, exact, clamp)
    return jax.lax.dynamic_update_slice(
        imgs, out_band[:, :, pad:], (0, 0, y0, 0))
