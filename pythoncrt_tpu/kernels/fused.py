"""Pallas TPU kernel: the fused c3-class frame pipeline.

Round-3 xprof evidence (ROADMAP.md): at the 718-fps c3 state the XLA
glue AROUND the bloom3 stripe kernel cost ~580 us/frame — pre-bloom
u8 pixelate selects + /255 + grade (~285), post-bloom triad pow +
scanline/vignette/flicker/noise + the rint(*255)->bf16 warp emit
(~240), final u8 cast (~45) — every pass re-crossing HBM at 1080p.
All of those stages are elementwise or statically-local, so they fold
into the bloom stripe pass that already holds the rows in VMEM:

  u8 planar window --DMA--> [pixelate/aberration rolls -> /255 ->
  grade] -> knee -> exact gaussian blur (bloom3 core) -> composite ->
  [triad -> scanlines -> vignette -> flicker -> grain] -> emit
  (f32 [0,1] | rint(*255) bf16 for the int-domain warp kernel)

One frame per program (the triad/saturation luma needs all 3 channels
together; they sit on window axis 0). Input windows are u8 (4x less
HBM traffic than the f32 the standalone bloom3 kernel reads); halo
rows get the prologue applied redundantly (16 extra rows per ty — the
values are identical to the XLA path's, just recomputed per stripe).

Exactness contract (PARITY.md): every stage reproduces the engine's
XLA op order bit-for-bit on the VPU — same divides, same clip order,
same quantize-then-pow triad (the 1024-bin LUT cliff makes upstream
reassociation illegal). The only toolchain-dependent ops are
pow/rint; scripts/check_fused_numerics.py verifies Mosaic == XLA
bitwise on-chip, and the parity suite bounds the engine at <= 1 LSB
vs the CPU oracle either way.

Prologue index maps: pixelate's composed nearest maps reduce to
shift[j] = j % px (oracle.pixelate_index_maps; verified analytically
at build time), and the aberration roll composes as a per-channel
+-ab lane offset (engine._build_consts). Window origins are 8-row
aligned, so px in {1, 2, 4, 8} keeps (lo + row) % px == row % px —
the build gates on that and on the host-side map check.

Reference chain being matched: crt_filter.py:702-861 (stage order),
:578-584 (pixelate), :279-305 (grade), :238-263 (triad),
:609-610 (gaussian bloom), :615-629 (scanlines/vignette),
:630-636 (flicker), :638-646 (grain noise).
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass, field as dfield

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.color import (REC709_B, REC709_G, REC709_R, TRIAD_LUT_SIZE,
                         _quantize_lut)
from .bloom3 import TY as _TY_MIN

# single source of truth: ops/color.py (the XLA engine path the kernel
# must match bit-for-bit); re-exported under the kernel's local names
REC709 = (REC709_R, REC709_G, REC709_B)
LUT_N = TRIAD_LUT_SIZE


@dataclass(frozen=True)
class FusedSpec:
    h: int
    w: int
    ty: int
    # bloom (always on — the kernel exists to fuse around the blur)
    r: int
    taps: tuple
    strength: float
    threshold: float
    fast: bool = False  # half-res down+up composite (bloom3_fast core)
    #                     instead of the gaussian taps (r/taps unused)
    bloom: bool = True  # False: skip stage 6 entirely (r/taps/strength/
    #                     threshold/fast unused) — the kernel still wins
    #                     by folding prologue+epilogue+warp-feed into
    #                     one HBM pass for bloom-off configs (e.g. the
    #                     c2-class scanline/triad/noise stacks)
    # prologue (pre=False -> input is the engine's pre-processed f32)
    pre: bool = False
    px: int = 1  # pixel_size (1 = no pixelate); window-origin aligned
    ab: int = 0  # aberration_px (R reads +ab, B reads -ab lanes away)
    saturation: float = 1.0
    temp_r: float = 1.0  # temperature per-channel gains (precomputed)
    temp_b: float = 1.0
    brightness: float = 0.0
    contrast: float = 1.0
    inv_gamma: float = 1.0  # grade pow exponent (1.0 = off)
    # epilogue
    triad: bool = False
    triad_gamma: float = 2.2
    triad_luma: bool = False
    lut_exact: bool = True
    scanlines: bool = False  # 1-D only (operand carries the multiplier)
    vignette: bool = False
    vig_strength: float = 0.0
    flicker: bool = False
    noise: bool = False
    noise_scale: float = 0.0  # noise_strength / 255
    # grain_g > 1: the grain operand is the (B, nyt, ty/g+2, W)
    # half-field stripe windows (columns already MXU-upsampled, one
    # edge-replicated pad row each side) and the kernel lerps the rows
    # in-register: full[q*g+k] = (1-frac[k])*W[q+off[k]] +
    # frac[k]*W[q+off[k]+1] (engine.CRTEngine.GRAIN2_ROWS — the exact
    # bilinear row weights for H == g*gh). Halves the grain HBM read
    # and removes the (H, gh) R_h dot from the step.
    grain_g: int = 1
    grain_off: tuple = ()
    grain_frac: tuple = ()
    # grain_raw: the operand is the RAW (B, nyt, wrows, gwp) field
    # windows and the COLUMN upsample also runs in-kernel (one bf16 dot
    # against the R_w operand, which has a constant index map so Mosaic
    # fetches it once and keeps it VMEM-resident across programs, as
    # the warp kernel's masks are) — removes the XLA column dot AND the
    # window-producer pass from the step
    grain_raw: bool = False
    # "f32": [0,1] floats. "bf16_255"/"u8_255": rint(m*255) on the
    # integer grid for the int-domain warp kernel — identical values,
    # but u8 halves the kernel's output write AND the warp's window
    # DMA bytes (the warp casts back to bf16 in-register post-roll).
    emit: str = "f32"
    # plane i of the input/output holds color corder[i] (0=R,1=G,2=B).
    # (1, 2, 0) is ffmpeg's gbrp plane order — the engine's planar
    # layout feeds decoded planes untouched, and the per-channel
    # constants below permute to match. Spatial stages are colorless.
    corder: tuple = (0, 1, 2)


# Peak VMEM liveness through the prologue+blur+epilogue pipeline,
# counted in window-sized f32 values (measured headroom style of
# bloom3._LIVE; the u8 window and the ty-sized epilogue scratch are
# charged inside the margin).
_LIVE_F = 11


def pick_ty_fused(h: int, w: int):
    force = os.environ.get("PCRT_FUSED_TY")
    if force:
        t = int(force)
        # ty must be a multiple of 8: stripe window origins carry a
        # pl.multiple_of(_, 8) claim (a WRONG claim silently misaligns
        # the DMA, it does not error)
        return t if (t % 8 == 0 and h % t == 0 and h // t >= 2
                     and h >= t + 16) else None
    # Measured sweeps: 1080p ty=24 708, ty=40 800, ty=72 664, ty=120
    # 687 fps (2026-08-17); 4K ty=24 434, ty=40 457, ty=48 425, ty=80
    # 354 (2026-08-20 spc-1 re-sweep — the in-place aliased glitch and
    # planar persist moved the knee; the round-3 "ty=40 loses at 4K"
    # point is stale, scripts/sweep_c5_ty.py). Confirmed under the
    # official spc-2 iters=12 protocol: ty=40 453.8 vs ty=24 449.8 —
    # ty=40 never loses across 3 protocols. Taller stripes cut the
    # 16-row halo ratio until the charged VMEM liveness passes the knee
    # where Mosaic's pipelining degrades (the vmem_limit raise in
    # fused_pipeline makes taller COMPILE, but past the knee it runs
    # slower): ty=40 at 4K = 28.4 MB wins, ty=48 = 32.4 MB runs -2%,
    # so the cap sits between — ty=40 is now the pick at both w<=1920
    # (17.3 MB) and 4K.
    for t in (40, 32, 24, 16, 8):
        if h % t == 0 and h // t >= 2 and h >= t + 16 \
                and _LIVE_F * 3 * (t + 16) * w * 4 <= (29 << 20):
            return t
    return None


def build_fused_spec(h: int, w: int, *, sigma: float = 0.0,
                     strength: float, threshold: float, fast: bool = False,
                     bloom: bool = True, **kw) -> FusedSpec:
    """Build + validate. Raises ValueError when the shape/stage set is
    outside the kernel's envelope (caller falls back to bloom3/XLA)."""
    from ..oracle import ops as oops

    if h % _TY_MIN or w % 128:
        raise ValueError(f"fused needs H%{_TY_MIN}==0 and W%128==0, got {h}x{w}")
    if not bloom:
        taps, r, fast = (), 0, False
    elif fast:
        # half-res parity arithmetic needs even dims (guaranteed by the
        # gates above, asserted for clarity) and the fixed 8-row halo
        if h % 2 or w % 2:
            raise ValueError("fused-fast needs even H,W")
        taps, r = (), 0
    else:
        k = max(1, int(round(float(sigma) * 3)) * 2 + 1)
        taps = tuple(float(t) for t in oops.gaussian_kernel_1d(k, float(sigma)))
        r = k // 2
        if r >= 8:
            raise ValueError(f"fused supports radius < 8, got {r}")
    ty = pick_ty_fused(h, w)
    if ty is None or h // ty < 2:
        raise ValueError("fused needs >= 2 row stripes")
    px = int(kw.get("px", 1))
    if kw.get("pre") and px not in (1, 2, 4, 8):
        # 8-aligned window origins must stay px-aligned for the in-kernel
        # y-shift masks (see module docstring)
        raise ValueError(f"fused prologue needs px in {{1,2,4,8}}, got {px}")
    if kw.get("pre") and px > 1:
        # the analytic shift form shift[c] = c % px must hold for the
        # oracle's composed maps (it does whenever px divides h and w;
        # verify rather than assume)
        from ..oracle.engine import pixelate_index_maps

        ym, xm = pixelate_index_maps(h, w, px)
        if not (np.array_equal(np.arange(h) - ym, np.arange(h) % px)
                and np.array_equal(np.arange(w) - xm, np.arange(w) % px)):
            raise ValueError("pixelate maps deviate from the analytic form")
    if kw.get("pre") and abs(int(kw.get("ab", 0))) >= w:
        raise ValueError("aberration exceeds frame width")
    if kw.get("emit", "f32") not in ("f32", "bf16_255", "u8_255"):
        raise ValueError(f"unknown emit mode {kw.get('emit')}")
    gg = int(kw.get("grain_g", 1))
    if gg > 1 and (not kw.get("noise") or ty % gg or h % gg
                   or len(kw.get("grain_off", ())) != gg
                   or len(kw.get("grain_frac", ())) != gg):
        # stripe rows must split evenly into g row-residues for the
        # in-kernel lerp's interleave; fall back to the full-row operand
        kw["grain_g"], kw["grain_off"], kw["grain_frac"] = 1, (), ()
    if kw.get("grain_g", 1) == 1:
        kw["grain_raw"] = False
    return FusedSpec(h=h, w=w, ty=ty, r=r, taps=taps, strength=float(strength),
                     threshold=float(threshold), fast=fast, bloom=bloom, **kw)


# _quantize_lut is IMPORTED from ops/color.py (pure jnp, Mosaic-legal;
# the f32->s32 convert truncates toward zero in both XLA and Mosaic —
# checked on-chip), so the kernel and the XLA path cannot drift.


def _fused_kernel(img_any, *refs, spec: FusedSpec, nyt: int):
    s = spec
    w, h, ty, r = s.w, s.h, s.ty, s.r
    wr = ty + 16
    # Timing-probe modes (WRONG output) for the on-chip engine-level
    # ablation — the only trusted instrument on this rig (ROADMAP.md):
    #   nopre: skip prologue rolls/grade (convert + /255 only)
    #   noblur: skip the blur (composite base rows pass through)
    #   noepi: skip stages 7-11
    #   nopow: triad/grade pow -> multiply (same traffic, no transcend.)
    debug = os.environ.get("PCRT_FUSED_DEBUG", "")
    # pow dispatch (round 4): the FINAL triad pow (after the last LUT
    # quantize — no cliff downstream) uses ops.color.pow_final's explog
    # form by default (~0.03 LSB at that site's budget; the big part of
    # the pow-wall win). Every pow UPSTREAM of a quantize stays
    # jnp.power: the TPU explog pair's ~1e-4 relative error flips LUT
    # bins en masse (all-sites A/B measured 15.7% of 1080p pixels off
    # vs the oracle, max 2 LSB — contract broken). PCRT_POW_EXPLOG=all
    # restores that A/B; =0 forces jnp.power everywhere.
    explog_all = os.environ.get("PCRT_POW_EXPLOG") in ("1", "all")

    def powe(v, e):
        if explog_all:
            return jnp.exp2(np.float32(e) * jnp.log2(v))
        return jnp.power(v, np.float32(e))

    # unpack optional operand refs by spec flags (same order as the call)
    refs = list(refs)
    g_ref = refs.pop(0) if s.noise else None
    grw_ref = refs.pop(0) if (s.noise and s.grain_raw) else None
    grh_ref = refs.pop(0) if (s.noise and s.grain_g > 1) else None
    sl_ref = refs.pop(0) if s.scanlines else None
    vy_ref = refs.pop(0) if s.vignette else None
    vx_ref = refs.pop(0) if s.vignette else None
    tri_ref = refs.pop(0) if s.triad else None
    fl_ref = refs.pop(0) if s.flicker else None
    out_ref, mid_ref, win_ref, sem = refs

    p = pl.program_id(0)  # stripe index
    b = pl.program_id(1)  # frame index
    nb = pl.num_programs(1)
    t = p * nb + b
    n_t = nyt * nb
    nbuf = 3
    slot = jax.lax.rem(t, nbuf)

    def start_dma(tt, sl_):
        bb = jax.lax.rem(tt, nb)
        pp = tt // nb
        lo = pl.multiple_of(jnp.clip(pp * ty - 8, 0, h - wr), 8)
        pltpu.make_async_copy(
            img_any.at[pl.ds(bb, 1), :, pl.ds(lo, wr), :],
            win_ref.at[sl_],
            sem.at[sl_],
        ).start()

    @pl.when(t == 0)
    def _():
        start_dma(t, slot)
        for ahead in range(1, nbuf - 1):
            @pl.when(t + ahead < n_t)
            def _(ahead=ahead):
                start_dma(t + ahead, jax.lax.rem(t + ahead, nbuf))

    @pl.when(t + nbuf - 1 < n_t)
    def _():
        start_dma(t + nbuf - 1, jax.lax.rem(t + nbuf - 1, nbuf))

    pltpu.make_async_copy(
        img_any.at[pl.ds(0, 1), :, pl.ds(0, wr), :],  # shape-only
        win_ref.at[slot],
        sem.at[slot],
    ).wait()

    win = win_ref[slot][0]  # (3, wr, W), u8 (pre) or f32

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w), 2)
    orow = jax.lax.broadcasted_iota(jnp.int32, (1, ty, 1), 1)

    # ---------------- prologue: stages 2+3 composed, 1, 4 ----------------
    # Runs PER BRANCH on a row slice of the window: mid-stripe programs
    # (all but 2 per frame) only need the rows the blur actually reads
    # (ty + 2r gaussian / ty + a fixed few fast / exactly ty bloom-off),
    # not the full ty+16 window — measured ~0.39 ms/f of prologue+blur
    # VPU at 1080p scaling with the row count. The slice offset `a` is
    # kept a multiple of px (px | 8 and window origins are 0 mod px,
    # so the row%px shift selectors are unchanged on the slice), and
    # even for the fast variant (row-parity weights).
    def prologue(wslice):
        rows_n = wslice.shape[1]
        row = jax.lax.broadcasted_iota(jnp.int32, (1, rows_n, 1), 1)
        if s.pre and debug == "nopre":
            return wslice.astype(jnp.int32).astype(jnp.float32) \
                * np.float32(1.0 / 255.0)
        if not s.pre:
            return wslice  # already the engine's pre-processed f32
        # rolls commute with the convert; Mosaic has no direct u8->f32
        # cast, so widen through i32 (values 0..255 are exact in both)
        x = wslice.astype(jnp.int32).astype(jnp.float32)
        if s.px > 1:
            # y: out row g reads g - g%px; window origin AND slice
            # offset are px-aligned, so the local shift equals
            # row % px (engine._frame_pre_bloom semantics), and every
            # selected row's source row is inside the slice
            res = x
            for s0 in range(1, s.px):
                res = jnp.where(row % s.px == s0,
                                pltpu.roll(x, s0, axis=1), res)
            x = res
        if s.px > 1 or s.ab != 0:
            # x per channel: shift = lane%px + {R:+ab, G:0, B:-ab} by the
            # plane's COLOR (corder); cyclic roll wrap == the composed
            # maps' mod-W wrap
            ab_of_color = (s.ab, 0, -s.ab)
            chans = []
            for ci, sh in enumerate(ab_of_color[cc] for cc in s.corder):
                xc = x[ci:ci + 1]
                if s.px == 1:
                    res = xc if sh == 0 else pltpu.roll(xc, sh % w, axis=2)
                else:
                    res = xc
                    for s0 in range(s.px):
                        tot = (s0 + sh) % w
                        rolled = xc if tot == 0 else pltpu.roll(xc, tot, axis=2)
                        res = jnp.where(lane % s.px == s0, rolled, res)
                chans.append(res)
            x = jnp.concatenate(chans, axis=0)
        # stage 1: the engine writes `frame / 255`, but XLA LOWERS the
        # constant division as multiply-by-rounded-reciprocal (probed
        # on-chip 2026-08-17: XLA's x/255 == x*f32(1/255) bitwise on
        # all 256 inputs, while Mosaic's divide uses a truncated rcp
        # that differs on 255/256 of them). Matching the shipping XLA
        # semantics — the multiply — is what keeps the fused path
        # bit-identical upstream of the triad LUT cliff.
        x = x * np.float32(1.0 / 255.0)
        # stage 4: saturation -> temperature -> brightness/contrast -> gamma
        # (per-channel constants indexed by each PLANE's color, corder)
        if s.saturation != 1.0:
            # the f32 SUM ORDER must stay R+G+B (oracle order — this is
            # upstream of the triad LUT cliff): pick planes by color,
            # never reassociate by plane position
            ir, ig, ib = (s.corder.index(0), s.corder.index(1),
                          s.corder.index(2))
            luma = (np.float32(REC709[0]) * x[ir:ir + 1]
                    + np.float32(REC709[1]) * x[ig:ig + 1]
                    + np.float32(REC709[2]) * x[ib:ib + 1])
            x = jnp.clip(luma + (x - luma) * np.float32(s.saturation), 0.0, 1.0)
        if s.temp_r != 1.0 or s.temp_b != 1.0:
            chan = jax.lax.broadcasted_iota(jnp.int32, (3, 1, 1), 0)
            gains = jnp.where(chan == s.corder.index(0), np.float32(s.temp_r),
                              jnp.where(chan == s.corder.index(2),
                                        np.float32(s.temp_b),
                                        np.float32(1.0)))
            x = jnp.clip(x * gains, 0.0, 1.0)
        if s.brightness != 0.0 or s.contrast != 1.0:
            x = jnp.clip((x - np.float32(0.5)) * np.float32(s.contrast)
                         + np.float32(0.5) + np.float32(s.brightness), 0.0, 1.0)
        if s.inv_gamma != 1.0:
            if debug == "nopow":
                x = jnp.clip(x * np.float32(s.inv_gamma), 0.0, 1.0)
            else:
                x = jnp.clip(powe(x, s.inv_gamma), 0.0, 1.0)
        return x

    def knee(xv):
        # stage-6 soft-knee threshold; multiply form == XLA-TPU's
        # lowering of the engine's division (see the stage-1 /255 note;
        # bloom3 kernels match)
        if not (s.bloom and s.threshold > 0.0):
            return xv
        thr = np.float32(min(0.99, max(0.0, s.threshold)))
        den = np.float32(max(1e-6, 1.0 - float(thr)))
        rden = np.float32(1.0 / float(den))
        return jnp.clip((xv - thr) * rden, 0.0, 1.0)

    # ---------------- bloom (stage 6) ----------------
    # Gaussian: the bloom3 exact core. Fast: the bloom3_fast half-res
    # down+up parity core. Both reproduce the oracle's f32 op order.
    px_eff = s.px if (s.pre and s.px > 1) else 1
    if s.bloom and not s.fast:
        a_mid = ((8 - r) // px_eff) * px_eff
        b_mid = 8 + ty + r
    elif s.bloom:
        # fast keeps the FULL window: unlike the gaussian mid (pure
        # static slices), the fast core rolls along the row axis, and
        # slicing measured a consistent ~1% LOSS at c4 (1325 -> 1305
        # unaligned 46 rows; 1310-1315 8-aligned ty+8 rows) — its
        # prologue is too cheap for the row cut to pay for the slice
        a_mid, b_mid = 0, wr
    else:
        a_mid = (8 // px_eff) * px_eff  # == 8 (px | 8)
        b_mid = 8 + ty

    half = np.float32(0.5)

    def lanevec(even, odd, overrides):
        v = jnp.where(lane % 2 == 0, np.float32(even), np.float32(odd))
        for j, val in overrides.items():
            v = jnp.where(lane == j, np.float32(val), v)
        return v

    def sl_lanes(arr, sh):
        if sh == 0:
            return arr
        return pltpu.roll(arr, (w - sh) % w, axis=2)

    def up_cols(ur):
        l_e_lo = lanevec(0.25, 0.0, {0: 0.0})
        l_e_hi = lanevec(0.75, 0.0, {0: 1.0})
        l_o_lo = lanevec(0.0, 0.75, {w - 1: 1.0})
        l_o_hi = lanevec(0.0, 0.25, {w - 1: 0.0})
        lo_terms = l_e_lo * sl_lanes(ur, -2) + l_o_lo * sl_lanes(ur, -1)
        hi_terms = l_e_hi * ur + l_o_hi * sl_lanes(ur, 1)
        return lo_terms + hi_terms

    def rowvec(fill, overrides):
        even, odd = fill
        v = jnp.where(orow % 2 == 0, np.float32(even), np.float32(odd))
        for r0, val in overrides.items():
            v = jnp.where(orow == r0, np.float32(val), v)
        return v

    def fast_blurred(src, rows_n, d, pos):
        # D rows: half-rows at EVEN slice rows (window origins are
        # 8-aligned and slice offsets even, so slice-row parity ==
        # frame-row parity); odd rows hold garbage every later read
        # skips by construction
        dr = half * src + half * pltpu.roll(src, rows_n - 1, axis=1)
        # D cols: half-res values at even rows x even lanes
        hrw = half * dr + half * pltpu.roll(dr, w - 1, axis=2)

        def sl_rows(sh):
            if 0 <= sh and sh + ty <= rows_n:
                return hrw[:, sh:sh + ty, :]
            return pltpu.roll(hrw, (rows_n - sh) % rows_n, axis=1)[:, 0:ty, :]

        first_row, last_row = pos == "top", pos == "bot"
        # U rows (bloom3._bloom3_fast_kernel, op for op): even rows
        # lo@d-2 (.25) hi@d (.75); odd rows lo@d-1 (.75) hi@d+1
        # (.25); frame first/last rows override to the 1.0 edge tap
        w_e_lo = rowvec((0.25, 0.0), {0: 0.0} if first_row else {})
        w_e_hi = rowvec((0.75, 0.0), {0: 1.0} if first_row else {})
        w_o_lo = rowvec((0.0, 0.75), {ty - 1: 1.0} if last_row else {})
        w_o_hi = rowvec((0.0, 0.25), {ty - 1: 0.0} if last_row else {})
        lo_terms = w_e_lo * sl_rows(d - 2) + w_o_lo * sl_rows(d - 1)
        hi_terms = w_e_hi * sl_rows(d) + w_o_hi * sl_rows(d + 1)
        return up_cols(lo_terms + hi_terms)

    def gauss_hpass(src):
        taps = s.taps
        # Mask-free form (round 4, opt-in PCRT_BLUR_PAD=1): pad 128
        # zero lanes on the RIGHT (a 128-aligned concat) and roll
        # cyclically over w+128 — (j + sh) mod (w + 128) lands in the
        # zero pad exactly when j + sh is outside [0, w), the same
        # exact zeros the per-tap iota-compare + select produces, with
        # 8 fewer select passes over the stripe. BITWISE equal
        # (verified interpret-mode), but on-chip it measured NEUTRAL
        # twice (941.2 vs 945.0 and 857.9 vs 861.1 fps, 2026-08-19):
        # Mosaic evidently folds the iota-compare selects into the
        # roll's own masked lane moves, and the wider 2048-lane rolls
        # give the saving back. Default stays the masked form.
        padded = os.environ.get("PCRT_BLUR_PAD") == "1"
        if padded:
            wp = w + 128
            srcp = jnp.concatenate(
                [src, jnp.zeros(src.shape[:2] + (128,), src.dtype)], axis=2)
        hp = None
        for i, t_ in enumerate(taps):
            sh = i - r
            if sh == 0:
                term = np.float32(t_) * src
            elif padded:
                rolled = pltpu.roll(srcp, (-sh) % wp, axis=2)[:, :, :w]
                term = np.float32(t_) * rolled
            else:
                rolled = pltpu.roll(src, (-sh) % w, axis=2)
                mask = (lane < w - sh) if sh > 0 else (lane >= -sh)
                term = np.float32(t_) * jnp.where(mask, rolled, 0.0)
            hp = term if hp is None else hp + term
        clv = jnp.zeros((1, 1, w), jnp.float32)
        crv = jnp.zeros((1, 1, w), jnp.float32)
        for i, t_ in enumerate(taps):
            if i < r:
                clv = clv + jnp.where(lane < r - i, np.float32(t_), np.float32(0.0))
            if i > r:
                crv = crv + jnp.where(lane > w - 1 + r - i, np.float32(t_),
                                      np.float32(0.0))
        if r > 0:
            hp = hp + clv * src[:, :, 0:1]
            hp = hp + crv * src[:, :, w - 1:w]
        return hp

    def gauss_blurred(src, rows_n, d, pos):
        taps = s.taps
        hp = gauss_hpass(src)

        def sl_(sh):
            if 0 <= sh and sh + ty <= rows_n:
                return hp[:, sh:sh + ty, :]
            return pltpu.roll(hp, (rows_n - sh) % rows_n, axis=1)[:, 0:ty, :]

        out = None
        for i, t_ in enumerate(taps):
            sh = d + i - r
            if pos == "mid" or (pos == "top" and i >= r) \
                    or (pos == "bot" and i <= r):
                term = np.float32(t_) * sl_(sh)
            elif pos == "top":
                term = np.float32(t_) * jnp.where(orow >= r - i, sl_(sh), 0.0)
            else:
                term = np.float32(t_) * jnp.where(orow < ty - (i - r),
                                                  sl_(sh), 0.0)
            out = term if out is None else out + term
        if r > 0 and pos == "top":
            coef = jnp.zeros((1, ty, 1), jnp.float32)
            for i, t_ in enumerate(taps):
                if i < r:
                    coef = coef + jnp.where(orow < r - i, np.float32(t_),
                                            np.float32(0.0))
            out = out + coef * hp[:, 0:1, :]
        if r > 0 and pos == "bot":
            coef = jnp.zeros((1, ty, 1), jnp.float32)
            for i, t_ in enumerate(taps):
                if i > r:
                    coef = coef + jnp.where(orow > ty - 1 - (i - r),
                                            np.float32(t_), np.float32(0.0))
            out = out + coef * hp[:, rows_n - 1:rows_n, :]
        return out

    def chain(a, b2, d, pos):
        """prologue + knee + blur + composite on window rows [a, b2);
        d is the composite base offset in WINDOW rows."""
        x = prologue(win[:, a:b2])
        if not s.bloom or debug == "noblur":
            return x[:, d - a:d - a + ty, :]
        src = knee(x)
        rows_n = b2 - a
        bl = (fast_blurred if s.fast else gauss_blurred)(src, rows_n,
                                                         d - a, pos)
        base = x[:, d - a:d - a + ty, :]  # pre-knee center rows in VMEM
        return jnp.clip(base + np.float32(s.strength) * bl, 0.0, 1.0)

    @pl.when(jnp.logical_and(p != 0, p != nyt - 1))
    def _():
        mid_ref[...] = chain(a_mid, b_mid, 8, "mid")

    # border programs keep the full window: the replicate fixups
    # reference window rows 0 / wr-1, and there are only 2 per frame
    @pl.when(p == 0)
    def _():
        mid_ref[...] = chain(0, wr, 0, "top")

    @pl.when(p == nyt - 1)
    def _():
        mid_ref[...] = chain(0, wr, 16, "bot")

    # ---------------- epilogue: stages 7-11 + emit ----------------
    m = mid_ref[...]  # (3, ty, W) — common to all three stripe branches

    if s.triad and debug == "noepi":
        pass
    elif s.triad:  # stage 7 (ops/color.py:apply_triad, op for op)
        g = float(s.triad_gamma)
        mask = tri_ref[...]  # (3, 1, W)

        def _pow(v, e):
            if debug == "nopow":
                return v * np.float32(e)
            return powe(v, e)

        if s.lut_exact:
            lin = _pow(_quantize_lut(m), g)
        else:
            lin = _pow(jnp.clip(m, 0.0, 1.0), g)
        out_lin = lin * mask
        if s.triad_luma:
            # same R+G+B sum order as the oracle (see the saturation note)
            ir, ig, ib = (s.corder.index(0), s.corder.index(1),
                          s.corder.index(2))
            yb = (np.float32(REC709[0]) * lin[ir:ir + 1]
                  + np.float32(REC709[1]) * lin[ig:ig + 1]
                  + np.float32(REC709[2]) * lin[ib:ib + 1])
            ya = (np.float32(REC709[0]) * out_lin[ir:ir + 1]
                  + np.float32(REC709[1]) * out_lin[ig:ig + 1]
                  + np.float32(REC709[2]) * out_lin[ib:ib + 1])
            ratio = jnp.clip(yb / jnp.maximum(ya, np.float32(1e-6)), 0.5, 2.0)
            out_lin = out_lin * ratio
        def _pow_fin(v, e):
            # the final site: pow_final's explog default (see powe note)
            if debug == "nopow":
                return v * np.float32(e)
            from ..ops.color import pow_final

            return pow_final(v, e)

        if s.lut_exact:
            m = _pow_fin(_quantize_lut(out_lin), 1.0 / g)
        else:
            m = _pow_fin(jnp.clip(out_lin, 0.0, 1.0), 1.0 / g)
        m = jnp.clip(m, 0.0, 1.0)

    if s.scanlines and debug != "noepi":  # stage 8 (1-D; operand (B,H,1))
        m = jnp.clip(m * sl_ref[...], 0.0, 1.0)

    if s.vignette and debug != "noepi":  # stage 9 (separable vector add)
        r2 = vy_ref[...] + vx_ref[...]  # (ty,1)+(1,W) -> (ty, W)
        v = np.float32(1.0) - np.float32(s.vig_strength) * jnp.clip(r2, 0.0, 1.0)
        m = jnp.clip(m * v[None], 0.0, 1.0)

    if s.flicker and debug != "noepi":  # stage 10 ((B,1) in SMEM)
        m = jnp.clip(m * fl_ref[b, 0], 0.0, 1.0)

    if s.noise and debug != "noepi":  # stage 11
        if s.grain_g > 1:
            # in-register row upsample of the half-field window
            # (columns were MXU-upsampled outside) as ONE small static
            # MXU dot — the same bf16 row matrix as the XLA path's
            # CRTEngine._grain_rows_full (passed as the grh operand:
            # pallas forbids captured constants), so the paths produce
            # the same bits (exact f32 products, order-free single add;
            # a VPU slice/interleave lerp form measured ~500 us/f in
            # Mosaic)
            wn = g_ref[0, 0]  # (wrows, w | gwp) f32
            if s.grain_raw:
                # column upsample in-kernel too: raw window @ R_w (the
                # VMEM-resident operand) — same explicit-bf16 dot as
                # the XLA path's half dot, so the bits agree
                wn = jax.lax.dot(
                    wn.astype(jnp.bfloat16), grw_ref[...],
                    preferred_element_type=jnp.float32)
            gfield = jax.lax.dot(
                grh_ref[...], wn.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
            m = jnp.clip(m + gfield * np.float32(s.noise_scale), 0.0, 1.0)
        else:  # field fully upsampled outside
            m = jnp.clip(m + g_ref[...] * np.float32(s.noise_scale), 0.0, 1.0)

    if s.emit == "bf16_255":
        out_ref[...] = jnp.rint(m * np.float32(255.0)).astype(jnp.bfloat16)[None]
    elif s.emit == "u8_255":
        # same integer values as bf16_255 (m is clipped to [0,1] by
        # every epilogue stage, so rint lands in [0, 255]); Mosaic has
        # no f32->u8 cast, hop through i32 (lossless on the int grid)
        v = jnp.rint(m * np.float32(255.0))
        out_ref[...] = v.astype(jnp.int32).astype(jnp.uint8)[None]
    else:
        out_ref[...] = m[None]


def fused_pipeline(img, spec: FusedSpec, *, grain=None, grain_rw=None,
                   grain_rh=None, sl=None, vy2=None, vx2=None, tri=None,
                   flicker=None, interpret: bool = False):
    """Run the fused stripe pipeline.

    img: (B, 3, H, W) planar — uint8 when spec.pre else f32 in [0,1].
    grain: (B, H, W) f32 un-scaled upsampled field   [spec.noise]
    sl: (B, H, 1) f32 final scanline multiplier      [spec.scanlines]
    vy2/vx2: (H, 1)/(1, W) f32 vignette r^2 vectors  [spec.vignette]
    tri: (3, 1, W) f32 triad mask                    [spec.triad]
    flicker: (B, 1) f32 per-frame gain               [spec.flicker]
    Returns (B, 3, H, W): f32 [0,1] or bf16 [0,255] per spec.emit.
    """
    b = img.shape[0]
    ty, h, w = spec.ty, spec.h, spec.w
    nyt = h // ty
    in_dt = img.dtype
    assert (in_dt == jnp.uint8) == spec.pre, (in_dt, spec.pre)

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    args = [img]
    if spec.noise:
        if spec.grain_g > 1:  # (B, nyt, wrows, gw') field-window stacks
            # ty/g+2 rows used, rounded up to the 8-row sublane quantum
            # (matches the engine's operand builder); columns are the
            # full W (half-field windows) or the padded raw-field width
            # (grain_raw)
            wrows = -(-(ty // spec.grain_g + 2) // 8) * 8
            gcols = grain_rw.shape[0] if spec.grain_raw else w
            in_specs.append(
                pl.BlockSpec((1, 1, wrows, gcols),
                             lambda p, bb: (bb, p, 0, 0)))
            args.append(grain)
            if spec.grain_raw:
                # R_w stays VMEM-resident: the constant index map lets
                # Mosaic fetch block (0, 0) once for the whole grid
                in_specs.append(
                    pl.BlockSpec((gcols, w), lambda p, bb: (0, 0)))
                args.append(grain_rw)
            # the (ty, wrows) bf16 row-upsample matrix (every program
            # reads block (0, 0) — it is the same for all stripes).
            # Passed in from the engine as a jit ARGUMENT (the
            # constants-as-arguments rule; advisor r3); rebuilt inline
            # only for direct test callers.
            if grain_rh is None:
                from ..engine import CRTEngine

                grain_rh = jnp.asarray(CRTEngine.grain_row_matrix(
                    ty, wrows, spec.grain_g,
                    tuple(zip(spec.grain_off,
                              (np.float32(f) for f in spec.grain_frac))))
                ).astype(jnp.bfloat16)
            in_specs.append(
                pl.BlockSpec((ty, wrows), lambda p, bb: (0, 0)))
            args.append(grain_rh)
        else:
            in_specs.append(
                pl.BlockSpec((1, ty, w), lambda p, bb: (bb, p, 0)))
            args.append(grain)
    if spec.scanlines:
        in_specs.append(pl.BlockSpec((1, ty, 1), lambda p, bb: (bb, p, 0)))
        args.append(sl)
    if spec.vignette:
        in_specs.append(pl.BlockSpec((ty, 1), lambda p, bb: (p, 0)))
        args.append(vy2)
        in_specs.append(pl.BlockSpec((1, w), lambda p, bb: (0, 0)))
        args.append(vx2)
    if spec.triad:
        in_specs.append(pl.BlockSpec((3, 1, w), lambda p, bb: (0, 0, 0)))
        args.append(tri)
    if spec.flicker:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(flicker)

    out_dt = {"bf16_255": jnp.bfloat16, "u8_255": jnp.uint8,
              "f32": jnp.float32}[spec.emit]
    # Mosaic's default scoped-vmem limit is 16 MB; tall stripes (ty=40
    # at 1080p needs ~18.4 MB live) are legal on v5e (128 MB VMEM) by
    # raising the per-kernel limit. Charge the same liveness model as
    # pick_ty_fused plus slack for Mosaic temporaries.
    need = _LIVE_F * 3 * (ty + 16) * w * 4
    if spec.grain_raw:
        # the VMEM-resident R_w operand + the in-kernel half window
        need += grain_rw.shape[0] * w * 2 * 2
    params = {}
    if need > (12 << 20):
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=min(100 << 20, 2 * need))
    out = pl.pallas_call(
        functools.partial(_fused_kernel, spec=spec, nyt=nyt),
        grid=(nyt, b),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 3, ty, w), lambda p, bb: (bb, 0, p, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 3, h, w), out_dt),
        scratch_shapes=[
            pltpu.VMEM((3, ty, w), jnp.float32),  # post-branch epilogue input
            pltpu.VMEM((3, 1, 3, ty + 16, w), in_dt),  # 3-deep window slots
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
        **params,
    )(*args)
    return out
