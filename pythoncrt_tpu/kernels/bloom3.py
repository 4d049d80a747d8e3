"""Pallas TPU kernel: exact fused gaussian bloom (blur + composite).

Why it exists (round-3 xprof evidence): XLA evaluates each blur axis as
k shifted slices of a padded operand inside a loop fusion, and the
fusion RE-READS the full-frame input from HBM once per tap — the two
blur fusions cost 337 + 398 us/frame at 1080p against a ~60 us one-read
traffic floor (ROADMAP.md round 3). This kernel holds a row stripe
(+vertical halo) in VMEM, so every input byte crosses HBM ~twice
(halo overlap) instead of ~18 times.

Why it is exact (the hard constraint): the bloom output feeds the
triad's 1024-bin LUT quantization (ops/color.py:_quantize_lut), a step
function — ANY numeric deviation upstream of it (bf16 casts, tap
reassociation) can flip a bin and move the output by many uint8 LSBs
near black. So the kernel reproduces ops/blur.py's f32 op sequence
EXACTLY: per axis, terms tap[i] * x[offset i] accumulated in tap order
(separate mul and add), out-of-range taps contributing exact zeros,
then the replicate-border fixup FMAs (clipped-tap coefficient times the
edge sample), horizontal axis first (crt_filter.py:609-610).

Layout: input is the engine's logically-planar (B, 3, H, W) f32 view
(a free bitcast — XLA lays the NHWC f32 intermediates out W-minor
anyway), flattened to (B*3, H, W): the blur is per-channel, so frames
and channels fold into one grid axis. Window DMA origins are clamped
into the frame (no materialized pad pass — the earlier XLA pre-pad
cost 80 us/f of pure copy); the top/bottom stripes re-align their
vertical taps with static sublane rolls and mask the out-of-frame rows
to the exact zeros the reference's zero pad produces. Horizontal taps
are static pltpu.roll lane rotations with the wrap columns masked.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TY = 8  # minimum output stripe rows (sublane quantum)


@dataclass(frozen=True)
class Bloom3Spec:
    h: int
    w: int
    r: int  # tap radius (k = 2r + 1)
    taps: tuple  # k float taps
    strength: float
    threshold: float
    ty: int = TY  # output stripe rows: taller stripes cut the halo
    #              overlap (window rows ty+2r per ty emitted) and the
    #              program count; 24 divides 1080 (16 does not)


def build_bloom3_spec(h: int, w: int, sigma: float, strength: float,
                      threshold: float) -> Bloom3Spec:
    from ..oracle import ops as oops

    k = max(1, int(round(float(sigma) * 3)) * 2 + 1)
    taps = tuple(float(t) for t in oops.gaussian_kernel_1d(k, float(sigma)))
    r = k // 2
    if h % TY or w % 128:
        raise ValueError(f"bloom3 needs H%{TY}==0 and W%128==0, got {h}x{w}")
    if r >= TY:
        raise ValueError(f"bloom3 supports radius < {TY}, got {r}")
    if h // TY < 2:
        raise ValueError("bloom3 needs >= 2 row stripes (the top/bottom "
                         "fixup branches are disjoint)")
    if 2 * r + 1 != k:
        raise ValueError("even kernel size")
    ty = _pick_ty(h, w)
    if ty is None:
        raise ValueError(f"bloom3 needs H >= ty+16 (8-aligned halos), got {h}")
    return Bloom3Spec(h=h, w=w, r=r, taps=taps, strength=float(strength),
                      threshold=float(threshold), ty=ty)


# Mosaic's kernel-stack allocator keeps ~14-15 live window-sized f32
# values through the tap pipeline (measured: 17.55 MB at fpp=4/wr=40/
# 1080p against the 16 MB scoped-vmem limit), so stripe height and
# frames-per-program are chosen jointly against a ~14 MB budget.
_LIVE = 15


def _pick_ty(h: int, w: int):
    """Largest 8-multiple stripe height that divides H, leaves >= 2
    stripes, fits the frame, and leaves room for fpp >= 2 (taller
    stripes cut both halo overlap and program count)."""
    for t in (40, 24, 16, 8):
        if h % t == 0 and h // t >= 2 and h >= t + 16 \
                and 2 * _LIVE * (t + 16) * w * 4 <= (14 << 20):
            return t
    if h % 8 == 0 and h // 8 >= 2 and h >= 24:
        return 8
    return None


def _pick_fpp(ty: int, w: int, b3: int) -> int:
    cap = max(1, (14 << 20) // (_LIVE * (ty + 16) * w * 4))
    return next(f for f in (8, 4, 2, 1) if b3 % f == 0 and f <= cap)


def _bloom3_kernel(img_any, img_blk, out_ref, win_ref, sem,
                   *, spec: Bloom3Spec, nyt: int, fpp: int):
    p = pl.program_id(0)  # stripe index (H/TY)
    b = pl.program_id(1)  # flat (B*3)/fpp group
    nb = pl.num_programs(1)
    r, w, h = spec.r, spec.w, spec.h
    ty = spec.ty
    taps = spec.taps
    # 8-row halos: window origins p*ty - 8 stay on the f32 (8, 128)
    # HBM tiling grid for every ty in the ladder (Mosaic requires
    # provably 8-divisible row origins for HBM slices)
    wr = ty + 16

    t = p * nb + b
    n_t = nyt * nb
    nbuf = 3
    slot = jax.lax.rem(t, nbuf)

    def start_dma(tt, sl):
        bb = jax.lax.rem(tt, nb)
        pp = tt // nb
        # window rows [pp*ty - 8, ..] clamped into the frame: the top
        # stripe reads [0, wr), the bottom [h - wr, h); the branches
        # below re-align the vertical taps (d = p*ty - lo is 8 interior,
        # 0 top, 16 bottom — all static). Every candidate origin is
        # 8-row aligned, as the f32 HBM tiling demands.
        lo = pl.multiple_of(jnp.clip(pp * ty - 8, 0, h - wr), 8)
        pltpu.make_async_copy(
            img_any.at[pl.ds(bb * fpp, fpp), pl.ds(lo, wr), :],
            win_ref.at[sl],
            sem.at[sl],
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
        img_any.at[pl.ds(0, fpp), pl.ds(0, wr), :],  # shape-only
        win_ref.at[slot],
        sem.at[slot],
    ).wait()

    win = win_ref[slot]  # (fpp, wr, W) — all real frame rows (clamped)

    # stage 0: threshold knee (same expression as the XLA path; knee(0)=0
    # keeps the pad rows exact zeros)
    if spec.threshold > 0.0:
        # engine._frame_bloom_xla writes a division, but XLA-TPU LOWERS
        # constant division as multiply-by-rounded-reciprocal (probed
        # on-chip 2026-08-17: x/c == x*f32(1/c) bitwise), while Mosaic's
        # divide uses a truncated rcp that is 1 ulp LOW on most inputs.
        # The multiply is therefore the op that matches the shipping XLA
        # path on TPU.
        thr = np.float32(min(0.99, max(0.0, spec.threshold)))
        den = np.float32(max(1e-6, 1.0 - float(thr)))
        rden = np.float32(1.0 / float(den))  # rcp of the f32 den, as XLA folds it
        win = jnp.clip((win - thr) * rden, 0.0, 1.0)

    # stage 1: horizontal pass on all window rows. Tap i reads source
    # column j + (i - r): a static lane rotation with the wrapped columns
    # masked to the exact zeros the reference's zero pad produces, then
    # the replicate fixup FMAs. Term order matches ops/blur.py exactly.
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w), 2)
    hp = None
    for i, t_ in enumerate(taps):
        s = i - r
        if s == 0:
            term = np.float32(t_) * win
        else:
            rolled = pltpu.roll(win, (-s) % w, axis=2)
            mask = (lane < w - s) if s > 0 else (lane >= -s)
            term = np.float32(t_) * jnp.where(mask, rolled, 0.0)
        hp = term if hp is None else hp + term
    # replicate fixup coefficient vectors, built from the lane iota and
    # scalar tap constants (pallas forbids captured constant arrays):
    # cl[j] = sum of taps whose source j+i-r < 0, cr symmetric.
    clv = jnp.zeros((1, 1, w), jnp.float32)
    crv = jnp.zeros((1, 1, w), jnp.float32)
    for i, t_ in enumerate(taps):
        if i < r:
            clv = clv + jnp.where(lane < r - i, np.float32(t_), np.float32(0.0))
        if i > r:
            crv = crv + jnp.where(lane > w - 1 + r - i, np.float32(t_), np.float32(0.0))
    if r > 0:
        hp = hp + clv * win[:, :, 0:1]
        hp = hp + crv * win[:, :, w - 1:w]

    # stage 2: vertical pass over the output rows (static sublane
    # slices of the haloed H-result). The window holds REAL frame rows
    # only (clamped 8-aligned DMA origins), so the three stripe kinds
    # use static base shifts d = p*ty - lo in {8 interior, 0 top,
    # 16 bottom}: out row rr tap i reads window row rr + d + i - r.
    # Out-of-window slices come from a sublane roll with the wrapped
    # (out-of-frame) rows masked to the exact zeros the reference's
    # zero pad produces; the replicate fixups add the clipped-tap
    # coefficient times the frame edge row.
    def sl(arr, s):
        if 0 <= s and s + ty <= wr:
            return arr[:, s:s + ty, :]
        return pltpu.roll(arr, (wr - s) % wr, axis=1)[:, 0:ty, :]

    def finish(blurred):
        img = img_blk[...]
        return jnp.clip(img + np.float32(spec.strength) * blurred, 0.0, 1.0)

    row = jax.lax.broadcasted_iota(jnp.int32, (1, ty, 1), 1)
    top_coef = jnp.zeros((1, ty, 1), jnp.float32)
    bot_coef = jnp.zeros((1, ty, 1), jnp.float32)
    for i, t_ in enumerate(taps):
        if i < r:  # source row g + i - r < 0 for g < r - i
            top_coef = top_coef + jnp.where(
                row < r - i, np.float32(t_), np.float32(0.0))
        if i > r:  # source row g + i - r > h-1 for local rr > ty-1-(i-r)
            bot_coef = bot_coef + jnp.where(
                row > ty - 1 - (i - r), np.float32(t_), np.float32(0.0))

    @pl.when(jnp.logical_and(p != 0, p != nyt - 1))
    def _():
        out = None
        for i, t_ in enumerate(taps):
            term = np.float32(t_) * sl(hp, 8 + i - r)
            out = term if out is None else out + term
        out_ref[...] = finish(out)

    @pl.when(p == 0)
    def _():
        # window row x = frame row x; negative-start slices come from a
        # sublane roll with the out-of-frame rows masked to zero.
        out = None
        for i, t_ in enumerate(taps):
            if i >= r:
                term = np.float32(t_) * sl(hp, i - r)
            else:
                term = np.float32(t_) * jnp.where(row >= r - i,
                                                  sl(hp, i - r), 0.0)
            out = term if out is None else out + term
        if r > 0:
            out = out + top_coef * hp[:, 0:1, :]
        out_ref[...] = finish(out)

    @pl.when(p == nyt - 1)
    def _():
        # window row x = frame row h - wr + x; base shift 16. Slices
        # past the window wrap (rolled) exactly where the frame ends,
        # so the wrap mask IS the zero-pad mask.
        out = None
        for i, t_ in enumerate(taps):
            if i <= r:
                term = np.float32(t_) * sl(hp, 16 + i - r)
            else:
                term = np.float32(t_) * jnp.where(
                    row < ty - (i - r), sl(hp, 16 + i - r), 0.0)
            out = term if out is None else out + term
        if r > 0:
            out = out + bot_coef * hp[:, wr - 1:wr, :]
        out_ref[...] = finish(out)


def bloom3_planar(imgs, spec: Bloom3Spec, interpret: bool = False):
    """(B, 3, H, W) f32 in [0,1] -> clip(img + strength*blur(knee(img))).

    Bit-identical to the engine's XLA path (oblur.gaussian_blur_replicate
    + composite): same tap order, same fixups, same clip."""
    flat = imgs.reshape(-1, spec.h, spec.w)
    b3 = flat.shape[0]
    fpp = _pick_fpp(spec.ty, spec.w, b3)
    nyt = spec.h // spec.ty
    out = pl.pallas_call(
        functools.partial(_bloom3_kernel, spec=spec, nyt=nyt, fpp=fpp),
        grid=(nyt, b3 // fpp),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # full frame: manual window DMA
            pl.BlockSpec((fpp, spec.ty, spec.w), lambda p, bb: (bb, p, 0)),
        ],
        out_specs=pl.BlockSpec((fpp, spec.ty, spec.w), lambda p, bb: (bb, p, 0)),
        out_shape=jax.ShapeDtypeStruct(flat.shape, jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((3, fpp, spec.ty + 16, spec.w), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(flat, flat)
    return out.reshape(imgs.shape)


def bloom3_nhwc(imgs, spec: Bloom3Spec, interpret: bool = False):
    """(B, H, W, 3) f32 wrapper, BATCH-major flatten. The flatten order
    is a pure layout-matching choice (the blur is per-channel): the c3
    grade producer emits batch-major planar (B-major measured 676.9 vs
    632.9 fps c-major), while c4's fast-bloom producer emits channel
    planes — so each variant's wrapper matches its usual producer."""
    planar = jnp.transpose(imgs, (0, 3, 1, 2))
    out = bloom3_planar(planar, spec, interpret)
    return jnp.transpose(out, (0, 2, 3, 1))


# ---------------------------------------------------------------------------
# Fast-bloom variant: half-res bilinear down+up composite as ONE stripe pass
# ---------------------------------------------------------------------------
#
# The reference's fast bloom (crt_filter.py:606-607) is
#   clip(img + strength * U(D(knee(img))))
# with D = bilinear downsample to (H/2, W/2) and U = bilinear upsample
# back, each axis a separate f32 rounding step (oracle.ops.resize_
# bilinear, rows first). For the exact 2x taps these resolve to
#   D rows:  half[m]   = 0.5*x[2m] + 0.5*x[2m+1]
#   U rows:  out[2m]   = 0.25*half[m-1] + 0.75*half[m]   (m>=1)
#            out[0]    = 1.0*half[0] (+ exact-zero hi term)
#            out[2m+1] = 0.75*half[m] + 0.25*half[m+1]   (m<h2-1)
#            out[n-1]  = 0*half[h2-2] + 1.0*half[h2-1]   (clip-clamped)
# (columns identical). Half-res values live SPARSELY at even window
# rows / even lanes, so every stage is fixed-offset sublane slices or
# lane rotations with parity weight masks — no decimation/interleave
# relayouts, and the exact per-element mul/add sequence of the oracle's
# four resize passes is preserved (FMA-contraction class only).
#
# This replaces the bloom2 banded-matmul kernel for the fast variant
# (0.83 ms/f in-engine at 1080p — it pays one-hot MXU windows for what
# is really 2-tap arithmetic).


def build_bloom3_fast_spec(h: int, w: int, strength: float,
                           threshold: float) -> "Bloom3Spec":
    if h % TY or w % 128:
        raise ValueError(f"bloom3-fast needs H%{TY}==0 and W%128==0, got {h}x{w}")
    if h % 2 or w % 2:
        raise ValueError("bloom3-fast needs even H,W")
    ty = _pick_ty(h, w)
    if ty is None:
        raise ValueError(f"bloom3-fast needs H >= ty+16, got {h}")
    return Bloom3Spec(h=h, w=w, r=3, taps=(), strength=float(strength),
                      threshold=float(threshold), ty=ty)


def _rowvec(ty, fill, overrides):
    """(1, ty, 1) f32 weight vector from a per-parity fill and
    {row: value} overrides, built from the row iota and scalar
    constants (pallas forbids captured constant arrays)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (1, ty, 1), 1)
    even, odd = fill
    v = jnp.where(row % 2 == 0, np.float32(even), np.float32(odd))
    for rr, val in overrides.items():
        v = jnp.where(row == rr, np.float32(val), v)
    return v


def _bloom3_fast_kernel(img_any, img_blk, out_ref, win_ref, sem,
                        *, spec: "Bloom3Spec", nyt: int, fpp: int):
    p = pl.program_id(0)
    b = pl.program_id(1)
    nb = pl.num_programs(1)
    w, h, ty = spec.w, spec.h, spec.ty
    wr = ty + 16  # 8-row halos both sides: origins stay on the f32
    #               (8, 128) HBM tiling grid (and even, preserving the
    #               half-row parity alignment)

    t = p * nb + b
    n_t = nyt * nb
    nbuf = 3
    slot = jax.lax.rem(t, nbuf)

    def start_dma(tt, sl):
        bb = jax.lax.rem(tt, nb)
        pp = tt // nb
        # window start pp*ty - 8 (8-aligned AND even: frame-row parity
        # equals window-row parity); clamped at both frame edges
        lo = pl.multiple_of(jnp.clip(pp * ty - 8, 0, h - wr), 8)
        pltpu.make_async_copy(
            img_any.at[pl.ds(bb * fpp, fpp), pl.ds(lo, wr), :],
            win_ref.at[sl],
            sem.at[sl],
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
        img_any.at[pl.ds(0, fpp), pl.ds(0, wr), :],  # shape-only
        win_ref.at[slot],
        sem.at[slot],
    ).wait()

    win = win_ref[slot]  # (fpp, wr, W) real frame rows (clamped origins)

    if spec.threshold > 0.0:
        # multiply form == XLA-TPU's lowering of the engine's division
        # (see _bloom3_kernel's knee comment)
        thr = np.float32(min(0.99, max(0.0, spec.threshold)))
        den = np.float32(max(1e-6, 1.0 - float(thr)))
        rden = np.float32(1.0 / float(den))  # rcp of the f32 den, as XLA folds it
        win = jnp.clip((win - thr) * rden, 0.0, 1.0)

    half = np.float32(0.5)
    # D rows: half-rows at EVEN window rows (odd rows hold garbage that
    # every later read skips by construction)
    dr = half * win + half * pltpu.roll(win, wr - 1, axis=1)
    # D cols: half-res values at even rows x even lanes
    hrw = half * dr + half * pltpu.roll(dr, w - 1, axis=2)

    def sl_rows(s):
        """(fpp, ty, W) view of hrw at window row (out_row + s); static
        s may exceed the window for rows whose weight is zero — those
        wrap via a roll and are multiplied by an exact 0."""
        if 0 <= s and s + ty <= wr:
            return hrw[:, s:s + ty, :]
        return pltpu.roll(hrw, (wr - s) % wr, axis=1)[:, 0:ty, :]

    # U rows: out row (frame G = p*ty + row) reads half-rows q at window
    # rows 2q - lo. Per branch the window offset d = p*ty - lo is static
    # (interior 2 / top 0 / bottom 6), giving fixed shifts:
    #   even rows: lo-term @ row+d-2 (weight .25), hi-term @ row+d (.75)
    #   odd rows:  lo-term @ row+d-1 (.75),        hi-term @ row+d+1 (.25)
    # with the frame's first row (1.0 @ row+d) and last row (1.0 @
    # row+d-1) overriding — the bilinear_taps lo-clip at the edges.
    def upsampled_rows(d, first_row: bool, last_row: bool):
        w_e_lo = _rowvec(ty, (0.25, 0.0), {0: 0.0} if first_row else {})
        w_e_hi = _rowvec(ty, (0.75, 0.0), {0: 1.0} if first_row else {})
        w_o_lo = _rowvec(ty, (0.0, 0.75), {ty - 1: 1.0} if last_row else {})
        w_o_hi = _rowvec(ty, (0.0, 0.25), {ty - 1: 0.0} if last_row else {})
        lo_terms = w_e_lo * sl_rows(d - 2) + w_o_lo * sl_rows(d - 1)
        hi_terms = w_e_hi * sl_rows(d) + w_o_hi * sl_rows(d + 1)
        return lo_terms + hi_terms

    # U cols on the row-upsampled sparse-lane field: same structure on
    # lanes (full W is always present — no branch dependence).
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w), 2)

    def lanevec(even, odd, overrides):
        v = jnp.where(lane % 2 == 0, np.float32(even), np.float32(odd))
        for j, val in overrides.items():
            v = jnp.where(lane == j, np.float32(val), v)
        return v

    def sl_lanes(arr, s):
        if s == 0:
            return arr
        return pltpu.roll(arr, (w - s) % w, axis=2)

    def upsampled_cols(ur):
        l_e_lo = lanevec(0.25, 0.0, {0: 0.0})
        l_e_hi = lanevec(0.75, 0.0, {0: 1.0})
        l_o_lo = lanevec(0.0, 0.75, {w - 1: 1.0})
        l_o_hi = lanevec(0.0, 0.25, {w - 1: 0.0})
        lo_terms = l_e_lo * sl_lanes(ur, -2) + l_o_lo * sl_lanes(ur, -1)
        hi_terms = l_e_hi * ur + l_o_hi * sl_lanes(ur, 1)
        return lo_terms + hi_terms

    def finish(blurred):
        img = img_blk[...]
        return jnp.clip(img + np.float32(spec.strength) * blurred, 0.0, 1.0)

    @pl.when(jnp.logical_and(p != 0, p != nyt - 1))
    def _():
        out_ref[...] = finish(upsampled_cols(upsampled_rows(8, False, False)))

    @pl.when(p == 0)
    def _():
        out_ref[...] = finish(upsampled_cols(upsampled_rows(0, True, False)))

    @pl.when(p == nyt - 1)
    def _():
        out_ref[...] = finish(upsampled_cols(upsampled_rows(16, False, True)))


def bloom3_fast_planar(imgs, spec: "Bloom3Spec", interpret: bool = False):
    """(B, 3, H, W) f32 wrapper over the channel-major form."""
    out = bloom3_fast_cmajor(jnp.transpose(imgs, (1, 0, 2, 3)), spec, interpret)
    return jnp.transpose(out, (1, 0, 2, 3))


def bloom3_fast_cmajor(imgs, spec: "Bloom3Spec", interpret: bool = False):
    """(3, B, H, W) f32 in [0,1] -> clip(img + strength*U(D(knee(img)))),
    matching the engine's XLA fast-bloom path to the FMA class."""
    b = imgs.shape[1]
    flat = imgs.reshape(b * 3, spec.h, spec.w)
    b3 = b * 3
    fpp = _pick_fpp(spec.ty, spec.w, b3)
    nyt = spec.h // spec.ty
    out = pl.pallas_call(
        functools.partial(_bloom3_fast_kernel, spec=spec, nyt=nyt, fpp=fpp),
        grid=(nyt, b3 // fpp),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((fpp, spec.ty, spec.w), lambda p, bb: (bb, p, 0)),
        ],
        out_specs=pl.BlockSpec((fpp, spec.ty, spec.w), lambda p, bb: (bb, p, 0)),
        out_shape=jax.ShapeDtypeStruct(flat.shape, jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((3, fpp, spec.ty + 16, spec.w), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(flat, flat)
    return out.reshape(imgs.shape)


def bloom3_fast_nhwc(imgs, spec: "Bloom3Spec", interpret: bool = False):
    """(B, H, W, 3) wrapper — channel-major flatten (see bloom3_nhwc)."""
    planar = jnp.transpose(imgs, (3, 0, 1, 2))
    out = bloom3_fast_cmajor(planar, spec, interpret)
    return jnp.transpose(out, (1, 2, 3, 0))
