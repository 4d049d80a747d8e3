"""Pallas TPU kernel for the barrel-warp bilinear resample.

XLA lowers arbitrary-index gathers to scalar loops on TPU (~31 ms per
1080p frame, measured) — the single biggest cost in the chain. This
kernel exploits the structure of the warp map instead: it is *static*
and *smooth*, so per output tile the input region is a bounded window
and the tap displacements span only a few values.

Per (TY x TX) output tile:
  1. DMA the (BY x WX) aligned input window per channel into VMEM,
     double-buffered across grid programs (origins via scalar prefetch);
  2. one dynamic lane-slice removes the 128-alignment offset, leaving
     displacements in [0, D) where D is the *derivative* span of the
     map across a tile (~12 at strength 0.15, measured from the map);
  3. horizontal taps resolve as one MXU matmul per tile row against a
     PRECOMPUTED one-hot bilinear-weight mask (hi/lo bf16 pair, built
     once per (H, W, strength) on device and stored in HBM — the masks
     are static across frames, and with the batch as the innermost grid
     dimension each tile's mask is DMA'd once and reused for the whole
     batch, removing ~5 G VPU ops/frame of in-kernel mask building);
  4. vertical taps resolve with an iota-compare band select.

All weights are the oracle's bilinear weights with out-of-bounds taps
zeroed (BORDER_CONSTANT 0, crt_filter.py:347); every product either
matches the oracle's or adds an exact zero, so results agree to f32
rounding order (<= a few ulps).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..oracle.engine import barrel_warp_maps

TY = 8  # output tile rows (f32 sublane quantum)
TX = 128  # output tile cols (lane quantum)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


HTX = TX // 2  # half-tile columns for the K=128 split


@dataclass(frozen=True)
class WarpTables:
    """Host-precomputed static tables for one (H, W, strength)."""

    h: int
    w: int
    byp: int  # VMEM window rows (multiple of 8)
    wxp: int  # DMA'd window cols (multiple of 128)
    d: int  # horizontal displacement span (static loop bound)
    wxd: int  # de-offset slice width = D + TX, rounded to 128
    wxpf: int  # full VMEM window cols incl. left pad
    pad: int  # dead columns left of the DMA region (=TX)
    by: np.ndarray  # (yt, xt) int32 window row origin (8-aligned)
    wx: np.ndarray  # (yt, xt) int32 window col origin (128-aligned)
    off: np.ndarray  # (yt, xt) int32 per-tile lane de-offset
    dxl: np.ndarray  # (H, W) int32 left-tap displacement in [0, D)
    dxr: np.ndarray  # (H, W) int32 right-tap displacement in [0, D)
    ylrel: np.ndarray  # (H, W) int32 window-relative top y tap
    yrrel: np.ndarray  # (H, W) int32 window-relative bottom y tap
    wx0: np.ndarray  # (H, W) f32 left-tap weight (border-masked)
    wx1: np.ndarray  # (H, W) f32 right-tap weight
    wy0: np.ndarray  # (H, W) f32 top-tap weight
    wy1: np.ndarray  # (H, W) f32 bottom-tap weight
    # K=128 half-tile matmul split: per half-tile h (cols [64h, 64h+64)),
    # taps live at rolled-window lanes [64h, 64h + 64 + d), so when
    # d <= 64 each half's matmul contracts over a single 128-lane slice
    # — K=128 with ZERO Mosaic pad, vs K=wxd padded up to 256 (half the
    # MACs at 1080p). Falls back to the full-K path at larger strengths.
    split: bool = False

    @property
    def grid(self):
        return (self.h // TY, self.w // TX)


def build_warp_tables(h: int, w: int, strength: float) -> WarpTables:
    """Precompute window origins, displacements and masked weights.

    Requires h % 8 == 0 and w % 128 == 0 (callers pad; standard video
    sizes 640/1280/1920 x 480/720/1080 already conform).
    """
    if h % TY or w % TX:
        raise ValueError(f"warp kernel needs H%{TY}==0 and W%{TX}==0, got {h}x{w}")
    map_x, map_y = barrel_warp_maps(h, w, strength)
    x0 = np.floor(map_x).astype(np.int64)
    fx = (map_x - x0).astype(np.float32)
    y0 = np.floor(map_y).astype(np.int64)
    fy = (map_y - y0).astype(np.float32)

    vx0 = (x0 >= 0) & (x0 <= w - 1)
    vx1 = (x0 + 1 >= 0) & (x0 + 1 <= w - 1)
    vy0 = (y0 >= 0) & (y0 <= h - 1)
    vy1 = (y0 + 1 >= 0) & (y0 + 1 <= h - 1)
    wx0 = ((1.0 - fx) * vx0).astype(np.float32)
    wx1 = (fx * vx1).astype(np.float32)
    wy0 = ((1.0 - fy) * vy0).astype(np.float32)
    wy1 = (fy * vy1).astype(np.float32)

    # Zero-weight (out-of-frame) taps impose NO constraints: a one-hot
    # index that never matches contributes an exact 0, and the q/m masks
    # carry the zero weight anyway. So windows, spans and displacement
    # tables are computed over VALID taps only, and invalid taps get
    # index 0. This keeps the static delta-loop bound D at the map's
    # *derivative* span per tile (tens, not hundreds).
    yt, xt = h // TY, w // TX
    big = 1 << 30

    def tiled(a):
        return a.reshape(yt, TY, xt, TX)

    v0x, v1x = tiled(vx0), tiled(vx1)
    v0y, v1y = tiled(vy0), tiled(vy1)

    def masked_min(a, m):
        return np.where(m, a, big).min(axis=(1, 3))

    def masked_max(a, m):
        return np.where(m, a, -big).max(axis=(1, 3))

    xl_t, xr_t = tiled(x0), tiled(x0 + 1)
    yl_t, yr_t = tiled(y0), tiled(y0 + 1)
    has_x = (v0x | v1x).any(axis=(1, 3))
    has_y = (v0y | v1y).any(axis=(1, 3))

    xmin = np.minimum(masked_min(xl_t, v0x), masked_min(xr_t, v1x))
    xmax = np.maximum(masked_max(xl_t, v0x), masked_max(xr_t, v1x))
    ymin = np.minimum(masked_min(yl_t, v0y), masked_min(yr_t, v1y))
    ymax = np.maximum(masked_max(yl_t, v0y), masked_max(yr_t, v1y))
    # all-invalid tiles: any legal window works
    tsx = (np.arange(xt) * TX)[None, :]
    tsy = (np.arange(yt) * TY)[:, None]
    xmin = np.where(has_x, xmin, tsx)
    xmax = np.where(has_x, xmax, tsx)
    ymin = np.where(has_y, ymin, tsy)
    ymax = np.where(has_y, ymax, tsy)

    # DMA origins must sit on the (8, 128) memory-tiling grid.
    wx_al = (xmin // TX) * TX
    by_al = (ymin // 8) * 8
    wxp = min(_round_up(int((xmax - wx_al).max()) + 1, TX), _round_up(w, TX))
    byp = min(_round_up(int((ymax - by_al).max()) + 1, 8), _round_up(h, 8))
    wx_org = np.clip(wx_al, 0, w - wxp).astype(np.int64)
    by_org = np.clip(by_al, 0, h - byp).astype(np.int64)

    # Horizontal displacements relative to each output column j: the
    # per-tile span is the map's derivative across the tile. Taps can
    # land left of j (negative displacement), so the VMEM window carries
    # PAD=128 dead columns on the left: wx_org - S <= 127 always
    # (S >= min valid tap - 127 and wx_org <= min valid tap), hence
    # off = S - wx_org + PAD >= 1.
    jgrid = np.arange(TX, dtype=np.int64)[None, None, None, :]
    dl = xl_t - jgrid  # (yt, TY, xt, TX): xtap - j
    dr = xr_t - jgrid
    s_t = np.minimum(masked_min(dl, v0x), masked_min(dr, v1x))
    e_t = np.maximum(masked_max(dl, v0x), masked_max(dr, v1x))
    # all-invalid tiles read nothing: pretend identity taps so the fake
    # displacement is consistent with the fake window at the tile start
    s_t = np.where(has_x, s_t, tsx)
    e_t = np.where(has_x, e_t, tsx)
    pad = TX
    off = (s_t - wx_org + pad).astype(np.int32)
    assert int(off.min()) >= 0
    d = int((e_t - s_t).max()) + 1
    # The matmul K dimension: every output column j's taps live in
    # [j, j+D), so K = TX + D covers the tile. Only sublane (8)
    # alignment is needed — K is the mask's second-to-last dim and a
    # STATIC lane-slice width on the window; rounding to 128 would pay
    # up to 60% extra MACs for padding.
    wxd = _round_up(d + TX, 8)
    wxpf = max(pad + wxp, _round_up(int(off.max()) + wxd, TX))
    dxl = np.where(v0x, dl - s_t[:, None, :, None], 0).reshape(h, w).astype(np.int32)
    dxr = np.where(v1x, dr - s_t[:, None, :, None], 0).reshape(h, w).astype(np.int32)
    assert dxl.min() >= 0 and max(dxl.max(), dxr.max()) <= d - 1

    ylrel = np.where(v0y, yl_t - by_org[:, None, :, None], 0).reshape(h, w).astype(np.int32)
    yrrel = np.where(v1y, yr_t - by_org[:, None, :, None], 0).reshape(h, w).astype(np.int32)
    assert ylrel.min() >= 0 and yrrel.max() <= byp - 1

    return WarpTables(
        h=h, w=w, byp=byp, wxp=wxp, d=d, wxd=wxd, wxpf=wxpf, pad=pad,
        by=by_org.astype(np.int32), wx=wx_org.astype(np.int32), off=off,
        dxl=dxl, dxr=dxr, ylrel=ylrel, yrrel=yrrel,
        wx0=wx0, wx1=wx1, wy0=wy0, wy1=wy1,
        split=(d <= HTX and wxpf >= HTX + 128),
    )


def build_warp_masks(dxl, dxr, wx0, wx1, *, wxd: int, exact: bool = True,
                     split: bool = False):
    """One-hot bilinear x-weight masks per (tile, tile-row), as the
    hi/lo bf16 pair the kernel's 3-pass split consumes directly.

    Returns (m_hi, m_lo) — or just (m_hi,) when exact=False (the
    single-pass "fast" precision mode, which also halves mask HBM and
    per-tile DMA). Shapes:

      split=False: (yt*xt, WXD, TY*TX) — one (3*BYP, WXD) @ (WXD,
        TY*TX) matmul per pass, K padded to 256 lanes by Mosaic.
      split=True (d <= 64): (yt*xt, 2, 128, TY*HTX) — per half-tile h,
        column j's taps sit at rolled-window lanes j + dx + 64h with
        j + dx < 64 + d <= 128, so the mask contracts a single 128-lane
        window slice: K=128, zero pad, half the MACs.

    Pure jnp so it runs on device (jit it); the values are exactly what
    the kernel used to build per tile-row on the VPU: at most one of the
    two one-hot terms is nonzero per (k, j) (dxr = dxl+1 when both taps
    are valid; invalid taps carry zero weight), so mx is exact in f32
    and the split is deterministic round-to-nearest-even.
    """
    h, w = dxl.shape
    yt, xt = h // TY, w // TX

    if split:
        # (H, W) -> (nt, 2, TY, 1, HTX): half-tiles as a leading axis
        def tile2(a):
            return (
                jnp.asarray(a)
                .reshape(yt, TY, xt, 2, HTX)
                .transpose(0, 2, 3, 1, 4)
                .reshape(yt * xt, 2, TY, 1, HTX)
            )

        jj = jnp.arange(HTX, dtype=jnp.int32)  # in-half column
        iota = jnp.arange(128, dtype=jnp.int32)[:, None]  # (128, 1)
        mx = (
            tile2(wx0) * (iota == tile2(dxl) + jj).astype(jnp.float32)
            + tile2(wx1) * (iota == tile2(dxr) + jj).astype(jnp.float32)
        )  # (nt, 2, TY, 128, HTX) f32
        mx = mx.transpose(0, 1, 3, 2, 4).reshape(-1, 2, 128, TY * HTX)
        m_hi = mx.astype(jnp.bfloat16)
        if not exact:
            return (m_hi,)
        m_lo = (mx - m_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return m_hi, m_lo

    def tile(a):  # (H, W) -> (nt, TY, 1, TX)
        return (
            jnp.asarray(a)
            .reshape(yt, TY, xt, TX)
            .transpose(0, 2, 1, 3)
            .reshape(yt * xt, TY, 1, TX)
        )

    jj = jnp.arange(TX, dtype=jnp.int32)
    iota = jnp.arange(wxd, dtype=jnp.int32)[:, None]  # (WXD, 1)
    mx = (
        tile(wx0) * (iota == tile(dxl) + jj).astype(jnp.float32)
        + tile(wx1) * (iota == tile(dxr) + jj).astype(jnp.float32)
    )  # (nt, TY, WXD, TX) f32
    # Lay the TY row-masks side by side along N: the kernel resolves all
    # 8 tile rows with ONE (3*BYP, WXD) @ (WXD, TY*TX) matmul per pass
    # instead of 8 small ones (better MXU pipelining, same FLOPs).
    mx = mx.transpose(0, 2, 1, 3).reshape(mx.shape[0], wxd, TY * TX)
    m_hi = mx.astype(jnp.bfloat16)
    if not exact:
        return (m_hi,)
    m_lo = (mx - m_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return m_hi, m_lo


def _warp_kernel(
    by_ref, wx_ref, off_ref,  # scalar prefetch (yt, xt) int32
    img_ref,  # (B, 3, H, W) f32, ANY (manual DMA)
    *refs,  # (1, WXD, TY*TX) mask blocks (1 or 2), y tables, out, scratch
    byp: int, wxp: int, d: int, wxd: int, pad: int, exact: bool,
    split: bool,
):
    if exact:
        mhi_ref, mlo_ref, yl_ref, yr_ref, wy0_ref, wy1_ref, out_ref, win_ref, sem = refs
    else:
        mhi_ref, yl_ref, yr_ref, wy0_ref, wy1_ref, out_ref, win_ref, sem = refs
        mlo_ref = None
    i = pl.program_id(0)
    j = pl.program_id(1)
    b = pl.program_id(2)
    xt = pl.num_programs(1)
    nb = pl.num_programs(2)
    # Batch innermost: per-tile blocks (masks, y tables) are fetched once
    # per tile and reused across all NB batch frames by the pipeline.
    t = (i * xt + j) * nb + b
    n_t = pl.num_programs(0) * xt * nb
    slot = jax.lax.rem(t, 2)
    nslot = jax.lax.rem(t + 1, 2)

    def start_window_dma(tt, sl):
        bb = jax.lax.rem(tt, nb)
        jj = jax.lax.rem(tt // nb, xt)
        ii = tt // (nb * xt)
        by = pl.multiple_of(by_ref[ii, jj], 8)
        wx = pl.multiple_of(wx_ref[ii, jj], TX)
        for c in range(3):
            pltpu.make_async_copy(
                img_ref.at[bb, c, pl.ds(by, byp), pl.ds(wx, wxp)],
                win_ref.at[sl, c, :, pl.ds(pad, wxp)],
                sem.at[sl],
            ).start()

    # Cross-program double buffering: program t-1 prefetched our window.
    @pl.when(t == 0)
    def _():
        # Zero the scratch once: columns outside the DMA region (left
        # pad + tail) are otherwise uninitialized, and 0 * garbage/NaN
        # would poison the masked sums even under zero weights.
        win_ref[...] = jnp.zeros_like(win_ref)
        start_window_dma(t, slot)

    @pl.when(t + 1 < n_t)
    def _():
        start_window_dma(t + 1, nslot)

    for c in range(3):
        pltpu.make_async_copy(
            img_ref.at[0, 0, pl.ds(0, byp), pl.ds(0, wxp)],  # shape-only
            win_ref.at[slot, c, :, pl.ds(pad, wxp)],
            sem.at[slot],
        ).wait()

    # De-offset the window once so displacements live in [0, D).
    # VMEM lane reads must be 128-aligned, so rotate dynamically and
    # take an aligned static slice: rolled[k] = full[(k + off) mod WXPF].
    off = off_ref[i, j]
    full = win_ref[slot]  # (3, BYP, WXPF)
    wxpf = full.shape[-1]
    rolled = pltpu.roll(full, wxpf - off, axis=2)

    def matmul3(wv, mh, ml):
        """Hand-rolled 3-pass bf16 split (Mosaic lacks Precision.HIGH):
        dropping only the lo*lo product term bounds the relative error
        at ~2^-18 — ~260x below the uint8 LSB budget (verified on-chip).
        Fast mode (exact=False): one bf16 pass, ~2^-8 relative — a
        documented deviation from the exact contract."""
        v_hi = wv.astype(jnp.bfloat16)
        acc = jnp.dot(v_hi, mh, preferred_element_type=jnp.float32)
        if exact:
            v_lo = (wv - v_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            acc = acc + jnp.dot(v_hi, ml, preferred_element_type=jnp.float32)
            acc = acc + jnp.dot(v_lo, mh, preferred_element_type=jnp.float32)
        return acc

    dio3 = jax.lax.broadcasted_iota(jnp.int32, (3 * byp, TX), 0)
    dmod = jax.lax.rem(dio3, byp)  # per-channel band row ids

    def y_select(cband3, r, j0, n):
        """Resolve the vertical taps for output row r, columns
        [j0, j0+n): iota-compare band select + weighted sum."""
        m0 = dmod[:, :n] == yl_ref[r, j0:j0 + n][None, :]
        m1 = dmod[:, :n] == yr_ref[r, j0:j0 + n][None, :]
        s0 = jnp.sum(jnp.where(m0, cband3, 0.0).reshape(3, byp, n), axis=1)
        s1 = jnp.sum(jnp.where(m1, cband3, 0.0).reshape(3, byp, n), axis=1)
        return wy0_ref[r, j0:j0 + n] * s0 + wy1_ref[r, j0:j0 + n] * s1

    if split:
        # Channels fold into M; per half-tile the contraction is a
        # single 128-lane window slice (K=128, no Mosaic K-pad — half
        # the MACs of the K=WXD->256 path).
        for hf in range(2):
            wv = rolled[:, :, hf * HTX:hf * HTX + 128].reshape(3 * byp, 128)
            mh = mhi_ref[0, hf]  # (128, TY*HTX)
            ml = mlo_ref[0, hf] if exact else None
            acc = matmul3(wv, mh, ml)
            for r in range(TY):
                cband3 = acc[:, r * HTX:(r + 1) * HTX]
                out_ref[0, :, r, hf * HTX:(hf + 1) * HTX] = y_select(
                    cband3, r, hf * HTX, HTX
                )
    else:
        # Channels fold into the matmul's M dimension: (3*BYP, WXD) @
        # (WXD, TY*TX) resolves the x-taps for the whole band in ONE MXU
        # op per pass.
        win2 = rolled[:, :, :wxd].reshape(3 * byp, wxd)
        m_hi = mhi_ref[0]  # (WXD, TY*TX): all 8 row-masks side by side
        cband_all = matmul3(win2, m_hi, mlo_ref[0] if exact else None)
        for r in range(TY):
            cband3 = cband_all[:, r * TX:(r + 1) * TX]
            out_ref[0, :, r, :] = y_select(cband3, r, 0, TX)


def warp_planar(
    imgs: jax.Array,
    tables: WarpTables,
    masks=None,
    interpret: bool = False,
    exact: bool = True,
) -> jax.Array:
    """(B, 3, H, W) f32 -> (B, 3, H, W) f32 barrel-warped. (Not jitted
    itself — callers trace it inside the engine's jitted step.)

    masks: the (m_hi, m_lo) pair from build_warp_masks. The engine
    builds them ONCE per config and passes them as jit arguments (they
    are ~2 GB at 1080p — rebuilding per step or embedding as literals
    would be ruinous); None rebuilds inline (tests / one-shot use).
    """
    b = imgs.shape[0]
    t = tables
    yt, xt = t.grid
    if masks is None:
        masks = build_warp_masks(t.dxl, t.dxr, t.wx0, t.wx1, wxd=t.wxd,
                                 exact=exact, split=t.split)
    if len(masks) != (2 if exact else 1):
        raise ValueError(f"expected {2 if exact else 1} mask arrays, got {len(masks)}")
    # index maps receive (grid indices..., *scalar_prefetch_refs)
    tile = lambda i, j, bb, *_: (i, j)  # noqa: E731
    if t.split:
        mspec = pl.BlockSpec((1, 2, 128, TY * HTX),
                             lambda i, j, bb, *_: (i * xt + j, 0, 0, 0))
    else:
        mspec = pl.BlockSpec((1, t.wxd, TY * TX),
                             lambda i, j, bb, *_: (i * xt + j, 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(yt, xt, b),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]  # img
        + [mspec] * len(masks)
        + [pl.BlockSpec((TY, TX), tile)] * 4,  # yl yr wy0 wy1
        out_specs=pl.BlockSpec((1, 3, TY, TX), lambda i, j, bb, *_: (bb, 0, i, j)),
        scratch_shapes=[
            pltpu.VMEM((2, 3, t.byp, t.wxpf), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kern = functools.partial(
        _warp_kernel, byp=t.byp, wxp=t.wxp, d=t.d, wxd=t.wxd, pad=t.pad,
        exact=exact, split=t.split,
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, 3, t.h, t.w), jnp.float32),
        interpret=interpret,
    )(
        jnp.asarray(t.by), jnp.asarray(t.wx), jnp.asarray(t.off), imgs,
        *masks,
        jnp.asarray(t.ylrel), jnp.asarray(t.yrrel),
        jnp.asarray(t.wy0), jnp.asarray(t.wy1),
    )


def warp_nhwc(
    imgs: jax.Array,
    tables: WarpTables,
    masks=None,
    interpret: bool = False,
    exact: bool = True,
) -> jax.Array:
    """(B, H, W, 3) f32 -> warped, via the planar kernel."""
    planar = jnp.transpose(imgs, (0, 3, 1, 2))
    out = warp_planar(planar, tables, masks, interpret, exact)
    return jnp.transpose(out, (0, 2, 3, 1))
