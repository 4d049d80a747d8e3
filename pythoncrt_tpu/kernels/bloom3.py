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
and channels fold into one grid axis. The caller pre-pads H by the tap
radius (one cheap fused XLA pad) so every window DMA is unclamped and
uniform; horizontal taps are static pltpu.roll lane rotations with the
wrap columns masked to exact zeros; vertical taps are static sublane
slices of the haloed window.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TY = 8  # output stripe rows


@dataclass(frozen=True)
class Bloom3Spec:
    h: int
    w: int
    r: int  # tap radius (k = 2r + 1)
    taps: tuple  # k float taps
    strength: float
    threshold: float


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
    return Bloom3Spec(h=h, w=w, r=r, taps=taps, strength=float(strength),
                      threshold=float(threshold))


def _border_coeffs(taps, n: int, r: int):
    """(cl, cr): summed clipped-tap coefficients per position (the
    replicate-border fold, identical to ops/blur.py:_blur_axis)."""
    cl = np.zeros(n, np.float32)
    cr = np.zeros(n, np.float32)
    idx = np.arange(n)
    for i, t in enumerate(taps):
        src = idx + i - r
        cl[src < 0] += np.float32(t)
        cr[src > n - 1] += np.float32(t)
    return cl, cr


def _bloom3_kernel(img_pad, img_blk, out_ref, win_ref, sem,
                   *, spec: Bloom3Spec, nyt: int, fpp: int):
    p = pl.program_id(0)  # stripe index (H/TY)
    b = pl.program_id(1)  # flat (B*3)/fpp group
    nb = pl.num_programs(1)
    r, w, h = spec.r, spec.w, spec.h
    taps = spec.taps
    wr = TY + 2 * r  # window rows (padded source: no clamping anywhere)

    t = p * nb + b
    n_t = nyt * nb
    nbuf = 3
    slot = jax.lax.rem(t, nbuf)

    def start_dma(tt, sl):
        bb = jax.lax.rem(tt, nb)
        pp = tt // nb
        pltpu.make_async_copy(
            img_pad.at[pl.ds(bb * fpp, fpp), pl.ds(pp * TY, wr), :],
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
        img_pad.at[pl.ds(0, fpp), pl.ds(0, wr), :],  # shape-only
        win_ref.at[slot],
        sem.at[slot],
    ).wait()

    win = win_ref[slot]  # (fpp, wr, W); padded rows hold exact zeros

    # stage 0: threshold knee (same expression as the XLA path; knee(0)=0
    # keeps the pad rows exact zeros)
    if spec.threshold > 0.0:
        # same f32 expression as engine._frame_bloom_xla: a DIVISION by
        # the constant (x/c and x*(1/c) differ in f32 — exactness rules)
        thr = np.float32(min(0.99, max(0.0, spec.threshold)))
        den = np.float32(max(1e-6, 1.0 - float(thr)))
        win = jnp.clip((win - thr) / den, 0.0, 1.0)

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

    # stage 2: vertical pass over the output rows (static sublane slices
    # of the haloed H-result; pad rows are exact zeros = the zero pad).
    out = None
    for i, t_ in enumerate(taps):
        term = np.float32(t_) * hp[:, i:i + TY, :]
        out = term if out is None else out + term

    # replicate fixups: nonzero coefficients only within r rows of the
    # frame edges, so only the first/last stripes add anything. The edge
    # sample (frame row 0 / h-1) is window row r / TY+r-1 there. The
    # coefficient vectors come from the row iota + scalar constants.
    def finish(blurred):
        img = img_blk[...]
        return jnp.clip(img + np.float32(spec.strength) * blurred, 0.0, 1.0)

    if r > 0:
        row = jax.lax.broadcasted_iota(jnp.int32, (1, TY, 1), 1)
        top_coef = jnp.zeros((1, TY, 1), jnp.float32)
        bot_coef = jnp.zeros((1, TY, 1), jnp.float32)
        for i, t_ in enumerate(taps):
            if i < r:  # source row g + i - r < 0 for g < r - i
                top_coef = top_coef + jnp.where(
                    row < r - i, np.float32(t_), np.float32(0.0))
            if i > r:  # source row g + i - r > h-1 for local rr > TY-1+r-i
                bot_coef = bot_coef + jnp.where(
                    row > TY - 1 + r - i, np.float32(t_), np.float32(0.0))

        @pl.when(jnp.logical_and(p != 0, p != nyt - 1))
        def _():
            out_ref[...] = finish(out)

        @pl.when(p == 0)
        def _():
            out_ref[...] = finish(out + top_coef * hp[:, r:r + 1, :])

        @pl.when(p == nyt - 1)
        def _():
            out_ref[...] = finish(out + bot_coef * hp[:, TY + r - 1:TY + r, :])
    else:
        out_ref[...] = finish(out)


def bloom3_planar(imgs, spec: Bloom3Spec, interpret: bool = False):
    """(B, 3, H, W) f32 in [0,1] -> clip(img + strength*blur(knee(img))).

    Bit-identical to the engine's XLA path (oblur.gaussian_blur_replicate
    + composite): same tap order, same fixups, same clip."""
    b = imgs.shape[0]
    r = spec.r
    flat = imgs.reshape(b * 3, spec.h, spec.w)
    padded = jnp.pad(flat, ((0, 0), (r, r), (0, 0)))
    b3 = b * 3
    fpp = next(f for f in (8, 4, 2, 1) if b3 % f == 0)
    nyt = spec.h // TY
    out = pl.pallas_call(
        functools.partial(_bloom3_kernel, spec=spec, nyt=nyt, fpp=fpp),
        grid=(nyt, b3 // fpp),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # padded: manual window DMA
            pl.BlockSpec((fpp, TY, spec.w), lambda p, bb: (bb, p, 0)),
        ],
        out_specs=pl.BlockSpec((fpp, TY, spec.w), lambda p, bb: (bb, p, 0)),
        out_shape=jax.ShapeDtypeStruct(flat.shape, jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((3, fpp, TY + 2 * r, spec.w), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(padded, flat)
    return out.reshape(imgs.shape)


def bloom3_nhwc(imgs, spec: Bloom3Spec, interpret: bool = False):
    """(B, H, W, 3) f32 wrapper: the transposes are layout bitcasts in
    the compiled step (XLA stores these intermediates W-minor)."""
    planar = jnp.transpose(imgs, (0, 3, 1, 2))
    out = bloom3_planar(planar, spec, interpret)
    return jnp.transpose(out, (0, 2, 3, 1))
