"""Pallas TPU kernel: fully fused Gaussian bloom (stage 6).

The reference's gaussian bloom is threshold-knee -> separable Gaussian
blur (BORDER_REPLICATE) -> img + strength*blur -> clip
(crt_filter.py:599-611). XLA evaluates the taps as shifted full-image
passes with materialized intermediates (~1.7 ms/frame at 1080p
measured); this kernel streams row stripes through VMEM once, operating
DIRECTLY on the interleaved NHWC layout (a horizontal tap is a 3*ti
lane shift), so there are no layout transposes:

  per (batch, row-tile) program:
    1. DMA the stripe (TY + 2r rows, padded W*3 lanes) — origins are
       static multiples of the tile, double-buffered across programs;
    2. knee + horizontal taps + vertical taps as static unrolled
       multiply-adds with exact oracle tap values;
    3. write clip(img + strength*blur) for the TY output rows.

HBM traffic: ~one read + one write of the image. The wrapper pre-pads
with edge replication (the oracle's border mode) before flattening
(W, 3) into lanes, so pixel replication is correct and the kernel needs
no boundary logic.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..oracle.ops import gaussian_kernel_1d


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_ty(h: int) -> int:
    for ty in (40, 32, 24, 16, 8):
        if h % ty == 0:
            return ty
    raise ValueError(f"height {h} not divisible by 8")


@dataclass(frozen=True)
class BloomSpec:
    h: int
    w: int
    taps: tuple  # static Gaussian taps (floats)
    strength: float
    threshold: float  # 0 disables the knee
    ty: int  # output rows per program
    sy: int  # stripe rows (TY + 2r rounded up to 8)
    wtot: int  # padded pixel width (mult of 128 so W*3 lanes align)

    @property
    def radius(self) -> int:
        return len(self.taps) // 2


def build_bloom_spec(h: int, w: int, sigma: float, strength: float,
                     threshold: float) -> BloomSpec:
    if h % 8 or w % 128:
        raise ValueError(f"bloom kernel needs H%8==0 and W%128==0, got {h}x{w}")
    ty = _pick_ty(h)
    k = max(1, int(round(sigma * 3)) * 2 + 1)  # crt_filter.py:609
    taps = tuple(float(t) for t in gaussian_kernel_1d(k, sigma))
    r = k // 2
    return BloomSpec(
        h=h, w=w, taps=taps, strength=float(strength),
        threshold=float(min(0.99, max(0.0, threshold))),
        ty=ty, sy=_round_up(ty + 2 * r, 8), wtot=_round_up(w + 2 * r, 128),
    )


def _bloom_kernel(img_ref, out_ref, stripe_ref, sem, *, spec: BloomSpec):
    # img_ref: (B, HP, WTOT*3) f32 padded+flattened, ANY;
    # out block: (1, TY, W*3)
    b = pl.program_id(0)
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    t = b * n_i + i
    n_t = pl.num_programs(0) * n_i
    slot = jax.lax.rem(t, 2)
    nslot = jax.lax.rem(t + 1, 2)
    ty, sy, r = spec.ty, spec.sy, spec.radius
    w, taps = spec.w, spec.taps

    def start_dma(tt, sl):
        ii = jax.lax.rem(tt, n_i)
        bb = tt // n_i
        pltpu.make_async_copy(
            img_ref.at[bb, pl.ds(ii * ty, sy), :],
            stripe_ref.at[sl],
            sem.at[sl],
        ).start()

    @pl.when(t == 0)
    def _():
        start_dma(t, slot)

    @pl.when(t + 1 < n_t)
    def _():
        start_dma(t + 1, nslot)

    pltpu.make_async_copy(
        img_ref.at[0, pl.ds(0, sy), :], stripe_ref.at[slot], sem.at[slot]
    ).wait()

    stripe = stripe_ref[slot]  # (SY, WTOT*3); rows [r, r+TY) = output rows
    if spec.threshold > 0.0:
        thr = np.float32(spec.threshold)
        src = jnp.clip(
            (stripe - thr) * np.float32(1.0 / max(1e-6, 1.0 - spec.threshold)),
            0.0,
            1.0,
        )
    else:
        src = stripe

    hh = ty + 2 * r
    w3 = 3 * w
    # horizontal taps: an interleaved-pixel shift is 3*ti lanes
    hacc = None
    for ti, tv in enumerate(taps):
        term = np.float32(tv) * src[:hh, 3 * ti:3 * ti + w3]
        hacc = term if hacc is None else hacc + term
    # vertical taps
    vacc = None
    for ti, tv in enumerate(taps):
        term = np.float32(tv) * hacc[ti:ti + ty, :]
        vacc = term if vacc is None else vacc + term

    center = stripe[r:r + ty, 3 * r:3 * r + w3]
    out_ref[0] = jnp.clip(center + np.float32(spec.strength) * vacc, 0.0, 1.0)


def bloom_nhwc(imgs: jax.Array, spec: BloomSpec, interpret: bool = False) -> jax.Array:
    """Fused gaussian bloom over (B, H, W, 3) f32 in [0, 1]."""
    b = imgs.shape[0]
    r = spec.radius
    pad_h = spec.sy - spec.ty - r  # bottom padding beyond the radius
    pad_w = spec.wtot - spec.w - r
    padded = jnp.pad(
        imgs, ((0, 0), (r, pad_h), (r, pad_w), (0, 0)), mode="edge"
    )
    flat = padded.reshape(b, padded.shape[1], spec.wtot * 3)
    grid = (b, spec.h // spec.ty)
    out = pl.pallas_call(
        functools.partial(_bloom_kernel, spec=spec),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, spec.ty, spec.w * 3), lambda b_, i: (b_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, spec.h, spec.w * 3), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, spec.sy, spec.wtot * 3), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(flat)
    return out.reshape(b, spec.h, spec.w, 3)
