"""Pallas TPU kernel for the persistence IIR over a batch.

The reference's serial blend s_t = p*s_{t-1} + (1-p)*x_t
(crt_filter.py:1092) runs in the engine as a lax.scan over the batch
axis. That is numerically right but pays XLA per-step overhead: each of
the B steps is its own fusion reading/writing full frames (measured
0.31 ms/f at 1080p B=32 — ~3x the pure HBM traffic). Here one program
owns an (8, 128) spatial tile and walks ALL B frames in registers:
the carry never touches HBM between steps, and the whole scan is one
kernel launch.

Bit-identical to the scan: the per-step expression, operand order, and
clip are the same f32 sequence; only the (associativity-free) spatial
tiling differs. The stream-head pass-through (first frame of a stream
is unblended, crt_filter.py:1094-1095) is folded in via the same traced
flag the engine uses.

Two fusions on top of the plain scan:

- emit_u8: the uint8 cast (clip(rint(x*255)) — cv2.convertScaleAbs
  semantics, crt_filter.py:696) runs in-register on each blended frame,
  so the separate epilogue pass (read f32 + write u8 over the whole
  batch) disappears and the output write is 4x smaller.
- clip_states: MULTI-CLIP mode. The batch is C independent clips of
  B/C frames laid out flat; the carry resets to clip c's incoming state
  at each clip boundary (a static unroll — clip boundaries are known at
  trace time), and each clip's final carry lands in new_states[c].
  This replaces MultiClipEngine's vmapped lax.scan (vmapping a
  pallas_call is a measured pathology; the vmapped scan cost ~18% of
  c5 wall time, BASELINE.md).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TY = 8  # minimum tile (f32 sublane/lane quanta)
TX = 128


def _pick_tiles(b: int, h: int, rest: int):
    """Largest (ty, tx) tile dividing (h, rest) within ~4 MB of VMEM
    per in/out block: the per-program cost is dominated by launch
    overhead (the kernel walks all B frames of one tile), so at 4K the
    minimum (8, 128) tile meant ~24k programs per batch. The search is
    JOINT over (ty, tx) — a greedy ty pick can strand large batches
    with no feasible tx — and (8, 128) is always feasible as the floor
    (any B: the blocks are pipelined per frame, not resident at once)."""
    for ty in (48, 32, 24, 16, 8):
        if h % ty:
            continue
        for tx in (1536, 1024, 768, 512, 384, 256, 128):
            if rest % tx == 0 and b * ty * tx * 4 <= (4 << 20):
                return ty, tx
    return 8, 128


def _emit(s):
    # Mosaic has no f32->u8 cast; hop through i32 (values are exact
    # integers in [0, 255] after rint+clip, so the detour is lossless
    # and bit-identical to ocolor.to_uint8).
    x = jnp.clip(jnp.rint(s * np.float32(255.0)), 0.0, 255.0)
    return x.astype(jnp.int32).astype(jnp.uint8)


def _persist_kernel(first_ref, imgs_ref, state_ref, out_ref, newstate_ref,
                    *, b: int, pp: float, om: float, emit_u8: bool):
    # blocks: imgs/out (B, TY, TX); state/newstate (TY, TX); first (1,)
    ppf = np.float32(pp)
    omf = np.float32(om)
    first = first_ref[0] != 0
    x0 = imgs_ref[0]
    s = jnp.where(
        first, x0, jnp.clip(ppf * state_ref[...] + omf * x0, 0.0, 1.0)
    )
    out_ref[0] = _emit(s) if emit_u8 else s
    for t in range(1, b):
        s = jnp.clip(ppf * s + omf * imgs_ref[t], 0.0, 1.0)
        out_ref[t] = _emit(s) if emit_u8 else s
    newstate_ref[...] = s


def _persist_kernel_mc(first_ref, imgs_ref, states_ref, out_ref,
                       newstates_ref, *, b: int, cl: int, pp: float,
                       om: float, emit_u8: bool):
    # blocks: imgs/out (B, TY, TX); states/newstates (C, TY, TX)
    ppf = np.float32(pp)
    omf = np.float32(om)
    first = first_ref[0] != 0
    s = None
    for t in range(b):
        x = imgs_ref[t]
        if t % cl == 0:  # clip boundary: reset carry to this clip's state
            if t > 0:
                newstates_ref[t // cl - 1] = s
            s = jnp.where(
                first, x,
                jnp.clip(ppf * states_ref[t // cl] + omf * x, 0.0, 1.0),
            )
        else:
            s = jnp.clip(ppf * s + omf * x, 0.0, 1.0)
        out_ref[t] = _emit(s) if emit_u8 else s
    newstates_ref[b // cl - 1] = s


def persistence_scan(imgs: jax.Array, state: jax.Array, first_arr: jax.Array,
                     persistence: float, interpret: bool = False,
                     emit_u8: bool = False,
                     clip_states: Optional[jax.Array] = None):
    """(B, H, W, C) f32, (H, W, C) f32, (1,) bool -> (outs, new_state).

    Channels fold into the lane grid by flattening (W, C) — the blend is
    elementwise, so layout is irrelevant as long as tiles tile the
    array. Requires (H * W * C) % (TY * TX) == 0 (engines gate).

    emit_u8: outs come back uint8 (the engine's to_uint8 fused in).
    clip_states: (C, H, W, ch) — multi-clip mode; `state` is ignored,
    the batch is C clips of B/C frames flat, and (outs, new_states
    (C, H, W, ch)) is returned."""
    b, h = imgs.shape[0], imgs.shape[1]
    rest = int(np.prod(imgs.shape[2:]))
    flat = imgs.reshape(b, h, rest)
    if h % TY or rest % TX:
        raise ValueError(f"persistence kernel needs H%{TY}==0 and "
                         f"(W*C)%{TX}==0, got {imgs.shape}")
    ty, tx = _pick_tiles(b, h, rest)
    grid = (h // ty, rest // tx)
    out_dt = jnp.uint8 if emit_u8 else jnp.float32
    if clip_states is not None:
        nclips = clip_states.shape[0]
        if b % nclips:
            raise ValueError(f"batch {b} not divisible by {nclips} clips")
        sflat = clip_states.reshape(nclips, h, rest)
        kern = functools.partial(
            _persist_kernel_mc, b=b, cl=b // nclips,
            pp=float(persistence), om=float(1.0 - persistence),
            emit_u8=emit_u8,
        )
        sspec = pl.BlockSpec((nclips, ty, tx), lambda i, j: (0, i, j))
        sshape = jax.ShapeDtypeStruct(sflat.shape, jnp.float32)
    else:
        sflat = state.reshape(h, rest)
        kern = functools.partial(
            _persist_kernel, b=b, pp=float(persistence),
            om=float(1.0 - persistence), emit_u8=emit_u8,
        )
        sspec = pl.BlockSpec((ty, tx), lambda i, j: (i, j))
        sshape = jax.ShapeDtypeStruct(sflat.shape, jnp.float32)
    outs, new_state = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (1,) int32 first flag
            pl.BlockSpec((b, ty, tx), lambda i, j: (0, i, j)),
            sspec,
        ],
        out_specs=[
            pl.BlockSpec((b, ty, tx), lambda i, j: (0, i, j)),
            sspec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct(flat.shape, out_dt),
            sshape,
        ],
        interpret=interpret,
    )(first_arr.astype(jnp.int32), flat, sflat)
    out_shape = imgs.shape
    if clip_states is not None:
        return outs.reshape(out_shape), new_state.reshape(clip_states.shape)
    return outs.reshape(out_shape), new_state.reshape(state.shape)


def persistence_scan_nhwc(imgs, state, first_arr, persistence: float,
                          interpret: bool = False, clip_states=None):
    """NHWC entry used by the engine and MultiClipEngine: PLANAR
    (B, 3H, W) flatten — a bitcast against the W-minor physical layout
    XLA gives the NHWC intermediates (the (B, H, W*3) flatten forced a
    full-batch relayout copy, ~310 us/f at 4K) — with the uint8 cast
    fused into the store. Returns NHWC uint8 outs + f32 state(s).

    state: (H, W, 3); clip_states: (C, H, W, 3) for the multi-clip
    flat batch (state is then ignored)."""
    b, h, w = imgs.shape[0], imgs.shape[1], imgs.shape[2]
    pi = jnp.transpose(imgs, (0, 3, 1, 2)).reshape(b, 3 * h, w)
    if clip_states is not None:
        cl = clip_states.shape[0]
        pst = jnp.transpose(clip_states, (0, 3, 1, 2)).reshape(cl, 3 * h, w)
        outs, ns = persistence_scan(pi, None, first_arr, persistence,
                                    interpret, emit_u8=True, clip_states=pst)
        outs = jnp.transpose(outs.reshape(b, 3, h, w), (0, 2, 3, 1))
        return outs, jnp.transpose(ns.reshape(cl, 3, h, w), (0, 2, 3, 1))
    ps = jnp.transpose(state, (2, 0, 1)).reshape(3 * h, w)
    outs, ns = persistence_scan(pi, ps, first_arr, persistence,
                                interpret, emit_u8=True)
    outs = jnp.transpose(outs.reshape(b, 3, h, w), (0, 2, 3, 1))
    return outs, jnp.transpose(ns.reshape(3, h, w), (1, 2, 0))
