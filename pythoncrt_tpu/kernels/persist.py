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
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TY = 8
TX = 128


def _persist_kernel(first_ref, imgs_ref, state_ref, out_ref, newstate_ref,
                    *, b: int, pp: float, om: float):
    # blocks: imgs/out (B, TY, TX); state/newstate (TY, TX); first (1,)
    ppf = np.float32(pp)
    omf = np.float32(om)
    first = first_ref[0] != 0
    x0 = imgs_ref[0]
    s = jnp.where(
        first, x0, jnp.clip(ppf * state_ref[...] + omf * x0, 0.0, 1.0)
    )
    out_ref[0] = s
    for t in range(1, b):
        s = jnp.clip(ppf * s + omf * imgs_ref[t], 0.0, 1.0)
        out_ref[t] = s
    newstate_ref[...] = s


def persistence_scan(imgs: jax.Array, state: jax.Array, first_arr: jax.Array,
                     persistence: float, interpret: bool = False):
    """(B, H, W, C) f32, (H, W, C) f32, (1,) bool -> (outs, new_state).

    Channels fold into the lane grid by flattening (W, C) — the blend is
    elementwise, so layout is irrelevant as long as tiles tile the
    array. Requires (H * W * C) % (TY * TX) == 0 (engines gate)."""
    b, h = imgs.shape[0], imgs.shape[1]
    rest = int(np.prod(imgs.shape[2:]))
    flat = imgs.reshape(b, h, rest)
    sflat = state.reshape(h, rest)
    if h % TY or rest % TX:
        raise ValueError(f"persistence kernel needs H%{TY}==0 and "
                         f"(W*C)%{TX}==0, got {imgs.shape}")
    grid = (h // TY, rest // TX)
    outs, new_state = pl.pallas_call(
        functools.partial(_persist_kernel, b=b, pp=float(persistence),
                          om=float(1.0 - persistence)),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (1,) int32 first flag
            pl.BlockSpec((b, TY, TX), lambda i, j: (0, i, j)),
            pl.BlockSpec((TY, TX), lambda i, j: (i, j)),
        ],
        out_specs=[
            pl.BlockSpec((b, TY, TX), lambda i, j: (0, i, j)),
            pl.BlockSpec((TY, TX), lambda i, j: (i, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(flat.shape, jnp.float32),
            jax.ShapeDtypeStruct(sflat.shape, jnp.float32),
        ],
        interpret=interpret,
    )(first_arr.astype(jnp.int32), flat, sflat)
    return outs.reshape(imgs.shape), new_state.reshape(state.shape)
