"""Probe: tpu.dynamic_gather via jnp.take_along_axis inside Pallas.

jax 0.9.0's Mosaic lowering maps lax.gather with same-shape 2-D
operand/indices (what jnp.take_along_axis emits) onto
tpu.dynamic_gather along sublanes (axis=0) or lanes (axis=1).

If lane-gather works at table-width minor dims, both triad pows in the
fused kernel (inputs quantized to the 1024-bin LUT grid -> only 1025
distinct values) become exact table lookups, and the warp's 2-tap
horizontal interp stops paying K=256 one-hot MACs.

Run: python scripts/probe_gather.py  (on the TPU; ~1 min of compiles)
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def kernel(tbl_ref, idx_ref, out_ref, *, axis):
    out_ref[...] = jnp.take_along_axis(
        tbl_ref[...], idx_ref[...], axis=axis, mode="promise_in_bounds"
    )


def probe(shape, axis, dtype, idtype=jnp.int32, ishape=None, imax=None):
    rng = np.random.default_rng(0)
    ishape = ishape or shape
    tbl = rng.standard_normal(shape).astype(dtype)
    idx = rng.integers(0, imax or shape[axis], ishape).astype(idtype)
    f = pl.pallas_call(
        functools.partial(kernel, axis=axis),
        out_shape=jax.ShapeDtypeStruct(ishape, dtype),
    )
    try:
        out = np.asarray(f(tbl, idx))
    except Exception as e:  # noqa: BLE001
        lines = str(e).splitlines() or [type(e).__name__]
        msg = (lines[0] or type(e).__name__)[:120]
        print(f"  {shape} axis={axis} {np.dtype(dtype).name}/{np.dtype(idtype).name}: FAIL {msg}")
        return False
    ref = np.take_along_axis(tbl, idx, axis=axis)
    ok = np.array_equal(out, ref)
    print(f"  {shape} axis={axis} {np.dtype(dtype).name}/{np.dtype(idtype).name}: "
          f"{'OK exact' if ok else 'WRONG (maxdiff %g)' % np.abs(out - ref).max()}")
    return ok


def main():
    print("backend:", jax.default_backend(), file=sys.stderr)
    # lane gather (axis=1): the triad-LUT / warp-tap shape family
    probe((8, 128), 1, np.float32)
    probe((256, 128), 1, np.float32)
    probe((8, 256), 1, np.float32)       # minor dim > 1 vreg: cross-vreg?
    probe((8, 1024), 1, np.float32)      # full 1024-entry LUT per row
    probe((256, 1024), 1, np.float32)
    probe((8, 128), 1, jnp.bfloat16)     # bf16 table (warp windows are bf16)
    probe((8, 256), 1, jnp.bfloat16)
    # sublane gather (axis=0): vertical-tap family
    probe((8, 128), 0, np.float32)
    probe((32, 128), 0, np.float32)
    probe((16, 128), 0, jnp.bfloat16)
    # MISMATCHED minor dims — the real LUT shapes: a (R, K)-wide table
    # gathered by (R, W) indices (triad LUT: K=1024 grid, W=1920 lanes)
    probe((8, 1024), 1, np.float32, ishape=(8, 1920), imax=1024)
    probe((120, 1024), 1, np.float32, ishape=(120, 1920), imax=1024)
    probe((8, 256), 1, jnp.bfloat16, ishape=(8, 1920), imax=256)
    # table narrower than a vreg / index wider (warp 2-tap interp family)
    probe((8, 128), 1, np.float32, ishape=(8, 1920), imax=128)
    # sublane-axis mismatched (vertical taps from a window taller than out)
    probe((56, 128), 0, np.float32, ishape=(8, 128), imax=56)
    probe((56, 1920), 0, np.float32, ishape=(40, 1920), imax=56)


if __name__ == "__main__":
    main()
