"""Probe what bounds the warp kernel's window DMA (~100 GB/s effective).

Round-3 xprof: the four warp class calls cost 567 us/f at 1080p, and
per-program arithmetic says the window DMA runs at ~100 GB/s — 1/8 of
HBM. Hypotheses: (a) 512-byte contiguous runs (wxp=256 bf16 slices of
W=1920 rows), (b) descriptor issue rate (fpp*3*byp strided rows per
program), (c) something else. This measures, in ONE process (axon
relay rule: only relative comparisons between later variants are
trustworthy), the full kernel vs its dma-only and noop debug variants
at fpp in {8, 16}.

Usage: python scripts/probe_warp_dma.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timeit(fn, *args, iters=8):
    out = fn(*args)
    out.block_until_ready()
    out = fn(*args)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pythoncrt_tpu.kernels import warp as kw

    h, w, b, s = 1080, 1920, 32, 0.15
    t = kw.build_warp_tables(h, w, s, row_align=8)
    masks = jax.jit(
        lambda *a: kw.build_warp_masks(*a, wxd=t.wxd, byp=t.byp, exact=True,
                                       split=t.split)
    )(t.dxl, t.dxr, t.wx0, t.wx1, t.ylrel, t.yrrel, t.wy0, t.wy1)
    rng = np.random.default_rng(0)
    imgs = jax.device_put(
        jnp.asarray(rng.integers(0, 256, (b, 3, h, w)).astype(np.float32)
                    ).astype(jnp.bfloat16))

    def run(debug):
        f = jax.jit(lambda x: kw.warp_planar(
            x, t, masks, False, True, int_domain=True, debug=debug))
        return timeit(f, imgs)

    # throwaway first measurement (relay artifact eats the first number)
    run("noop")
    for name in ("noop", "dma", "", "dma", ""):
        dt = run(name)
        label = name or "full"
        print(f"{label:5s}: {1000 * dt / b:7.3f} ms/f  ({b / dt:7.1f} fps)",
              flush=True)


if __name__ == "__main__":
    main()
