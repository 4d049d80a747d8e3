"""Probe what bounds the warp kernel's window DMA (~100 GB/s effective).

OUTCOME (round 3): standalone pallas timings are UNUSABLE on this rig
in every harness variant tried — per-iteration scalar readbacks add a
~30-60 ms relay RTT each, and readback-free loops get their identical
pending executions deduped/elided by the relay (measured 50K-1.8M
"fps"). bench_engine survives for reasons unknown (its numbers track
code changes and match xprof). The question this script asked is now
answered by the ENGINE-level debug ablation instead:
PCRT_WARP_DEBUG=dma|noop through bench_engine (see ROADMAP.md).

Kept for the record of what NOT to do; do not trust its output.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timeit(fn, a, b, masks, iters=8):
    """Axon-relay rules (BASELINE.md): alternate two inputs (same-input
    calls get deduped) and force a scalar readback per iteration."""
    import jax.numpy as jnp

    red = None
    for x in (a, b, a):
        red = fn(x, masks)
        red.block_until_ready()
    t0 = time.perf_counter()
    for i in range(iters):
        red = fn(a if i % 2 else b, masks)
    red.block_until_ready()  # one block at the end (bench_engine pattern:
    # a per-iteration readback costs a ~30-60 ms relay RTT each)
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
    mk = lambda seed: jax.device_put(
        jnp.asarray(np.random.default_rng(seed).integers(0, 256, (b, 3, h, w))
                    .astype(np.float32)).astype(jnp.bfloat16))
    ia, ib = mk(0), mk(1)

    def run(debug):
        # masks as jit ARGUMENTS (closure capture would embed ~2 GB of
        # HLO literals — the engine invariant, CLAUDE.md)
        f = jax.jit(lambda x, m: kw.warp_planar(
            x, t, m, False, True, int_domain=True, debug=debug))
        return timeit(f, ia, ib, masks)

    # throwaway first measurement (relay artifact eats the first number)
    run("noop")
    for name in ("noop", "dma", "", "dma", ""):
        dt = run(name)
        label = name or "full"
        print(f"{label:5s}: {1000 * dt / b:7.3f} ms/f  ({b / dt:7.1f} fps)",
              flush=True)


if __name__ == "__main__":
    main()
