"""c5 4K stripe-ty re-sweep under the round-5 kernel state.

The 4K ty=24 auto-pick dates from the round-3 sweep (8/24/40 ->
299/311/275 fps), which predates the in-place aliased glitch and the
planar persist — both reshaped the fused kernel's VMEM liveness, so
the knee the pick_ty_fused cap encodes (~21 MB) may have moved.
BASELINE.md attributes c5's residual ~9% vs c4-per-pixel parity
(432.7 vs 478) to exactly this stripe-liveness cap.

Each point must run in its OWN process (kernel specs cache per ty per
process; the axon relay also replay-caches within a process):

    for ty in 24 40 48 80; do
      PCRT_FUSED_TY=$ty PCRT_BENCH_SPC_C5=1 SWEEP_ITERS=3 \
        timeout 3600 python scripts/sweep_c5_ty.py
    done

PCRT_BENCH_SPC_C5=1 halves the relay staging cost (~800 MB vs 1.6 GB
of 4K frames) and was measured equivalent to the official spc-2 within
run-to-run spread (BASELINE.md round-5 A/B: 441.3 vs 432.7).

RESULTS (2026-08-20, this rig): ty 24/40/48/80 -> 434.4 / **456.6** /
424.8 / 353.7 fps. ty=40 (charged liveness 28.4 MB) beats the old
ty=24 pick by +5%; ty=48 (32.4 MB) is past the Mosaic pipelining
knee. Decisive confirm under the OFFICIAL spc-2 protocol at iters=12,
each leg its own process: ty=40 **453.8** vs ty=24 449.8 (ty=24 also
read 430.8/432.2 in two spc-2 iters=3 runs — ty=40 never loses).
pick_ty_fused's cap moved 21 MB -> 29 MB accordingly, so 4K now
auto-picks ty=40 (1080p already did).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

t0 = time.time()
fps = bench.bench_c5(quick=False, iters=int(os.environ.get("SWEEP_ITERS", "3")))
print(f"RESULT ty={os.environ.get('PCRT_FUSED_TY', 'auto')} "
      f"fps={fps:.1f} wall={time.time() - t0:.0f}s", flush=True)
