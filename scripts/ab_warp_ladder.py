"""A/B: warp class ladder (pallas_call launches vs padded MAC rows).

The warp partitions tiles into window-row classes, one pallas_call per
class chained by output aliasing (kernels/warp.py). Each call carries a
launch + semaphore-setup cost; each coarser class pads every member
tile's window DMA and matmul M to the rung. This sweeps ladders on the
real chip to find the knee.

Usage: python scripts/ab_warp_ladder.py ["8,16,24" "16" "" ...]
(default sweeps the shipping ladder, a 2-class 16, and single-class)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import bench_engine, config_params  # noqa: E402


def main():
    ladders = sys.argv[1:] or ["8,16,24", "16", ""]
    p3 = config_params("c3_full_1080p")
    for lad in ladders:
        os.environ["PCRT_WARP_LADDER"] = lad
        fps, cs, _ = bench_engine(p3, 1080, 1920, 32, 10)
        print(f"ladder={lad!r}: {fps:.1f} fps (compile {cs:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
