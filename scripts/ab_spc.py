"""A/B: steps-per-call (lax.scan chunks per dispatch) on the real chip.

The ~0.1 ms/frame gap between device-busy time and wall time at B=32
(ROADMAP.md "relay dispatch floor") is per-DISPATCH overhead; scanning
n chunks inside one dispatch should divide it by n while keeping the
per-iteration working set at one chunk (unlike batch=64, which measured
SLOWER from HBM pressure).

Usage: python scripts/ab_spc.py [spc ...]   (default 1 2 4)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import bench_engine, config_params  # noqa: E402


def main():
    spcs = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
    p3 = config_params("c3_full_1080p")
    for spc in spcs:
        os.environ["PCRT_BENCH_SPC"] = str(spc)
        fps, cs, _ = bench_engine(p3, 1080, 1920, 32, 10)
        print(f"spc={spc}: {fps:.1f} fps (compile {cs:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
