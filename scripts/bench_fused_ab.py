"""A/B the fused-pipeline variants on the real chip (engine-level,
relay-proof timing via bench.bench_engine). Each variant is a child
process because the engine reads PCRT_* at construction and jit caches
key on code identity, not env.

Usage: python scripts/bench_fused_ab.py [c3|c4] [--iters N] [V1 V2 ...]
Variants: base, ty40, epi_xla, ty40+epi_xla, nofused
"""

from __future__ import annotations

import os
import subprocess
import sys

VARIANTS = {
    "base": {},
    "ty40": {"PCRT_FUSED_TY": "40"},
    "epi_xla": {"PCRT_FUSED_EPI": "xla"},
    "ty40+epi_xla": {"PCRT_FUSED_TY": "40", "PCRT_FUSED_EPI": "xla"},
    "nofused": {"PCRT_NO_FUSED": "1"},
    "ty72": {"PCRT_FUSED_TY": "72"},
    "ty120": {"PCRT_FUSED_TY": "120"},
    "ty72+epi_xla": {"PCRT_FUSED_TY": "72", "PCRT_FUSED_EPI": "xla"},
    "warp_dma": {"PCRT_WARP_DEBUG": "dma"},
    "warp_noop": {"PCRT_WARP_DEBUG": "noop"},
    "fused_noblur": {"PCRT_FUSED_DEBUG": "noblur"},
    "fused_nopow": {"PCRT_FUSED_DEBUG": "nopow"},
    "fused_nopre": {"PCRT_FUSED_DEBUG": "nopre"},
    "fused_noepi": {"PCRT_FUSED_DEBUG": "noepi"},
    "nbuf6": {"PCRT_WARP_NBUF": "6"},
    "fpp32": {"PCRT_WARP_FPP": "32"},
    "fpp8": {"PCRT_WARP_FPP": "8"},
    "feed_bf16": {"PCRT_WARP_FEED": "bf16"},
    "u8out_on": {"PCRT_WARP_U8OUT": "1"},
    "ty40+fpp32": {"PCRT_FUSED_TY": "40", "PCRT_WARP_FPP": "32"},
}

CHILD = r"""
import sys
sys.path.insert(0, "/root/repo")
from bench import bench_engine, config_params
cfg = sys.argv[1]
iters = int(sys.argv[2])
name = "c3_full_1080p" if cfg == "c3" else "c4_temporal_1080p"
fps, comp, _ = bench_engine(config_params(name), 1080, 1920, 32, iters)
print(f"RESULT {fps:.1f} fps = {1000.0/fps:.3f} ms/f (compile {comp:.0f}s)")
"""


def main() -> None:
    cfg = "c3"
    iters = 10
    names = []
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        a = args[i]
        if a in ("c3", "c4"):
            cfg = a
        elif a == "--iters":
            i += 1
            iters = int(args[i])
        else:
            names.append(a)
        i += 1
    if not names:
        names = ["base", "ty40", "epi_xla"]
    for name in names:
        env = dict(os.environ)
        env.update(VARIANTS[name])
        r = subprocess.run(
            [sys.executable, "-c", CHILD, cfg, str(iters)],
            env=env, capture_output=True, text=True, timeout=1800)
        line = [l for l in r.stdout.splitlines() if l.startswith("RESULT")]
        tail = line[0][7:] if line else ("FAILED\n" + r.stderr[-2000:])
        print(f"{cfg} {name:14s} {tail}", flush=True)


if __name__ == "__main__":
    main()
