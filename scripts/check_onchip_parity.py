"""On-chip parity check for the SHIPPED compute path (real TPU, no
interpret mode) — the coverage the CPU test suite cannot provide.

Two assertions:

1. Engine (fused kernel + u8-feed int-domain warp, exactly the default
   dispatch) vs the CPU ORACLE at <= 1 LSB per channel, on the c3 full
   stack. This exercises the u8 window DMA and the u8->i32 bitcast
   de-offset roll (kernels/warp.py) on real Mosaic — the interpret-mode
   tests take the plain-roll branch and never run the bitcast.
2. u8 feed vs bf16 feed (PCRT_WARP_FEED=bf16) BITWISE on-chip: the two
   feeds carry the same integers, so any difference means the u8
   sublane-pack/lane-map assumption broke (e.g. a Mosaic tiling change).

Run after toolchain bumps and warp/fused kernel changes:
    python scripts/check_onchip_parity.py [H W]   (default 192 384)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    h, w = ((int(sys.argv[1]), int(sys.argv[2]))
            if len(sys.argv) >= 3 else (192, 384))
    import numpy as np

    from bench import config_params, make_frames
    from pythoncrt_tpu.engine import CRTEngine

    p = config_params("c3_full_1080p")
    frames = make_frames(8, h, w, seed=11)

    eng = CRTEngine(p, h, w, 30.0, rng="host")
    assert eng._pallas_fused and eng._pallas_warp, "TPU kernels not selected"
    assert eng._fused_spec.emit == "u8_255", eng._fused_spec.emit
    got = np.asarray(eng.process(frames)[0])

    # 1. vs the CPU oracle (ground truth)
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tests"))
    from test_engine_vs_oracle import render_oracle

    want = render_oracle(eng, frames)
    d = np.abs(got.astype(np.int32) - want.astype(np.int32))
    print(f"u8-feed engine vs oracle @ {w}x{h}: max {d.max()} LSB, "
          f"frac>0 {(d > 0).mean():.2e}")
    assert d.max() <= 1, d.max()

    # 2. u8 feed vs bf16 feed, bitwise
    os.environ["PCRT_WARP_FEED"] = "bf16"
    try:
        engb = CRTEngine(p, h, w, 30.0, rng="host")
        assert engb._fused_spec.emit == "bf16_255"
        gotb = np.asarray(engb.process(frames)[0])
    finally:
        del os.environ["PCRT_WARP_FEED"]
    db = np.abs(got.astype(np.int32) - gotb.astype(np.int32))
    print(f"u8 vs bf16 feed on-chip: max {db.max()} LSB, "
          f"frac>0 {(db > 0).mean():.2e}")
    assert db.max() == 0, "u8/bf16 feeds diverged — bitcast lane map broke"
    print("OK: shipped u8 path oracle-parity green, feeds bitwise equal")


if __name__ == "__main__":
    main()
