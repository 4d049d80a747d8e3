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

A `c4` argument switches to the temporal config (persistence + glitch
+ animated roll): engine vs oracle at <= 1 LSB through the IN-PLACE
aliased glitch kernel + SMEM dual-branch and the persistence scan on
real Mosaic (the CPU tests run these in interpret mode only; aliasing
semantics and the in-kernel pl.when branch are exactly what interpret
mode does not exercise).

Run after toolchain bumps and warp/fused/glitch kernel changes:
    python scripts/check_onchip_parity.py [c3|c4] [H W]  (default c3 192 384)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = [a for a in sys.argv[1:] if a not in ("c3", "c4")]
    cfg = "c4" if "c4" in sys.argv[1:] else "c3"
    h, w = ((int(args[0]), int(args[1])) if len(args) >= 2 else (192, 384))
    import numpy as np

    from bench import config_params, make_frames
    from pythoncrt_tpu.engine import CRTEngine

    name = "c3_full_1080p" if cfg == "c3" else "c4_temporal_1080p"
    p = config_params(name)
    frames = make_frames(8, h, w, seed=11)

    # layout=auto mirrors the shipping pipeline: c4 resolves PLANAR
    # (Pallas glitch active), which is the in-place aliased path
    eng = CRTEngine(p, h, w, 30.0, rng="host",
                    layout="auto" if cfg == "c4" else "nhwc")
    assert eng._pallas_fused, "TPU kernels not selected"
    feed = frames
    if eng.layout == "planar":
        feed = np.ascontiguousarray(np.transpose(frames, (0, 3, 1, 2)))
    got = np.asarray(eng.process(feed)[0])
    if eng.layout == "planar":
        got = np.transpose(got, (0, 2, 3, 1))

    # 1. vs the CPU oracle (ground truth)
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tests"))
    from test_engine_vs_oracle import render_oracle

    want = render_oracle(eng, frames)
    d = np.abs(got.astype(np.int32) - want.astype(np.int32))
    print(f"{cfg} engine vs oracle @ {w}x{h}: max {d.max()} LSB, "
          f"frac>0 {(d > 0).mean():.2e}")
    assert d.max() <= 1, d.max()
    if cfg == "c4":
        # the in-place aliased glitch path must be the one that ran
        assert eng.layout == "planar" and eng.planar_ok
        assert os.environ.get("PCRT_GLITCH_INPLACE", "1") != "0"
        print("OK: c4 on-chip parity green through the in-place "
              "aliased glitch kernel + persistence scan")
        return
    assert eng._pallas_warp, "warp kernel not selected"
    assert eng._fused_spec.emit == "u8_255", eng._fused_spec.emit

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
