"""On-chip numerics check for the fused stripe pipeline (kernels/fused.py).

Renders the c3 full-stack config twice on the REAL backend — fused
kernel vs the per-stage path (PCRT_NO_FUSED=1, read at engine
construction) — and reports the uint8 output difference. The contract:
<= 1 LSB, overwhelmingly 0 (the only toolchain-dependent ops are
pow/rint/sin, a +-1-2 ulp class; PARITY.md). Run on the TPU; the
CPU-interpret equivalent lives in tests/test_fused.py (bitwise there).

Usage: python scripts/check_fused_numerics.py [c3|c4] [H W]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = [a for a in sys.argv[1:]]
    cfg = "c3"
    if args and args[0] in ("c3", "c4"):
        cfg = args.pop(0)
    h, w = (int(args[0]), int(args[1])) if len(args) >= 2 else (1080, 1920)
    import numpy as np

    from bench import config_params, make_frames
    from pythoncrt_tpu.engine import CRTEngine

    p = config_params("c3_full_1080p" if cfg == "c3" else "c4_temporal_1080p")
    frames = make_frames(8, h, w, seed=7)

    eng = CRTEngine(p, h, w, 30.0)
    assert eng._pallas_fused, "fused path not selected (TPU backend?)"
    a = np.asarray(eng.process(frames)[0]).astype(np.int32)

    os.environ["PCRT_NO_FUSED"] = "1"
    try:
        ref = CRTEngine(p, h, w, 30.0)
        assert not ref._pallas_fused
        b = np.asarray(ref.process(frames)[0]).astype(np.int32)
    finally:
        del os.environ["PCRT_NO_FUSED"]

    d = np.abs(a - b)
    print(f"fused vs per-stage on-chip {cfg} @ {w}x{h}: max {d.max()} LSB, "
          f"mean {d.mean():.6f}, frac>0 {(d > 0).mean():.2e}")
    assert d.max() <= 1, d.max()
    print("OK (<= 1 LSB)")


if __name__ == "__main__":
    main()
