"""A/B sweep: bench c3 (or another config) under a list of env-var
settings, one engine build per variant, on the real chip.

Usage:
  python scripts/ab_env_sweep.py 'PCRT_BLUR_PAD=0' 'PCRT_BLUR_PAD=1' \
      'PCRT_WARP_LADDER=4,8,12,16,20,24,28 PCRT_BLUR_PAD=1'

Each argv entry is a space-separated K=V list applied before that
variant's engine build (and removed after). PCRT_AB_CONFIG selects the
BASELINE config (default c3_full_1080p); PCRT_AB_ITERS the timed iters.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import bench_engine, config_params  # noqa: E402

SIZES = {"c1_defaults_480p": (480, 640), "c2_retro_720p": (720, 1280),
         "c3_full_1080p": (1080, 1920), "c4_temporal_1080p": (1080, 1920)}


def main():
    cfg = os.environ.get("PCRT_AB_CONFIG", "c3_full_1080p")
    iters = int(os.environ.get("PCRT_AB_ITERS", "10"))
    h, w = SIZES[cfg]
    p = config_params(cfg)
    for variant in sys.argv[1:] or [""]:
        pairs = [kv.split("=", 1) for kv in variant.split() if kv]
        # restore (not delete) ambient values afterwards, so a shell
        # that already exports one of the knobs keeps its baseline for
        # later variants
        saved = {k: os.environ.get(k) for k, _ in pairs}
        for k, v in pairs:
            os.environ[k] = v
        try:
            fps, cs, _ = bench_engine(p, h, w, 32, iters)
            print(f"{cfg} [{variant or 'default'}]: {fps:.1f} fps "
                  f"(compile {cs:.1f}s)", flush=True)
        finally:
            for k, old in saved.items():
                if old is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = old


if __name__ == "__main__":
    main()
