"""Measure the REAL reference effect path (crt_filter.apply_static_effects)
on this host, for BASELINE.md (SURVEY.md §6 first milestone).

The reference's pipeline deps (moviepy / imageio-ffmpeg / PySide6) are
not installed here and installs are prohibited, but its hot path — the
per-frame effect chain plus the serial persistence blend done by
process_video (crt_filter.py:1044-1098) — only needs numpy/cv2/PIL.
ensure_deps() is satisfied by registering spec'd stub modules for the
pipeline-only imports, which the effect chain never touches, so the
numbers below are the reference's own code, byte for byte.

Usage: python scripts/bench_reference.py [--frames N] [--size WxH]
       python scripts/bench_reference.py --all   # configs c1-c4

Caveat (recorded in BASELINE.md): these are the reference's BEST case —
its moviepy decode/encode overhead is not included, only the effect
chain + the orchestrator drain. vs_baseline ratios computed against
these pins are therefore conservative (the real reference end-to-end
would be slower).
"""

from __future__ import annotations

import importlib.machinery
import importlib.util
import sys
import time
import types

import numpy as np

REF_DIR = "/root/reference"


def _stub(name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def import_reference():
    # pipeline-only deps, stubbed with real __spec__ so both
    # importlib.util.find_spec (ensure_deps) and `import x` resolve
    mp = _stub("moviepy")
    mp_ed = _stub("moviepy.editor", VideoFileClip=object)
    mp_v = _stub("moviepy.video")
    mp_vio = _stub("moviepy.video.io")
    mp_w = _stub("moviepy.video.io.ffmpeg_writer", FFMPEG_VideoWriter=object)
    mp.editor, mp.video = mp_ed, mp_v
    mp_v.io = mp_vio
    mp_vio.ffmpeg_writer = mp_w
    _stub("imageio_ffmpeg", get_ffmpeg_exe=lambda: "/nonexistent/ffmpeg")
    _stub("PySide6")

    spec = importlib.util.spec_from_file_location(
        "crt_filter", f"{REF_DIR}/crt_filter.py"
    )
    ref = importlib.util.module_from_spec(spec)
    sys.modules["crt_filter"] = ref
    spec.loader.exec_module(ref)
    return ref


def bench_c3(ref, h: int, w: int, n_frames: int) -> float:
    """BASELINE config 3 (full stack) with the same parameter values as
    bench.py's c3_full_1080p, driven the way process_video drives the
    chain: masks built once, persistence blend + uint8 on the drain."""
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (n_frames, h, w, 3), dtype=np.uint8)
    triad = ref.make_triad_mask(h, w, strength=0.35, softness_px=0.5)
    vig = ref.make_vignette(h, w, strength=0.25)

    # warmup one frame (allocator effects)
    ref.apply_static_effects(
        frames[0], 0.6, triad, 2.2, False, 1, 1.2, 0.25, 0.0, 1.5, vig,
        2.0, 0.0, False, 2, 0, 0.0, time_sec=0.0, brightness=0.02,
        contrast=1.05, gamma=1.1, saturation=0.9, temperature=0.1,
        flicker_strength=0.2, flicker_hz=2.0, grain_size=2,
        warp_strength=0.15,
    )
    ref.perf_reset()

    def one_pass() -> float:
        prev = None
        t0 = time.perf_counter()
        for i in range(n_frames):
            img = ref.apply_static_effects(
                frames[i], 0.6, triad, 2.2, False, 1, 1.2, 0.25, 0.0, 1.5,
                vig, 2.0, i * 1.25, False, 2, 0, 0.0, time_sec=i / 30.0,
                brightness=0.02, contrast=1.05, gamma=1.1, saturation=0.9,
                temperature=0.1, flicker_strength=0.2, flicker_hz=2.0,
                grain_size=2, warp_strength=0.15,
            )
            # orchestrator drain: persistence + uint8 (crt_filter.py:1086-1098)
            if prev is not None:
                img = np.clip(0.0 * prev + 1.0 * img, 0.0, 1.0)
            prev = img
            cv2_out = ref.cv2.convertScaleAbs(img, alpha=255.0)
        return n_frames / (time.perf_counter() - t0)

    # best of 2: shared host degrades under external load (BASELINE.md)
    t0 = time.perf_counter()
    fps = max(one_pass(), one_pass())
    ref.perf_report(2 * n_frames, time.perf_counter() - t0)
    return fps


def bench_config(ref, params, h: int, w: int, n_frames: int) -> float:
    """Any BASELINE config through the reference's apply_static_effects
    + orchestrator drain (crt_filter.py:1044-1098), parameters taken
    from the same EffectParams bench.py uses (no drift possible)."""
    import cv2

    p = params.clamped()
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (n_frames, h, w, 3), dtype=np.uint8)
    triad = (ref.make_triad_mask(h, w, strength=p.triad_strength,
                                 softness_px=p.triad_softness)
             if p.triad_on else None)
    vig = ref.make_vignette(h, w, strength=p.vignette_strength) if p.vignette_on else None

    def run(i: int):
        return ref.apply_static_effects(
            frames[i % n_frames], p.scanline_strength, triad, p.triad_gamma,
            p.triad_preserve_luma, p.aberration_px, p.bloom_sigma,
            p.bloom_strength, p.bloom_threshold, p.noise_strength, vig,
            p.scanline_period_px, i * p.scanline_speed_px_s / 30.0,
            p.fast_bloom, p.pixel_size, p.glitch_amp_px,
            p.glitch_height_frac, time_sec=i / 30.0,
            brightness=p.brightness, contrast=p.contrast, gamma=p.gamma,
            saturation=p.saturation, temperature=p.temperature,
            flicker_strength=p.flicker_strength, flicker_hz=p.flicker_hz,
            grain_size=p.grain_size, scanline_angle=p.scanline_angle,
            scanline_thickness=p.scanline_thickness,
            warp_strength=p.warp_strength,
        )

    run(0)  # warmup (allocator effects)

    def one_pass() -> float:
        prev = None
        t0 = time.perf_counter()
        for i in range(n_frames):
            img = run(i)
            # orchestrator drain (crt_filter.py:1086-1098)
            if prev is not None and p.persistence > 0.0:
                img = cv2.addWeighted(prev, float(p.persistence), img,
                                      float(1.0 - p.persistence), 0.0)
            prev = img
            ref.cv2.convertScaleAbs(img, alpha=255.0)
        return n_frames / (time.perf_counter() - t0)

    # best of 2: shared host degrades under external load (BASELINE.md)
    return max(one_pass(), one_pass())


CONFIG_SIZES = {
    "c1_defaults_480p": (480, 640),
    "c2_retro_720p": (720, 1280),
    "c3_full_1080p": (1080, 1920),
    "c4_temporal_1080p": (1080, 1920),
}


def main() -> None:
    n = 8
    h, w = 1080, 1920
    for i, a in enumerate(sys.argv):
        if a == "--frames":
            n = int(sys.argv[i + 1])
        if a == "--size":
            w, h = (int(x) for x in sys.argv[i + 1].split("x"))
    ref = import_reference()
    if "--all" in sys.argv:
        import os

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from bench import config_params

        for name, (ch, cw) in CONFIG_SIZES.items():
            fps = bench_config(ref, config_params(name), ch, cw, n)
            print(f"reference {name} {cw}x{ch}: {fps:.3f} fps", flush=True)
        return
    fps = bench_c3(ref, h, w, n)
    print(f"reference apply_static_effects c3 {w}x{h}: {fps:.3f} fps")


if __name__ == "__main__":
    main()
