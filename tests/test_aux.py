"""Auxiliary subsystems: perf timers, text rasterizer, params clamps."""

import time

import numpy as np
import pytest

from pythoncrt_tpu import EffectParams, TextParams, perf
from pythoncrt_tpu.text import overlay_for, parse_hex_color, rasterize_text


class TestPerf:
    def setup_method(self):
        perf.perf_reset()

    def test_timed_accumulates(self):
        with perf.timed("t.stage"):
            time.sleep(0.01)
        with perf.timed("t.stage"):
            time.sleep(0.01)
        tot, cnt = perf.snapshot()["t.stage"]
        assert cnt == 2 and tot >= 0.02

    def test_timed_iter_charges_producer(self):
        def gen():
            for i in range(3):
                time.sleep(0.005)
                yield i

        out = list(perf.timed_iter(gen(), "t.decode"))
        assert out == [0, 1, 2]
        tot, cnt = perf.snapshot()["t.decode"]
        assert cnt == 3 and tot >= 0.014

    def test_report_format_matches_reference(self):
        perf.perf_add("fx.total", 0.5)
        perf.perf_add("io.encode", 0.1)
        text = perf.perf_report(total_frames=10, total_seconds=1.0, print_fn=None)
        lines = text.splitlines()
        assert lines[0] == "perf total 1.000s"
        assert lines[1] == "perf frames 10"
        # sorted by total desc, reference line format
        assert lines[3].startswith("fx.total total=0.500s count=1 avg_ms=")
        assert lines[4].startswith("io.encode total=0.100s count=1 avg_ms=")

    def test_reset(self):
        perf.perf_add("x", 1.0)
        perf.perf_reset()
        assert perf.snapshot() == {}

    def test_thread_safety(self):
        import threading

        def work():
            for _ in range(500):
                perf.perf_add("t.mt", 0.001)

        ts = [threading.Thread(target=work) for _ in range(8)]
        [t.start() for t in ts]
        [t.join() for t in ts]
        tot, cnt = perf.snapshot()["t.mt"]
        assert cnt == 4000
        assert abs(tot - 4.0) < 1e-6


class TestText:
    def test_hex_parse(self):
        assert parse_hex_color("#FF8000") == (255, 128, 0)
        assert parse_hex_color("00ff00") == (0, 255, 0)
        assert parse_hex_color("garbage") == (255, 255, 255)
        assert parse_hex_color("") == (255, 255, 255)

    def test_empty_text_zero_canvas(self):
        out = rasterize_text(64, 32, TextParams(text=""))
        assert out.shape == (32, 64, 4)
        assert out.sum() == 0

    def test_rasterize_draws_pixels(self):
        t = TextParams(text="HELLO", size=16, color="#FF0000", x=2, y=2)
        out = rasterize_text(128, 48, t)
        drawn = out[..., 3] > 0
        assert drawn.any()
        assert out[..., 0][drawn].max() == 255  # red channel
        assert out[..., 1][drawn].max() == 0 or out[..., 1][drawn].mean() < 50

    def test_overlay_cache_and_gate(self):
        assert overlay_for(32, 32, TextParams(text="")) is None
        t = TextParams(text="A", size=12)
        a = overlay_for(64, 32, t)
        b = overlay_for(64, 32, t)
        assert a is b  # cached

    def test_overlay_cache_bounded(self):
        """The overlay cache is an LRU (GUI text edits rasterize one
        full canvas per distinct config; unbounded retention leaks)."""
        from pythoncrt_tpu import text as tmod

        cap = tmod._OVERLAY_CACHE_MAX
        for i in range(cap + 8):
            overlay_for(32, 16, TextParams(text=f"t{i}", size=10))
        assert len(tmod._OVERLAY_CACHE) <= cap
        # most-recent entry survives
        t = TextParams(text=f"t{cap + 7}", size=10)
        assert (32, 16, t) in tmod._OVERLAY_CACHE

    def test_position_respected(self):
        t = TextParams(text="X", size=20, x=100, y=30)
        out = rasterize_text(200, 80, t)
        ys, xs = np.nonzero(out[..., 3])
        assert xs.min() >= 95 and ys.min() >= 25


class TestParamGates:
    def test_stage_gates_match_reference_conditions(self):
        p = EffectParams(bloom_strength=0.5, bloom_sigma=0.0, fast_bloom=False)
        assert not p.bloom_on  # sigma 0 and no fast bloom
        assert EffectParams(bloom_strength=0.5, bloom_sigma=0.0, fast_bloom=True).bloom_on
        assert EffectParams(scanline_angle=0.0, scanline_thickness=1.0).scanlines_1d
        assert not EffectParams(scanline_thickness=1.5).scanlines_1d
        assert not EffectParams(flicker_strength=0.5, flicker_hz=0.0).flicker_on

    def test_clamp_domains(self):
        p = EffectParams(
            scanline_strength=5, aberration_px=-99, persistence=1.0,
            triad_gamma=0.0, gamma=-1, scanline_period_px=0.1,
            warp_strength=3, grain_size=0,
        ).clamped()
        assert p.scanline_strength == 1.0
        assert p.aberration_px == -8
        assert p.persistence == 0.95
        assert p.triad_gamma == 0.1
        assert p.gamma == 1e-3
        assert p.scanline_period_px == 1.0
        assert p.warp_strength == 1.0
        assert p.grain_size == 1


class TestQtTextRasterizer:
    def test_falls_back_to_pil_without_qt(self):
        from pythoncrt_tpu.text import rasterize_text, rasterize_text_qt

        t = TextParams(text="QT", size=14, x=3, y=3)
        out = rasterize_text_qt(100, 40, t)
        assert out.shape == (40, 100, 4)
        try:
            import PySide6  # noqa: F401
        except ImportError:
            # identical to the PIL path when Qt is absent
            np.testing.assert_array_equal(out, rasterize_text(100, 40, t))
