"""Qt-free tests for the GUI's pure logic (reference components #23-25,
crt_filter.py:1275-1341 preview reader, :1810-1852/:1958-2017 preview
math). PySide6 is absent on TPU hosts, so everything extractable from
the Qt closure is exercised here."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from conftest import synth_frames
from pythoncrt_tpu import EffectParams, oracle
from pythoncrt_tpu.gui_qt import (
    PREVIEW_MAX_H,
    PREVIEW_MAX_W,
    PreviewReader,
    _preview_size,
    render_preview_frame,
)
from pythoncrt_tpu.text import overlay_for


class TestPreviewSize:
    def test_small_frames_untouched(self):
        assert _preview_size(320, 240) == (320, 240)

    def test_large_frames_fit_bounds(self):
        w, h = _preview_size(3840, 2160)
        assert w <= PREVIEW_MAX_W and h <= PREVIEW_MAX_H
        assert w / h == pytest.approx(3840 / 2160, rel=0.01)

    def test_degenerate_sizes(self):
        assert _preview_size(0, 0) == (1, 1)


class TestRenderPreviewFrame:
    def test_matches_oracle_stateless(self):
        frame = synth_frames(1, 48, 64, seed=7)[0]
        p = EffectParams(noise_strength=0.0, persistence=0.0)
        got, prev = render_preview_frame(frame, p, t=0.5, stateful=False)
        ref = oracle.ops.to_uint8(
            oracle.apply_effects(
                frame, p, phase_px=0.5 * p.scanline_speed_px_s, time_sec=0.5,
                noise_field=None, text_rgba=overlay_for(64, 48, p.text),
                engine="preview",
            )
        )
        assert prev is None
        np.testing.assert_array_equal(got, ref)

    def test_stateful_persistence_chains(self):
        frames = synth_frames(2, 48, 64, seed=8)
        p = EffectParams(noise_strength=0.0, persistence=0.6)
        out0, s0 = render_preview_frame(frames[0], p, t=0.0, stateful=True)
        assert s0 is not None
        out1, s1 = render_preview_frame(
            frames[1], p, t=1 / 24.0, prev_img=s0, stateful=True
        )
        # second frame must differ from its stateless render (blended)
        out1_free, _ = render_preview_frame(frames[1], p, t=1 / 24.0,
                                            stateful=False)
        assert not np.array_equal(out1, out1_free)

    def test_mismatched_prev_state_resets(self):
        frame = synth_frames(1, 48, 64, seed=9)[0]
        p = EffectParams(noise_strength=0.0, persistence=0.6)
        bad_prev = np.zeros((24, 32, 3), np.float32)
        out, s = render_preview_frame(frame, p, t=0.0, prev_img=bad_prev,
                                      stateful=True)
        assert s.shape == (48, 64, 3)

    def test_downscales_large_frames(self):
        frame = np.zeros((2160, 3840, 3), np.uint8)
        p = EffectParams(noise_strength=0.0, persistence=0.0)
        out, _ = render_preview_frame(frame, p, t=0.0)
        assert out.shape[0] <= PREVIEW_MAX_H and out.shape[1] <= PREVIEW_MAX_W


class TestPreviewReader:
    @pytest.fixture
    def clip(self, tmp_path):
        frames = synth_frames(6, 32, 48, seed=4)
        path = tmp_path / "prev.mp4"
        wr = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                             24, (48, 32))
        for f in frames:
            wr.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        wr.release()
        return str(path)

    def test_metadata(self, clip):
        r = PreviewReader(clip)
        assert r.size == (48, 32)
        assert r.fps == pytest.approx(24, abs=0.5)
        assert r.duration == pytest.approx(6 / 24, abs=0.05)
        r.close()

    def test_read_next_restarts_on_eof(self, clip):
        r = PreviewReader(clip)
        seen = [r.read_next() for _ in range(8)]  # 6 frames + wrap
        assert all(f is not None and f.shape == (32, 48, 3) for f in seen)
        r.close()

    def test_frame_at_seeks(self, clip):
        r = PreviewReader(clip)
        f0 = r.frame_at(0.0)
        f5 = r.frame_at(5 / 24.0)
        assert f0 is not None and f5 is not None
        assert not np.array_equal(f0, f5)
        r.close()


class TestQtOffscreenSmoke:
    """Exercises the real Qt window when PySide6 exists (components
    #23-25); skipped on headless TPU hosts where it doesn't."""

    def test_window_builds_offscreen(self, clip_file, monkeypatch):
        pytest.importorskip("PySide6", reason="PySide6 not installed "
                            "on this host (GUI is optional; logic is "
                            "covered Qt-free above)")
        monkeypatch.setenv("QT_QPA_PLATFORM", "offscreen")
        from PySide6.QtWidgets import QApplication

        from pythoncrt_tpu.gui_qt import qt_classes

        app = QApplication.instance() or QApplication([])
        win = qt_classes().CRTWindow()
        # preset plumbing round-trips through the real controls
        s = win._collect_settings()
        win._apply_settings(s)
        assert win._collect_settings() == s
        win.close()
        app.processEvents()

    @pytest.fixture
    def clip_file(self, tmp_path):
        frames = synth_frames(4, 32, 48, seed=7)
        path = tmp_path / "smoke.mp4"
        wr = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                             24, (48, 32))
        for f in frames:
            wr.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        wr.release()
        return str(path)
