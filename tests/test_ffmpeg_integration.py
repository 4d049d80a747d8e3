"""Real-ffmpeg integration tests (VERDICT r3 item 5 — self-closing gap).

This rig has no ffmpeg binary, so the whole subprocess surface —
gbrp planar pipes, accurate `-ss` seek resume, audio extract/mux,
segment concat stream-copy — is exercised against Popen fakes elsewhere
(tests/test_planar_pipeline.py). THIS module runs the same contracts
against a real ffmpeg and SKIPS cleanly when none exists: on any dev
host with ffmpeg installed, `pytest tests/test_ffmpeg_integration.py`
validates the real byte streams end-to-end.

Reference surfaces matched: crt_filter.py:469-514 (raw reader),
:926-1014 (writer + audio mux), :1041 (resize conditioning).
"""

import subprocess

import numpy as np
import pytest

from conftest import synth_frames
from pythoncrt_tpu.io import video as vio

FFMPEG = vio.find_ffmpeg()

pytestmark = pytest.mark.skipif(FFMPEG is None, reason="no ffmpeg binary")

W, H, FPS, N = 192, 96, 12.0, 24


def _write_clip(path, frames, fps=FPS, audio=False):
    """Encode frames (rgb24 pipe) with optional sine audio track."""
    h, w = frames.shape[1:3]
    cmd = [FFMPEG, "-hide_banner", "-loglevel", "error", "-y",
           "-f", "rawvideo", "-pix_fmt", "rgb24", "-s", f"{w}x{h}",
           "-r", str(fps), "-i", "-"]
    if audio:
        cmd += ["-f", "lavfi", "-i",
                f"sine=frequency=440:duration={len(frames) / fps}",
                "-c:a", "aac", "-shortest"]
    cmd += ["-c:v", "libx264", "-preset", "ultrafast", "-crf", "12",
            "-pix_fmt", "yuv420p", str(path)]
    p = subprocess.Popen(cmd, stdin=subprocess.PIPE,
                         stderr=subprocess.DEVNULL)
    p.stdin.write(np.ascontiguousarray(frames).data)
    p.stdin.close()
    assert p.wait(timeout=120) == 0
    return path


def _read_all(reader):
    out = []
    buf = np.empty(reader.frame_shape, np.uint8)
    while reader.read_into(buf):
        out.append(buf.copy())
    reader.close()
    return np.stack(out) if out else np.empty((0,) + reader.frame_shape,
                                              np.uint8)


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    frames = synth_frames(N, H, W, seed=3)
    return _write_clip(tmp_path_factory.mktemp("ff") / "in.mp4", frames), frames


class TestRawPipes:
    def test_gbrp_planes_match_rgb24(self, clip):
        """The planar gbrp pipe must carry the SAME bytes as rgb24,
        plane-reordered (G,B,R) — the zero-repack contract the planar
        engine layout rests on."""
        path, _ = clip
        rgb = _read_all(vio.FFmpegRawReader(str(path), W, H, FPS))
        gbrp = _read_all(vio.FFmpegRawReader(str(path), W, H, FPS,
                                             pipe_format="gbrp"))
        assert rgb.shape == (N, H, W, 3) and gbrp.shape == (N, 3, H, W)
        # gbrp plane order: plane 0=G, 1=B, 2=R
        np.testing.assert_array_equal(gbrp[:, 0], rgb[..., 1])
        np.testing.assert_array_equal(gbrp[:, 1], rgb[..., 2])
        np.testing.assert_array_equal(gbrp[:, 2], rgb[..., 0])

    def test_seek_resume_bit_identity(self, clip):
        """-ss accurate seek (half-frame-early target): frames k..N of
        a seek-opened reader must equal the straight read bitwise —
        segments.py's resume contract."""
        path, _ = clip
        whole = _read_all(vio.FFmpegRawReader(str(path), W, H, FPS))
        for k in (1, 7, 13):
            tail = _read_all(vio.FFmpegRawReader(str(path), W, H, FPS,
                                                 start_frame=k))
            assert tail.shape[0] == N - k
            np.testing.assert_array_equal(tail, whole[k:])

    def test_gbrp_writer_roundtrip(self, tmp_path, clip):
        """Planar frames piped to the encoder come back as the same
        content (codec-lossy but high-PSNR)."""
        _, frames = clip
        dst = tmp_path / "planar_out.mp4"
        planar = np.ascontiguousarray(
            np.transpose(frames, (0, 3, 1, 2))[:, [1, 2, 0]])  # G,B,R
        wtr = vio.FFmpegRawWriter(str(dst), W, H, FPS, "libx264",
                                  ["-preset", "ultrafast", "-crf", "12",
                                   "-pix_fmt", "yuv420p"], pix_fmt="gbrp")
        for f in planar:
            wtr.write_frame(f)
        wtr.close()
        got = _read_all(vio.FFmpegRawReader(str(dst), W, H, FPS))
        assert got.shape == frames.shape
        mse = np.mean((got.astype(np.float64) - frames) ** 2)
        assert 10 * np.log10(255.0 ** 2 / max(mse, 1e-9)) > 30.0

    def test_chunked_parallel_reader_matches_sequential(self, clip):
        path, _ = clip
        seq = _read_all(vio.FFmpegRawReader(str(path), W, H, FPS))
        par = vio.ChunkedParallelReader(str(path), W, H, FPS, N, 8,
                                        workers=2)
        got = []
        for _i0, batch in par.iter_batches(8):
            got.append(batch.copy())
        par.close()
        np.testing.assert_array_equal(np.concatenate(got), seq)


class TestAudio:
    def test_extract_and_mux(self, tmp_path):
        frames = synth_frames(N, H, W, seed=5)
        src = _write_clip(tmp_path / "a_in.mp4", frames, audio=True)
        wav = vio.extract_audio(src)
        assert wav is not None
        # mux it back through the writer (crt_filter.py:926-935 shape)
        dst = tmp_path / "a_out.mp4"
        wtr, _ = vio.open_writer(str(dst), W, H, FPS, audio_path=wav)
        for f in frames:
            wtr.write_frame(f)
        wtr.close()
        probe = subprocess.run(
            [FFMPEG, "-hide_banner", "-i", str(dst)],
            capture_output=True, text=True)
        assert "Audio:" in probe.stderr

    def test_no_audio_clip_returns_none(self, tmp_path):
        src = _write_clip(tmp_path / "mute.mp4", synth_frames(4, H, W))
        assert vio.extract_audio(src) is None


class TestPipelineE2E:
    def _render(self, src, dst, **kw):
        from pythoncrt_tpu import EffectParams
        from pythoncrt_tpu.pipeline import process_video

        p = EffectParams(persistence=0.5, scanline_strength=0.5,
                         noise_strength=0.0)
        process_video(src, dst, p, batch_size=4, report=False, **kw)

    def test_segment_concat_stream_copy(self, tmp_path):
        """Segmented render assembles via ffmpeg concat STREAM COPY —
        the merged stream must be the segment streams' bytes (no second
        encode generation), and match a straight render closely."""
        frames = synth_frames(N, H, W, seed=9)
        src = _write_clip(tmp_path / "seg_in.mp4", frames)
        plain, seg = tmp_path / "plain.mp4", tmp_path / "seg.mp4"
        self._render(src, plain)
        self._render(src, seg, segment_frames=8)
        a = _read_all(vio.FFmpegRawReader(str(plain), W, H, FPS))
        b = _read_all(vio.FFmpegRawReader(str(seg), W, H, FPS))
        assert a.shape == b.shape == frames.shape
        mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
        assert 10 * np.log10(255.0 ** 2 / max(mse, 1e-9)) > 35.0

    def test_audio_survives_pipeline(self, tmp_path):
        frames = synth_frames(N, H, W, seed=11)
        src = _write_clip(tmp_path / "av_in.mp4", frames, audio=True)
        dst = tmp_path / "av_out.mp4"
        self._render(src, dst)
        probe = subprocess.run(
            [FFMPEG, "-hide_banner", "-i", str(dst)],
            capture_output=True, text=True)
        assert "Audio:" in probe.stderr
