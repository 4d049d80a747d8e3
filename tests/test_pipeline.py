"""End-to-end pipeline + CLI tests: tiny mp4 in -> mp4 out, frame
count/size/psnr vs oracle (SURVEY.md §4 items 6-7)."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from conftest import synth_frames
from pythoncrt_tpu import EffectParams, oracle
from pythoncrt_tpu.io import video as vio
from pythoncrt_tpu.pipeline import process_video


def write_clip(path, frames, fps=24):
    h, w = frames.shape[1:3]
    wr = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    assert wr.isOpened()
    for f in frames:
        wr.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    wr.release()
    return path


def read_clip(path):
    cap = cv2.VideoCapture(str(path))
    frames = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(f, cv2.COLOR_BGR2RGB))
    cap.release()
    return np.stack(frames) if frames else np.zeros((0,))


@pytest.fixture
def tiny_clip(tmp_path):
    frames = synth_frames(12, 48, 64, seed=3)
    return write_clip(tmp_path / "in.mp4", frames), frames


class TestIO:
    def test_probe(self, tiny_clip):
        path, frames = tiny_clip
        info = vio.probe_clip(path)
        assert (info.width, info.height) == (64, 48)
        assert info.frame_count == 12
        assert info.fps == pytest.approx(24, abs=0.5)

    def test_reader_roundtrip_shapes(self, tiny_clip):
        path, frames = tiny_clip
        r = vio.open_reader(str(path), 64, 48, 24)
        got = list(r.iter_frames())
        r.close()
        assert len(got) == 12
        assert got[0].shape == (48, 64, 3)

    def test_reader_resize(self, tiny_clip):
        path, _ = tiny_clip
        r = vio.open_reader(str(path), 32, 24, 24)
        got = list(r.iter_frames())
        r.close()
        assert got[0].shape == (24, 32, 3)

    def test_fps_downsample(self, tiny_clip):
        path, _ = tiny_clip
        r = vio.open_reader(str(path), 64, 48, 12)
        got = list(r.iter_frames())
        r.close()
        assert len(got) in (6, 7)

    def test_read_into_matches_iter(self, tiny_clip):
        path, _ = tiny_clip
        r1 = vio.open_reader(str(path), 64, 48, 24)
        seq = list(r1.iter_frames())
        r1.close()
        r2 = vio.open_reader(str(path), 64, 48, 24)
        for f in seq:
            out = np.empty((48, 64, 3), np.uint8)
            assert r2.read_into(out)
            np.testing.assert_array_equal(out, f)
        assert not r2.read_into(np.empty((48, 64, 3), np.uint8))
        r2.close()

    @pytest.mark.parametrize("workers,chunk_batches", [(2, 1), (3, 2)])
    def test_parallel_reader_matches_sequential(self, tiny_clip, workers,
                                                chunk_batches):
        path, frames = tiny_clip
        seq = vio.open_reader(str(path), 64, 48, 24)
        want = np.stack(list(seq.iter_frames()))
        seq.close()
        par = vio.ChunkedParallelReader(
            str(path), 64, 48, 24, total_frames=len(want), batch_size=4,
            workers=workers, chunk_batches=chunk_batches,
        )
        got, idx = [], []
        for i0, batch in par.iter_batches(4):
            idx.append(i0)
            got.append(np.array(batch))
        par.close()
        got = np.concatenate(got)
        assert idx == sorted(idx)
        np.testing.assert_array_equal(got, want)

    def test_parallel_reader_overestimated_total(self, tiny_clip):
        """total_frames from ceil(duration*fps) can overshoot the real
        count; the reader must stop cleanly at actual EOF."""
        path, frames = tiny_clip
        par = vio.ChunkedParallelReader(
            str(path), 64, 48, 24, total_frames=len(frames) + 5,
            batch_size=4, workers=2, chunk_batches=1,
        )
        got = sum(b.shape[0] for _, b in par.iter_batches(4))
        par.close()
        assert got == len(frames)

    def test_parallel_reader_underestimated_total(self, tiny_clip):
        """total_frames can also UNDERSHOOT (imprecise duration
        metadata): the last chunk reads to true EOF instead of silently
        truncating relative to the sequential reader."""
        path, frames = tiny_clip
        par = vio.ChunkedParallelReader(
            str(path), 64, 48, 24, total_frames=len(frames) - 3,
            batch_size=4, workers=2, chunk_batches=1,
        )
        got = sum(b.shape[0] for _, b in par.iter_batches(4))
        par.close()
        assert got == len(frames)

    def test_parallel_reader_fps_resample_sequential(self, tiny_clip):
        """fps resampling forbids per-chunk seeks (CFR-grid rebasing /
        O(chunks^2) prefix decode): the reader must degrade to ONE
        sequential decode stream and still match the plain reader."""
        path, frames = tiny_clip
        seq = vio.open_reader(str(path), 64, 48, 12)
        want = np.stack(list(seq.iter_frames()))
        seq.close()
        par = vio.ChunkedParallelReader(
            str(path), 64, 48, 12, total_frames=len(want), batch_size=2,
            workers=3, chunk_batches=1,
        )
        assert par.workers == 1 and par._sequential
        got = np.concatenate([np.array(b) for _, b in par.iter_batches(2)])
        par.close()
        np.testing.assert_array_equal(got, want)

    def test_ffmpeg_seek_targets_half_frame_early(self, monkeypatch):
        """The resume seek must aim BETWEEN frame k-1's and frame k's pts:
        f"{k/fps:.6f}" rounds to the nearest microsecond, and rounding UP
        past frame k's true pts would make ffmpeg's accurate input seek
        drop frame k — a one-frame shift that breaks segments.py's
        bit-identical resume contract."""
        captured = {}

        class FakeProc:
            stdout = None

        def fake_popen(cmd, **kw):
            captured["cmd"] = cmd
            return FakeProc()

        monkeypatch.setattr(vio, "find_ffmpeg", lambda: "/bin/ffmpeg")
        monkeypatch.setattr(vio.subprocess, "Popen", fake_popen)
        for fps, k in ((30000.0 / 1001.0, 2997), (24.0, 7), (60.0, 1)):
            monkeypatch.setattr(
                vio, "probe_clip",
                lambda _p, f=fps: vio.ClipInfo(64, 48, f, 10_000))
            vio.FFmpegRawReader("x.mp4", 64, 48, fps, start_frame=k)
            cmd = captured["cmd"]
            ts = float(cmd[cmd.index("-ss") + 1])
            assert (k - 1) / fps < ts < k / fps, (fps, k, ts)

    @pytest.mark.skipif(vio.find_ffmpeg() is None, reason="no ffmpeg binary")
    def test_ffmpeg_reader_close_reaps_child(self, tiny_clip):
        """close() mid-stream must reap the decoder (no zombie ffmpeg
        accumulating across ChunkedParallelReader's per-chunk readers)."""
        path, _ = tiny_clip
        r = vio.FFmpegRawReader(str(path), 64, 48, 24)
        out = np.empty((48, 64, 3), np.uint8)
        assert r.read_into(out)
        r.close()
        assert r.proc.returncode is not None

    def test_parallel_reader_surfaces_decode_failure(self, tiny_clip,
                                                     monkeypatch):
        """A worker exception must raise from iter_batches, not end the
        stream as a fake EOF (truncated render reported as success)."""
        path, frames = tiny_clip
        real_open = vio.open_reader
        calls = {"n": 0}

        def flaky(*a, **k):
            calls["n"] += 1
            if k.get("start_frame", 0) > 0:
                raise RuntimeError("simulated mid-stream decoder death")
            return real_open(*a, **k)

        monkeypatch.setattr(vio, "open_reader", flaky)
        par = vio.ChunkedParallelReader(
            str(path), 64, 48, 24, total_frames=len(frames),
            batch_size=4, workers=2, chunk_batches=1,
        )
        with pytest.raises(RuntimeError, match="parallel decode worker"):
            for _ in par.iter_batches(4):
                pass
        par.close()

    def test_decoder_nonzero_exit_raises(self):
        """A short read with a nonzero decoder exit is a decode FAILURE
        (unsupported -hwaccel, corrupt input, mid-stream crash), never a
        silent EOF that truncates the render; exit 0 stays clean EOF."""

        class FakeProc:
            def __init__(self, rc):
                self.rc = rc

            def wait(self, timeout=None):
                return self.rc

        rd = vio.FFmpegRawReader.__new__(vio.FFmpegRawReader)
        rd.proc = FakeProc(1)
        with pytest.raises(RuntimeError, match="exited with code 1"):
            rd._eof_or_raise()
        rd.proc = FakeProc(0)
        assert rd._eof_or_raise() is False

    def test_chunked_reader_start_past_total(self, tiny_clip):
        """start_frame beyond the (estimated) total is a clean 0-frame
        EOF — the same contract as the sequential reader — not a
        negative buffer dimension in the worker (resume can journal more
        frames than a re-probe estimates)."""
        path, frames = tiny_clip
        n = frames.shape[0]
        rd = vio.ChunkedParallelReader(
            str(path), frames.shape[2], frames.shape[1], 24.0,
            total_frames=n, batch_size=4, workers=2, start_frame=n + 5)
        try:
            assert list(rd.iter_batches(4)) == []
        finally:
            rd.close()

    def test_encoder_probe_memoized(self, monkeypatch):
        """Capability probes run ONE subprocess per (codec, binary):
        segmented/batch renders open a writer per segment/clip and must
        not re-probe unchanging hardware every time."""
        calls = []

        class R:
            returncode = 0

        monkeypatch.setattr(vio, "find_ffmpeg", lambda: "/fake/ffmpeg")
        monkeypatch.setattr(vio.subprocess, "run",
                            lambda cmd, **k: calls.append(cmd) or R())
        monkeypatch.setattr(vio, "_PROBE_CACHE", {})
        assert vio.can_use_nvenc() and vio.can_use_nvenc()
        assert len(calls) == 1
        vio.can_use_amf()  # distinct codec: its own probe
        assert len(calls) == 2

    def test_writer_roundtrip(self, tmp_path):
        frames = synth_frames(6, 48, 64, seed=1)
        w, used_gpu = vio.open_writer(str(tmp_path / "o.mp4"), 64, 48, 24)
        for f in frames:
            w.write_frame(f)
        w.close()
        back = read_clip(tmp_path / "o.mp4")
        assert back.shape == frames.shape

    def test_encoder_selection_cpu(self):
        assert vio.select_encoder("cpu", gpu=True) == "libx264"

    def test_nvenc_preset_map(self):
        assert vio.normalize_nvenc_preset("p1") == "hp"
        assert vio.normalize_nvenc_preset("p7") == "slow"
        assert vio.normalize_nvenc_preset("hq") == "hq"
        assert vio.normalize_nvenc_preset("bogus") == "medium"
        assert vio.normalize_nvenc_preset("") == "medium"

    def test_ffparams_x264(self):
        p = vio.encoder_ffparams("libx264", crf=20, bitrate_kbps=0)
        assert "-crf" in p and "20" in p
        p = vio.encoder_ffparams("libx264", crf=20, bitrate_kbps=800)
        assert "-b:v" in p and "800k" in p


class TestPipeline:
    def test_end_to_end_psnr_vs_oracle(self, tiny_clip, tmp_path):
        path, frames = tiny_clip
        p = EffectParams(noise_strength=0.0, persistence=0.4).clamped()
        out = tmp_path / "out.mp4"
        used_gpu = process_video(path, out, p, batch_size=5, report=False)
        assert out.exists()
        got = read_clip(out)
        assert got.shape == frames.shape

        # oracle render over the decoded input frames (same decode path)
        r = vio.open_reader(str(path), 64, 48, 24)
        dec = np.stack(list(r.iter_frames()))
        r.close()
        prev = None
        want = []
        for i, f in enumerate(dec):
            img = oracle.apply_effects(f, p, phase_px=(i / 24.0) * p.scanline_speed_px_s,
                                       time_sec=i / 24.0)
            img = oracle.persistence_blend(prev, img, p.persistence)
            prev = img
            want.append(oracle.ops.to_uint8(img))
        want = np.stack(want)
        # The host encoder is lossy (cv2 mp4v fallback measures ~19 dB on
        # this content), so encode the oracle frames with the SAME writer
        # and compare decoded-vs-decoded: identical pipelines modulo the
        # <=1 LSB engine parity.
        oracle_mp4 = tmp_path / "oracle.mp4"
        w, _ = vio.open_writer(str(oracle_mp4), 64, 48, 24)
        for f in want:
            w.write_frame(f)
        w.close()
        want_dec = read_clip(oracle_mp4)
        mse = np.mean((got.astype(np.float64) - want_dec.astype(np.float64)) ** 2)
        psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-9))
        assert psnr > 40.0, f"pipeline PSNR vs same-encoded oracle too low: {psnr:.1f} dB"

    def test_output_resize_and_fps(self, tiny_clip, tmp_path):
        path, _ = tiny_clip
        out = tmp_path / "half.mp4"
        process_video(path, out, EffectParams(), width=32, height=24, fps=12,
                      batch_size=4, report=False)
        info = vio.probe_clip(out)
        assert (info.width, info.height) == (32, 24)
        assert 5 <= info.frame_count <= 7

    def test_progress_callback(self, tiny_clip, tmp_path):
        path, _ = tiny_clip
        seen = []
        process_video(path, tmp_path / "p.mp4", EffectParams(persistence=0.0),
                      batch_size=4, report=False, progress_cb=seen.append)
        assert seen and seen[-1] == 1.0
        assert all(0 <= v <= 1 for v in seen)

    def test_raising_progress_cb_fails_not_hangs(self, tiny_clip, tmp_path):
        """A progress callback that throws (e.g. a GUI widget torn down
        mid-render) must surface as a render failure — not kill the
        encode thread silently and deadlock the bounded queue."""
        path, _ = tiny_clip

        def bad_cb(frac):
            raise ValueError("widget destroyed")

        with pytest.raises(RuntimeError, match="encode failed"):
            process_video(path, tmp_path / "pc.mp4",
                          EffectParams(persistence=0.0, noise_strength=0.0),
                          batch_size=4, report=False, progress_cb=bad_cb)

    def test_encode_failure_raises_not_hangs(self, tiny_clip, tmp_path,
                                             monkeypatch):
        """A dying encoder (ffmpeg crash, disk full) must surface as an
        exception from process_video; the old behavior deadlocked on the
        bounded encode queue."""

        class ExplodingWriter:
            def __init__(self):
                self.n = 0

            def write_frame(self, frame):
                self.n += 1
                if self.n > 2:
                    raise BrokenPipeError("encoder child died")

            def close(self):
                pass

        path, _ = tiny_clip
        monkeypatch.setattr(vio, "open_writer",
                            lambda *a, **k: (ExplodingWriter(), False))
        with pytest.raises(RuntimeError, match="encode failed"):
            process_video(path, tmp_path / "x.mp4",
                          EffectParams(persistence=0.0, noise_strength=0.0),
                          batch_size=4, report=False)

    def test_writer_close_failure_raises(self, tiny_clip, tmp_path,
                                         monkeypatch):
        """A nonzero encoder exit detected at close() must fail the render
        (truncated output must never be reported as success)."""

        class BadCloseWriter:
            def write_frame(self, frame):
                pass

            def close(self):
                raise RuntimeError("ffmpeg encoder exited with code 1")

        path, _ = tiny_clip
        monkeypatch.setattr(vio, "open_writer",
                            lambda *a, **k: (BadCloseWriter(), False))
        with pytest.raises(RuntimeError, match="encode failed"):
            process_video(path, tmp_path / "y.mp4",
                          EffectParams(persistence=0.0, noise_strength=0.0),
                          batch_size=4, report=False)


class TestCLI:
    def test_help_runs_without_jax(self):
        res = subprocess.run(
            [sys.executable, "-m", "pythoncrt_tpu", "--help"],
            capture_output=True, text=True, cwd=Path(__file__).parent.parent,
        )
        assert res.returncode == 0
        assert "--scanline-strength" in res.stdout
        assert "--glitch-amp" in res.stdout

    def test_cli_render(self, tiny_clip, tmp_path):
        path, _ = tiny_clip
        out = tmp_path / "cli.mp4"
        from pythoncrt_tpu.cli import main

        rc = main([
            "--input", str(path), "--output", str(out),
            "--scanline-strength", "0.5", "--noise-strength", "0",
            "--batch-size", "4",
        ])
        assert rc == 0
        assert out.exists()
        assert vio.probe_clip(out).frame_count == 12

    def test_cli_clamps(self):
        from pythoncrt_tpu.cli import build_parser, params_from_args

        a = build_parser().parse_args([
            "--input", "x.mp4", "--persistence", "2.0", "--aberration-px", "99",
            "--temperature", "-5",
        ])
        p = params_from_args(a)
        assert p.persistence == 0.95
        assert p.aberration_px == 8
        assert p.temperature == -1.0

    def test_cli_preset_roundtrip(self, tmp_path):
        from pythoncrt_tpu.cli import build_parser, params_from_args
        from pythoncrt_tpu.params import save_preset

        p0 = EffectParams(scanline_strength=0.77, warp_strength=0.5, grain_size=3)
        save_preset(tmp_path / "p.json", p0)
        a = build_parser().parse_args(["--input", "x.mp4", "--preset", str(tmp_path / "p.json")])
        p = params_from_args(a)
        assert p.scanline_strength == pytest.approx(0.77)
        assert p.warp_strength == pytest.approx(0.5)
        assert p.grain_size == 3
        # explicit flag overrides preset
        a2 = build_parser().parse_args([
            "--input", "x.mp4", "--preset", str(tmp_path / "p.json"),
            "--warp-strength", "-0.25",
        ])
        assert params_from_args(a2).warp_strength == pytest.approx(-0.25)

    def test_cli_explicit_default_beats_preset(self, tmp_path):
        """An explicit flag wins over --preset even when its value equals
        the parser default (provided_flags SUPPRESS-parse)."""
        from pythoncrt_tpu.cli import build_parser, params_from_args, provided_flags
        from pythoncrt_tpu.params import save_preset

        save_preset(tmp_path / "p.json", EffectParams(scanline_strength=0.9))
        argv = ["--input", "x.mp4", "--preset", str(tmp_path / "p.json"),
                "--scanline-strength", "0.6"]  # 0.6 == parser default
        a = build_parser().parse_args(argv)
        p = params_from_args(a, provided_flags(argv))
        assert p.scanline_strength == pytest.approx(0.6)
        # unprovided flags still defer to the preset
        argv2 = ["--input", "x.mp4", "--preset", str(tmp_path / "p.json")]
        a2 = build_parser().parse_args(argv2)
        p2 = params_from_args(a2, provided_flags(argv2))
        assert p2.scanline_strength == pytest.approx(0.9)

    def test_preset_fast_bloom_not_overridden(self, tmp_path):
        """fast_bloom's default lives on the parser action: a preset's
        "fast_bloom": false must survive (a parser-level set_defaults
        made it look explicitly passed on every run), while explicit
        --fast-bloom / --no-fast-bloom still win."""
        from pythoncrt_tpu.cli import build_parser, params_from_args, provided_flags
        from pythoncrt_tpu.params import save_preset

        save_preset(tmp_path / "p.json", EffectParams(fast_bloom=False))
        pre = ["--input", "x.mp4", "--preset", str(tmp_path / "p.json")]
        for extra, want in ([], False), (["--fast-bloom"], True), \
                           (["--no-fast-bloom"], False):
            argv = pre + extra
            a = build_parser().parse_args(argv)
            p = params_from_args(a, provided_flags(argv))
            assert p.fast_bloom is want, (extra, p.fast_bloom)
        # no preset: the parser default is True
        a = build_parser().parse_args(["--input", "x.mp4"])
        assert params_from_args(a, provided_flags(["--input", "x.mp4"])
                                ).fast_bloom is True

    def test_text_preset_explicit_flags_win(self, tmp_path):
        """--text-preset is the BASE for text flags, same precedence as
        --preset for effect flags: an explicit --text-size overrides the
        preset's size, unprovided fields keep the preset's values."""
        import json

        from pythoncrt_tpu.cli import build_parser, params_from_args, provided_flags

        (tmp_path / "t.json").write_text(json.dumps({
            "text": "HELLO", "font": "", "size": 72, "color": "#00FF00",
            "x": 5, "y": 7, "after": True}))
        argv = ["--input", "x.mp4", "--text-preset", str(tmp_path / "t.json"),
                "--text-size", "48"]
        a = build_parser().parse_args(argv)
        t = params_from_args(a, provided_flags(argv)).text
        assert t.size == 48  # explicit flag wins
        assert (t.text, t.color, t.x, t.y, t.after) == \
            ("HELLO", "#00FF00", 5, 7, True)  # preset is the base

    def test_docstring_flags_exist_in_parser(self):
        """Every flag advertised in the cli module docstring must exist
        (the docstring is part of the project's contract surface)."""
        import re

        from pythoncrt_tpu import cli

        parser = cli.build_parser()
        known = {opt for act in parser._actions for opt in act.option_strings}
        advertised = set(re.findall(r"--[a-z][a-z0-9-]*", cli.__doc__))
        missing = advertised - known
        assert not missing, f"docstring advertises unknown flags: {missing}"

    def test_devices_flag_caps_sharding(self, tiny_clip, tmp_path):
        path, _ = tiny_clip
        out = tmp_path / "dev2.mp4"
        process_video(path, out, EffectParams(persistence=0.0),
                      batch_size=4, sharding="auto", devices=2, report=False)
        assert vio.probe_clip(out).frame_count == 12

    def test_parallel_decode_matches_single(self, tiny_clip, tmp_path):
        """decode_workers=2 must produce the same video as sequential
        decode (in-order batches, same frames, persistence chain intact)."""
        path, _ = tiny_clip
        p = EffectParams(persistence=0.6, noise_strength=0.0)
        out1 = tmp_path / "w1.mp4"
        out2 = tmp_path / "w2.mp4"
        process_video(path, out1, p, batch_size=4, report=False)
        process_video(path, out2, p, batch_size=4, decode_workers=2,
                      report=False)
        a, b = read_clip(out1), read_clip(out2)
        assert a.shape == b.shape
        np.testing.assert_array_equal(a, b)

    def test_steps_per_call_matches_single(self, tiny_clip, tmp_path):
        """steps_per_call=2 (multi-step scan dispatches) must produce the
        same video as per-batch dispatch; 12 frames at batch 4 cover one
        full super-batch (2x4) AND a short tail sliced back to a plain
        batch, with the persistence carry crossing both boundaries."""
        path, _ = tiny_clip
        p = EffectParams(persistence=0.6, noise_strength=0.0)
        out1 = tmp_path / "s1.mp4"
        out2 = tmp_path / "s2.mp4"
        process_video(path, out1, p, batch_size=4, steps_per_call=1,
                      report=False)
        process_video(path, out2, p, batch_size=4, steps_per_call=2,
                      report=False)
        a, b = read_clip(out1), read_clip(out2)
        assert a.shape == b.shape
        np.testing.assert_array_equal(a, b)

    def test_gui_flag_degrades_gracefully(self):
        res = subprocess.run(
            [sys.executable, "-m", "pythoncrt_tpu", "--gui"],
            capture_output=True, text=True, cwd=Path(__file__).parent.parent,
        )
        # either a GUI is available (unlikely headless) or clean exit code 3
        assert res.returncode in (0, 3)


class TestPresets:
    def test_full_schema_roundtrip(self, tmp_path):
        from pythoncrt_tpu.params import load_preset, save_preset

        p0 = EffectParams(triad_strength=0.42, flicker_hz=3.5,
                          scanline_angle=7.0, persistence=0.33)
        save_preset(tmp_path / "a.json", p0, crf=22, encoder="nvidia")
        d = json.loads((tmp_path / "a.json").read_text())
        # exact reference key set (crt_filter.py:2043-2080)
        assert set(d) == {
            "scanline", "triad", "triad_gamma", "triad_softness",
            "triad_preserve_luma", "pixel_size", "aberration_px", "noise",
            "bloom_sigma", "bloom_strength", "bloom_threshold", "vignette",
            "persistence", "scanline_speed", "scanline_period", "glitch_amp",
            "glitch_height", "crf", "bitrate_kbps", "nvenc_preset",
            "fast_bloom", "gpu", "encoder", "brightness", "contrast", "gamma",
            "saturation", "temperature", "flicker_strength", "flicker_hz",
            "grain_size", "scanline_angle", "scanline_thickness", "warp_strength",
        }
        p1, raw = load_preset(tmp_path / "a.json")
        assert p1.triad_strength == pytest.approx(0.42)
        assert raw["crf"] == 22 and raw["encoder"] == "nvidia"

    def test_partial_preset_keeps_base(self, tmp_path):
        (tmp_path / "part.json").write_text('{"scanline": 0.9}')
        from pythoncrt_tpu.params import load_preset

        p, _ = load_preset(tmp_path / "part.json", EffectParams(vignette_strength=0.5))
        assert p.scanline_strength == pytest.approx(0.9)
        assert p.vignette_strength == pytest.approx(0.5)

    def test_text_preset_roundtrip(self, tmp_path):
        from pythoncrt_tpu.params import TextParams, load_text_preset, save_text_preset

        t = TextParams(text="RETRO", size=24, color="#00FF00", x=5, y=6, after=False)
        save_text_preset(tmp_path / "t.json", t)
        d = json.loads((tmp_path / "t.json").read_text())
        assert set(d) == {"text", "font", "size", "color", "x", "y", "after"}
        assert load_text_preset(tmp_path / "t.json") == t


class TestSegmentResume:
    """Intra-render segment checkpointing (segments.py): crash ->
    re-run resumes from the journal, output matches a straight render."""

    PARAMS = dict(noise_strength=0.0, persistence=0.5, scanline_strength=0.5)

    def _clip(self, tmp_path, n=24):
        frames = synth_frames(n, 48, 64, seed=7)
        return write_clip(tmp_path / "seg_in.mp4", frames), frames

    def _psnr(self, a, b):
        mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
        return 10 * np.log10(255.0 ** 2 / max(mse, 1e-9))

    def test_segmented_render_matches_plain(self, tmp_path):
        path, frames = self._clip(tmp_path)
        p = EffectParams(**self.PARAMS).clamped()
        plain, seg = tmp_path / "plain.mp4", tmp_path / "seg.mp4"
        process_video(path, plain, p, batch_size=4, report=False)
        process_video(path, seg, p, batch_size=4, segment_frames=8, report=False)
        a, b = read_clip(plain), read_clip(seg)
        assert a.shape == b.shape == frames.shape
        # identical uint8 frames entered the encoders; the segment path
        # re-encodes once more on the cv2 fallback tier (no ffmpeg here)
        assert self._psnr(a, b) > 30.0
        assert not (tmp_path / "seg.mp4.segments").exists()  # cleaned up

    def test_crash_then_resume(self, tmp_path):
        path, frames = self._clip(tmp_path)
        p = EffectParams(**self.PARAMS).clamped()
        plain, seg = tmp_path / "plain2.mp4", tmp_path / "seg2.mp4"
        process_video(path, plain, p, batch_size=4, report=False)

        with pytest.raises(RuntimeError, match="injected failure"):
            process_video(path, seg, p, batch_size=4, segment_frames=8,
                          report=False, _fail_after_frames=16)
        segdir = tmp_path / "seg2.mp4.segments"
        assert segdir.exists() and not seg.exists()
        journal = (segdir / "journal.jsonl").read_text().splitlines()
        done = [json.loads(l) for l in journal[1:]]
        assert len(done) >= 1 and done[0]["frames"] == 8
        # the carry snapshot for the completed segment must exist so the
        # resumed stream is bit-identical (persistence is on)
        assert (segdir / "state-00000.npy").exists()

        # resume: completes the render and assembles the final output
        process_video(path, seg, p, batch_size=4, segment_frames=8, report=False)
        assert seg.exists()
        got = read_clip(seg)
        assert got.shape == frames.shape
        assert self._psnr(read_clip(plain), got) > 30.0

    def test_changed_config_invalidates_journal(self, tmp_path):
        path, frames = self._clip(tmp_path, n=12)
        seg = tmp_path / "seg3.mp4"
        p1 = EffectParams(**self.PARAMS).clamped()
        with pytest.raises(RuntimeError):
            process_video(path, seg, p1, batch_size=4, segment_frames=8,
                          report=False, _fail_after_frames=8)
        # different params: the stale journal must be discarded
        p2 = EffectParams(**{**self.PARAMS, "scanline_strength": 0.9}).clamped()
        process_video(path, seg, p2, batch_size=4, segment_frames=8, report=False)
        got = read_clip(seg)
        assert got.shape == frames.shape


class TestSegmentStore:
    def _store(self, tmp_path, sig=None):
        from pythoncrt_tpu.segments import SegmentStore

        return SegmentStore(tmp_path / "o.mp4", sig or {"k": 1})

    def test_fresh_store_resumes_at_zero(self, tmp_path):
        st = self._store(tmp_path)
        assert st.resume() == (0, 0, None)

    def test_corrupt_journal_resets(self, tmp_path):
        st = self._store(tmp_path)
        st.resume()
        st.journal.write_text("not json\n")
        assert st.resume() == (0, 0, None)

    def test_prefix_stops_at_missing_file(self, tmp_path):
        st = self._store(tmp_path)
        st.resume()
        st.seg_path(0).write_bytes(b"x")  # seg 0 file present
        st.mark_done(0, 8, np.zeros((2, 2, 3), np.float32))
        st.mark_done(1, 8, None)  # seg 1 journaled but file MISSING
        nxt, skip, state = st.resume()
        assert (nxt, skip) == (1, 8)
        assert state is not None and state.shape == (2, 2, 3)

    def test_corrupt_state_snapshot_resets(self, tmp_path):
        """A truncated/corrupt carry snapshot discards the journal
        (fresh render) instead of crashing or resuming a wrong carry."""
        st = self._store(tmp_path, sig={"params": {"persistence": 0.5}})
        st.resume()
        st.seg_path(0).write_bytes(b"x")
        st.mark_done(0, 8, np.zeros((2, 2, 3), np.float32))
        st._state_path(0).write_bytes(b"\x93NUMP")  # truncated .npy
        assert st.resume() == (0, 0, None)

    def test_missing_snapshot_with_persistence_resets(self, tmp_path):
        """Persistence carries state: a journaled prefix whose snapshot
        vanished must re-render, not silently restart the stream head."""
        st = self._store(tmp_path, sig={"params": {"persistence": 0.5}})
        st.resume()
        st.seg_path(0).write_bytes(b"x")
        st.mark_done(0, 8, np.zeros((2, 2, 3), np.float32))
        st._state_path(0).unlink()
        assert st.resume() == (0, 0, None)
        # persistence off: no snapshot is the expected state — resume
        st2 = self._store(tmp_path, sig={"params": {"persistence": 0.0}})
        st2.resume()
        st2.seg_path(0).write_bytes(b"x")
        st2.mark_done(0, 8, None)
        assert st2.resume() == (1, 8, None)

    def test_merge_concat_list_escapes_quotes(self, tmp_path, monkeypatch):
        """ffmpeg's concat demuxer needs ' escaped as '\\'' inside the
        quoted file entries, or apostrophe paths break the lossless
        stream-copy."""
        from pythoncrt_tpu.segments import SegmentStore
        from pythoncrt_tpu.segments import vio as seg_vio

        st = SegmentStore(tmp_path / "it's done.mp4", {"k": 1})
        st.resume()
        st.seg_path(0).write_bytes(b"x")
        calls = []

        class R:
            returncode = 0

        monkeypatch.setattr(seg_vio, "find_ffmpeg", lambda: "/fake/ffmpeg")
        monkeypatch.setattr("pythoncrt_tpu.segments.subprocess.run",
                            lambda cmd, **k: calls.append(cmd) or R())
        st.merge(1, 4, 4, 24.0, keep_segments=True)
        assert calls, "concat path not taken"
        txt = (st.dir / "concat.txt").read_text()
        assert "'\\''" in txt and "it" in txt
        # each entry stays a single well-formed file '...' line
        assert txt.startswith("file '") and txt.endswith("'\n")

    def test_merge_fallback_honors_enc_kwargs(self, tmp_path, monkeypatch):
        """Without ffmpeg the merge re-encode must use the user's codec
        settings, not defaults."""
        from pythoncrt_tpu import segments as segmod

        st = segmod.SegmentStore(tmp_path / "o2.mp4", {"k": 1})
        st.resume()
        got = {}

        class W:
            def write_frame(self, f):
                pass

            def close(self):
                pass

        def fake_open_writer(path, w, h, fps, **kw):
            got.update(kw)
            return W(), False

        monkeypatch.setattr(segmod.vio, "find_ffmpeg", lambda: None)
        monkeypatch.setattr(segmod.vio, "open_writer", fake_open_writer)
        st.merge(0, 4, 4, 24.0, enc_kwargs=dict(crf=28, gpu=True,
                                                encoder_preference="cpu"))
        assert got.get("crf") == 28 and got.get("gpu") is True
        assert got.get("encoder_preference") == "cpu"

    def test_sig_mismatch_discards(self, tmp_path):
        st = self._store(tmp_path, {"k": 1})
        st.resume()
        st.seg_path(0).write_bytes(b"x")
        st.mark_done(0, 8, None)
        st2 = self._store(tmp_path, {"k": 2})
        assert st2.resume() == (0, 0, None)
        assert not st2.seg_path(0).exists()  # stale segments wiped
