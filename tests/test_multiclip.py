"""Multi-clip batch orchestrator (multiclip.process_videos + the
render_batch grouping + the --batch-manifest CLI): N decoders -> the
clip-sharded MultiClipEngine -> N encoders, equal to N sequential
process_video runs (VERDICT r4 item 1; BASELINE.json config 5 as a
renderable product)."""

import json

import jax
import numpy as np
import pytest

from conftest import synth_frames
from pythoncrt_tpu import EffectParams
from pythoncrt_tpu.batch import ClipJob, render_batch
from pythoncrt_tpu.multiclip import best_mesh_size, process_videos
from pythoncrt_tpu.pipeline import process_video
from test_pipeline import read_clip, write_clip

H, W, FPS = 48, 64, 24

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


@pytest.fixture
def clip_set(tmp_path):
    """4 tiny clips with DIFFERENT lengths (ragged lockstep tails)."""
    lengths = [10, 7, 12, 9]
    paths, frames = [], []
    for i, n in enumerate(lengths):
        f = synth_frames(n, H, W, seed=100 + i)
        paths.append(write_clip(tmp_path / f"in{i}.mp4", f, fps=FPS))
        frames.append(f)
    return paths, frames


def _params():
    # persistence exercises the per-clip carries; native-rng noise the
    # frame-index-keyed streams
    return EffectParams(persistence=0.6, noise_strength=3.0,
                        scanline_strength=0.5, vignette_strength=0.2)


class TestProcessVideos:
    def test_matches_sequential_renders(self, clip_set, tmp_path):
        paths, _ = clip_set
        p = _params()
        outs = [tmp_path / f"mc{i}.mp4" for i in range(len(paths))]
        res = process_videos(paths, outs, p, batch_size=4, report=False)
        assert all(r.ok for r in res), [r.error for r in res]
        for i, src in enumerate(paths):
            ref = tmp_path / f"seq{i}.mp4"
            process_video(src, ref, p, batch_size=4, report=False)
            a, b = read_clip(outs[i]), read_clip(ref)
            assert a.shape == b.shape
            # identical engine math + identical encoder settings on
            # identical frames -> decoded outputs match exactly
            np.testing.assert_array_equal(a, b)

    def test_steps_per_call_stacking(self, clip_set, tmp_path):
        """spc > 1 (multi-chunk process_stack dispatch) must not change
        a single output byte vs spc=1."""
        paths, _ = clip_set
        p = _params()
        o1 = [tmp_path / f"s1_{i}.mp4" for i in range(len(paths))]
        o2 = [tmp_path / f"s2_{i}.mp4" for i in range(len(paths))]
        r1 = process_videos(paths, o1, p, batch_size=2, steps_per_call=1,
                            report=False)
        r2 = process_videos(paths, o2, p, batch_size=2, steps_per_call=3,
                            report=False)
        assert all(r.ok for r in r1 + r2)
        for a, b in zip(o1, o2):
            np.testing.assert_array_equal(read_clip(a), read_clip(b))

    def test_bad_clip_does_not_kill_batch(self, clip_set, tmp_path):
        paths, _ = clip_set
        bad = tmp_path / "missing.mp4"
        ins = [paths[0], bad, paths[2]]
        outs = [tmp_path / f"b{i}.mp4" for i in range(3)]
        res = process_videos(ins, outs, _params(), batch_size=4,
                             report=False)
        assert not res[1].ok and res[1].error
        assert res[0].ok and res[2].ok
        assert read_clip(outs[0]).shape[0] == 10
        assert read_clip(outs[2]).shape[0] == 12

    def test_mismatched_sizes_need_explicit_size(self, tmp_path):
        a = write_clip(tmp_path / "a.mp4", synth_frames(4, 48, 64), fps=FPS)
        b = write_clip(tmp_path / "b.mp4", synth_frames(4, 32, 48), fps=FPS)
        with pytest.raises(ValueError, match="sizes differ"):
            process_videos([a, b], [tmp_path / "oa.mp4", tmp_path / "ob.mp4"],
                           _params(), report=False)
        # explicit size renders both at the common geometry
        res = process_videos(
            [a, b], [tmp_path / "oa.mp4", tmp_path / "ob.mp4"], _params(),
            width=64, height=48, report=False)
        assert all(r.ok for r in res)

    def test_best_mesh_size(self):
        assert best_mesh_size(8) == 8
        assert best_mesh_size(4) == 4
        assert best_mesh_size(6) == 6
        assert best_mesh_size(5) == 5
        assert best_mesh_size(16) == 8
        assert best_mesh_size(9) == 3  # 9 % 8 != 0 -> largest divisor <= 8
        assert best_mesh_size(8, devices=2) == 2


class TestRenderBatchGrouping:
    def test_homogeneous_jobs_group(self, clip_set, tmp_path):
        paths, _ = clip_set
        p = _params()
        calls = {"group": 0, "single": 0}

        def fake_group(ins, outs, params, **kw):
            calls["group"] += 1
            from pythoncrt_tpu.multiclip import ClipRenderResult

            return [ClipRenderResult(str(i), str(o), ok=True, frames=1)
                    for i, o in zip(ins, outs)]

        def fake_single(inp, outp, params, **kw):
            calls["single"] += 1

        jobs = [ClipJob(str(s), str(tmp_path / f"g{i}.mp4"), p)
                for i, s in enumerate(paths)]
        res = render_batch(jobs, process_fn=fake_single,
                           process_videos_fn=fake_group)
        assert calls == {"group": 1, "single": 0}
        assert all(r.ok for r in res)

    def test_group_failure_falls_back_sequential(self, clip_set, tmp_path):
        paths, _ = clip_set
        p = _params()
        calls = {"single": 0}

        def fake_group(ins, outs, params, **kw):
            raise RuntimeError("boom")

        def fake_single(inp, outp, params, **kw):
            calls["single"] += 1

        jobs = [ClipJob(str(s), str(tmp_path / f"f{i}.mp4"), p)
                for i, s in enumerate(paths)]
        res = render_batch(jobs, process_fn=fake_single,
                           process_videos_fn=fake_group)
        assert calls["single"] == len(paths)
        assert all(r.ok for r in res)

    def test_failed_group_clip_retries_sequentially(self, clip_set, tmp_path):
        paths, _ = clip_set
        p = _params()
        retried = []

        def fake_group(ins, outs, params, **kw):
            from pythoncrt_tpu.multiclip import ClipRenderResult

            return [ClipRenderResult(str(i), str(o), ok=(k != 1), frames=1,
                                     error="" if k != 1 else "decode: x")
                    for k, (i, o) in enumerate(zip(ins, outs))]

        def fake_single(inp, outp, params, **kw):
            retried.append(str(inp))

        jobs = [ClipJob(str(s), str(tmp_path / f"r{i}.mp4"), p)
                for i, s in enumerate(paths)]
        res = render_batch(jobs, process_fn=fake_single,
                           process_videos_fn=fake_group)
        assert retried == [str(paths[1])]
        assert all(r.ok for r in res)

    def test_heterogeneous_kwargs_stay_sequential(self, clip_set, tmp_path):
        paths, _ = clip_set
        p = _params()
        calls = {"group": 0, "single": 0}

        def fake_group(ins, outs, params, **kw):
            calls["group"] += 1
            from pythoncrt_tpu.multiclip import ClipRenderResult

            return [ClipRenderResult(str(i), str(o), ok=True, frames=1)
                    for i, o in zip(ins, outs)]

        def fake_single(inp, outp, params, **kw):
            calls["single"] += 1

        # segment_frames is outside the clip-sharded surface
        jobs = [ClipJob(str(s), str(tmp_path / f"h{i}.mp4"), p,
                        kwargs={"segment_frames": 8})
                for i, s in enumerate(paths)]
        render_batch(jobs, process_fn=fake_single,
                     process_videos_fn=fake_group)
        assert calls == {"group": 0, "single": len(paths)}

    def test_journal_resume_with_grouping(self, clip_set, tmp_path):
        paths, _ = clip_set
        p = _params()
        journal = tmp_path / "j.jsonl"
        jobs = [ClipJob(str(s), str(tmp_path / f"j{i}.mp4"), p)
                for i, s in enumerate(paths)]
        res1 = render_batch(jobs, journal=journal,
                            process_fn=lambda *a, **k: None, sharded=False)
        assert all(r.ok for r in res1)
        res2 = render_batch(jobs, journal=journal,
                            process_fn=lambda *a, **k: None, sharded=False)
        assert all(r.skipped for r in res2)


class TestBatchCLI:
    def test_manifest_end_to_end_and_resume(self, clip_set, tmp_path, capsys):
        paths, _ = clip_set
        from pythoncrt_tpu.cli import main

        manifest = tmp_path / "jobs.json"
        manifest.write_text(json.dumps([
            {"input": str(s), "output": str(tmp_path / f"cli{i}.mp4")}
            for i, s in enumerate(paths)
        ]))
        rc = main(["--batch-manifest", str(manifest),
                   "--persistence", "0.6", "--noise-strength", "3.0",
                   "--batch-size", "4"])
        out = capsys.readouterr().out
        assert rc == 0
        assert "4/4 clips ok" in out
        for i in range(4):
            assert (tmp_path / f"cli{i}.mp4").exists()
        # resume: journal written next to the manifest, all jobs skip
        rc2 = main(["--batch-manifest", str(manifest),
                    "--persistence", "0.6", "--noise-strength", "3.0",
                    "--batch-size", "4"])
        out2 = capsys.readouterr().out
        assert rc2 == 0
        assert "(4 resumed)" in out2

    def test_manifest_missing_input_fails_job_only(self, clip_set, tmp_path,
                                                   capsys):
        paths, _ = clip_set
        from pythoncrt_tpu.cli import main

        manifest = tmp_path / "jobs2.json"
        manifest.write_text(json.dumps({"jobs": [
            {"input": str(paths[0]), "output": str(tmp_path / "m0.mp4")},
            {"input": str(tmp_path / "nope.mp4"),
             "output": str(tmp_path / "m1.mp4")},
        ]}))
        rc = main(["--batch-manifest", str(manifest), "--batch-retries", "0",
                   "--persistence", "0.0", "--noise-strength", "0"])
        assert rc == 5
        assert (tmp_path / "m0.mp4").exists()
        assert "1/2 clips ok" in capsys.readouterr().out

    def test_bad_manifest_errors(self, tmp_path, capsys):
        from pythoncrt_tpu.cli import main

        assert main(["--batch-manifest", str(tmp_path / "absent.json")]) == 2
        bad = tmp_path / "bad.json"
        bad.write_text("{}")
        assert main(["--batch-manifest", str(bad)]) == 2
        # malformed field values get the exit-2 manifest-error contract,
        # not a raw traceback
        badw = tmp_path / "badw.json"
        badw.write_text(json.dumps([{"input": "a.mp4", "width": "1920px"}]))
        assert main(["--batch-manifest", str(badw)]) == 2
        assert "manifest job 0" in capsys.readouterr().err

    def test_manifest_per_job_preset(self, clip_set, tmp_path, capsys):
        """A job's `preset` key replaces the CLI --preset as its base
        (single-clip precedence, per job): the preset job decodes
        identical to a single-clip --preset render of the same input,
        and differs from its plain sibling in the same manifest."""
        paths, _ = clip_set
        from pythoncrt_tpu.cli import main
        from pythoncrt_tpu.params import save_preset

        preset = tmp_path / "heavy.json"
        save_preset(preset, EffectParams(persistence=0.7,
                                         vignette_strength=0.8,
                                         scanline_strength=0.4))
        manifest = tmp_path / "jobs_pp.json"
        manifest.write_text(json.dumps([
            {"input": str(paths[0]), "output": str(tmp_path / "plain.mp4")},
            {"input": str(paths[0]), "output": str(tmp_path / "heavy.mp4"),
             "preset": str(preset)},
        ]))
        rc = main(["--batch-manifest", str(manifest), "--batch-journal",
                   "none", "--noise-strength", "0", "--batch-size", "4"])
        capsys.readouterr()
        assert rc == 0
        rc2 = main(["--input", str(paths[0]),
                    "--output", str(tmp_path / "single.mp4"),
                    "--preset", str(preset), "--noise-strength", "0",
                    "--batch-size", "4"])
        capsys.readouterr()
        assert rc2 == 0
        heavy = read_clip(tmp_path / "heavy.mp4")
        np.testing.assert_array_equal(heavy,
                                      read_clip(tmp_path / "single.mp4"))
        assert np.abs(heavy.astype(int)
                      - read_clip(tmp_path / "plain.mp4").astype(int)).max() > 4

    def test_manifest_bad_preset_errors(self, clip_set, tmp_path, capsys):
        paths, _ = clip_set
        from pythoncrt_tpu.cli import main

        manifest = tmp_path / "jobs_bp.json"
        manifest.write_text(json.dumps([
            {"input": str(paths[0]), "preset": str(tmp_path / "absent.json")},
        ]))
        rc = main(["--batch-manifest", str(manifest)])
        err = capsys.readouterr().err
        assert rc == 2 and "manifest job 0" in err

    def test_manifest_per_job_text_preset(self, clip_set, tmp_path, capsys):
        """A job's `text_preset` key swaps the overlay for that job only:
        decodes identical to a single-clip --text-preset render, differs
        from its no-text sibling."""
        paths, _ = clip_set
        from pythoncrt_tpu.cli import main
        from pythoncrt_tpu.params import TextParams, save_text_preset

        tp = tmp_path / "title.json"
        save_text_preset(tp, TextParams(text="REC", size=20, x=4, y=4))
        manifest = tmp_path / "jobs_tp.json"
        manifest.write_text(json.dumps([
            {"input": str(paths[1]), "output": str(tmp_path / "notext.mp4")},
            {"input": str(paths[1]), "output": str(tmp_path / "titled.mp4"),
             "text_preset": str(tp)},
        ]))
        rc = main(["--batch-manifest", str(manifest), "--batch-journal",
                   "none", "--noise-strength", "0", "--batch-size", "4"])
        capsys.readouterr()
        assert rc == 0
        rc2 = main(["--input", str(paths[1]),
                    "--output", str(tmp_path / "single_t.mp4"),
                    "--text-preset", str(tp), "--noise-strength", "0",
                    "--batch-size", "4"])
        capsys.readouterr()
        assert rc2 == 0
        titled = read_clip(tmp_path / "titled.mp4")
        np.testing.assert_array_equal(titled,
                                      read_clip(tmp_path / "single_t.mp4"))
        assert np.abs(titled.astype(int) - read_clip(
            tmp_path / "notext.mp4").astype(int)).max() > 4


class TestHelpers:
    def test_resolve_output_rate_exact(self):
        """Lockstep renders use the EXACT source rate (rounding is only
        the cross-source agreement check) so grouped output matches a
        sequential process_video retry on fractional-rate sources."""
        from types import SimpleNamespace
        from pythoncrt_tpu.multiclip import _resolve_output_rate

        ntsc = 30000 / 1001
        infos = [SimpleNamespace(fps=ntsc), None,
                 SimpleNamespace(fps=29.97000001)]
        assert _resolve_output_rate(infos, [0, 2], None) == ntsc
        assert _resolve_output_rate(infos, [0, 2], 24.0) == 24.0
        with pytest.raises(ValueError):
            _resolve_output_rate(
                [SimpleNamespace(fps=24.0), SimpleNamespace(fps=25.0)],
                [0, 1], None)

    def test_auto_steps_per_call(self):
        from pythoncrt_tpu.multiclip import auto_steps_per_call

        assert auto_steps_per_call(2160, 3840, 4, 8) == 2   # bench c5
        assert auto_steps_per_call(1080, 1920, 4, 8) == 8
        assert auto_steps_per_call(1080, 1920, 8, 64) == 1  # floor at 1

    def test_unwritable_output_fails_clip_only(self, clip_set, tmp_path):
        """One unwritable output path (its parent is a FILE, so mkdir
        raises) fails that clip alone instead of aborting the batch."""
        paths, _ = clip_set
        blocker = tmp_path / "blocker"
        blocker.write_text("not a directory")
        outs = [tmp_path / f"uo{i}.mp4" for i in range(len(paths))]
        outs[1] = blocker / "sub" / "out.mp4"
        res = process_videos(paths, outs, _params(), batch_size=4,
                             report=False)
        assert not res[1].ok and res[1].error
        for i in (0, 2, 3):
            assert res[i].ok and outs[i].exists(), res[i].error

    def test_failed_reader_leaves_no_output_file(self, clip_set, tmp_path,
                                                 monkeypatch):
        """A clip whose READER fails to open (probe ok) must not spawn
        an encoder: no bogus empty output file next to an ok=False
        result."""
        import pythoncrt_tpu.multiclip as mc

        paths, _ = clip_set
        real_open = mc.vio.open_reader
        victim = str(paths[1])

        def flaky(path, *a, **k):
            if str(path) == victim:
                raise RuntimeError("injected codec failure")
            return real_open(path, *a, **k)

        monkeypatch.setattr(mc.vio, "open_reader", flaky)
        outs = [tmp_path / f"fr{i}.mp4" for i in range(len(paths))]
        res = process_videos(paths, outs, _params(), batch_size=4,
                             report=False)
        assert not res[1].ok and "open reader" in res[1].error
        assert not outs[1].exists()
        for i in (0, 2, 3):
            assert res[i].ok and outs[i].exists()
