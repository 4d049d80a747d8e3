"""Batch renderer: per-clip fault tolerance and journal resume."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from conftest import synth_frames
from pythoncrt_tpu import EffectParams
from pythoncrt_tpu.batch import ClipJob, RenderJournal, render_batch
from test_pipeline import write_clip


@pytest.fixture
def clips(tmp_path):
    paths = []
    for i in range(3):
        p = tmp_path / f"in{i}.mp4"
        write_clip(p, synth_frames(6, 32, 48, seed=i))
        paths.append(p)
    return paths


def make_jobs(clips, tmp_path):
    p = EffectParams(noise_strength=0.0, persistence=0.0)
    return [
        ClipJob(str(c), str(tmp_path / f"out{i}.mp4"), p, kwargs=dict(batch_size=3))
        for i, c in enumerate(clips)
    ]


def test_batch_renders_all(clips, tmp_path):
    jobs = make_jobs(clips, tmp_path)
    res = render_batch(jobs)
    assert all(r.ok for r in res)
    for j in jobs:
        assert (tmp_path / j.output_path).exists()


def test_failed_clip_does_not_kill_batch(clips, tmp_path):
    jobs = make_jobs(clips, tmp_path)
    jobs[1].input_path = str(tmp_path / "missing.mp4")
    res = render_batch(jobs, max_retries=0)
    assert [r.ok for r in res] == [True, False, True]
    assert "FileNotFoundError" in res[1].error or "cannot open" in res[1].error


def test_journal_resume_skips_done(clips, tmp_path):
    jobs = make_jobs(clips, tmp_path)
    journal = tmp_path / "journal.jsonl"
    calls = []

    def fake_process(inp, out, params, **kw):
        calls.append(str(inp))

    res1 = render_batch(jobs, journal=journal, process_fn=fake_process)
    assert all(r.ok for r in res1) and len(calls) == 3
    calls.clear()
    res2 = render_batch(jobs, journal=journal, process_fn=fake_process)
    assert all(r.skipped for r in res2)
    assert calls == []


def test_journal_ignores_corrupt_lines(tmp_path):
    from pythoncrt_tpu.batch import _job_sig

    job = ClipJob("a", "b", EffectParams())
    j = tmp_path / "j.jsonl"
    j.write_text('garbage\n'
                 # lines that parse as JSON but are not objects (partial
                 # writes / corruption) are skipped, not AttributeErrors
                 'null\n'
                 '42\n'
                 '["done"]\n'
                 '{"status": "done", "input": "a", "output": "b", '
                 f'"sig": "{_job_sig(job)}"}}\n'
                 # legacy sig-less line: params unknown -> conservative
                 # re-render, never a silent stale-output skip
                 '{"status": "done", "input": "c", "output": "d"}\n')
    jr = RenderJournal(j)
    assert jr.is_done(job)
    assert not jr.is_done(ClipJob("c", "d", EffectParams()))
    assert not jr.is_done(ClipJob("x", "y", EffectParams()))


def test_journal_invalidated_by_params_change(clips, tmp_path):
    """The journal keys on (input, output, params-signature): re-running
    the same manifest with DIFFERENT params must re-render, not skip and
    keep stale outputs."""
    journal = tmp_path / "sig.jsonl"
    jobs = make_jobs(clips, tmp_path)
    res1 = render_batch(jobs, journal=journal, sharded=False)
    assert all(r.ok and not r.skipped for r in res1)
    # same params -> resumed
    res2 = render_batch(make_jobs(clips, tmp_path), journal=journal,
                        sharded=False)
    assert all(r.skipped for r in res2)
    # changed params -> same paths, new signature -> re-rendered
    p2 = EffectParams(noise_strength=0.0, persistence=0.5)
    jobs3 = [ClipJob(j.input_path, j.output_path, p2, kwargs=j.kwargs)
             for j in jobs]
    res3 = render_batch(jobs3, journal=journal, sharded=False)
    assert all(r.ok and not r.skipped for r in res3)


def test_group_result_length_mismatch_falls_back(clips, tmp_path):
    """A process_videos_fn that violates the one-result-per-input
    contract is treated as a group failure (sequential retry), never a
    silent zip truncation leaving None results."""
    jobs = [ClipJob(str(c), str(tmp_path / f"lm{i}.mp4"),
                    EffectParams(noise_strength=0.0))
            for i, c in enumerate(clips)]
    calls = {"n": 0}

    def bad_group(ins, outs, params, **kw):
        calls["n"] += 1
        from pythoncrt_tpu.multiclip import ClipRenderResult
        return [ClipRenderResult(str(ins[0]), str(outs[0]), ok=True,
                                 frames=6)]  # wrong length

    res = render_batch(jobs, journal=None, sharded=True,
                       process_fn=lambda *a, **k: None,
                       process_videos_fn=bad_group)
    assert calls["n"] == 1
    assert all(r is not None and r.ok for r in res)
