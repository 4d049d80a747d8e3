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
    j = tmp_path / "j.jsonl"
    j.write_text('garbage\n{"status": "done", "input": "a", "output": "b"}\n')
    jr = RenderJournal(j)
    assert jr.is_done(ClipJob("a", "b", EffectParams()))
    assert not jr.is_done(ClipJob("x", "y", EffectParams()))
