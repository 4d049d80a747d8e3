"""Batch multi-clip rendering with per-clip fault tolerance and resume.

Covers BASELINE.json config 5 (N clips sharded across chips) plus the
elasticity/resume obligations SURVEY.md §5 lists as absent upstream:

- per-clip restart: one failed clip doesn't kill the batch job
  (probe-and-fallback spirit of crt_filter.py:941-953 extended to work
  units);
- segment-level resume: a render journal records completed clips, so a
  killed batch job re-runs only what's missing (the reference leaves a
  partial file and starts over).
"""

from __future__ import annotations

import json
import time
import traceback
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional, Sequence

from .params import EffectParams


@dataclass
class ClipJob:
    input_path: str
    output_path: str
    params: EffectParams
    width: Optional[int] = None
    height: Optional[int] = None
    fps: Optional[float] = None
    kwargs: dict = field(default_factory=dict)


@dataclass
class ClipResult:
    job: ClipJob
    ok: bool
    seconds: float
    error: str = ""
    skipped: bool = False  # already complete per journal


class RenderJournal:
    """Append-only JSONL journal of completed renders keyed by
    (input, output); enables resume after a crash."""

    def __init__(self, path: str | Path) -> None:
        self.path = Path(path)
        self._done: set[tuple[str, str]] = set()
        if self.path.exists():
            for line in self.path.read_text().splitlines():
                try:
                    d = json.loads(line)
                    if d.get("status") == "done":
                        self._done.add((d["input"], d["output"]))
                except (ValueError, KeyError):
                    continue

    def is_done(self, job: ClipJob) -> bool:
        return (str(job.input_path), str(job.output_path)) in self._done

    def mark_done(self, job: ClipJob, seconds: float) -> None:
        self.path.parent.mkdir(parents=True, exist_ok=True)
        with open(self.path, "a", encoding="utf-8") as f:
            f.write(json.dumps({
                "status": "done",
                "input": str(job.input_path),
                "output": str(job.output_path),
                "seconds": round(seconds, 3),
            }) + "\n")
        self._done.add((str(job.input_path), str(job.output_path)))


def render_batch(
    jobs: Sequence[ClipJob],
    *,
    journal: Optional[str | Path] = None,
    max_retries: int = 1,
    progress_cb=None,
    process_fn=None,
) -> list[ClipResult]:
    """Render clips sequentially on this host's chip(s), with per-clip
    retry and journal-based resume. (For one-host-per-chip fleets, run
    one render_batch per host over its shard of the job list; clips are
    independent streams — SURVEY.md §2.3.)"""
    if process_fn is None:
        from .pipeline import process_video as process_fn  # noqa: F811

    jr = RenderJournal(journal) if journal else None
    results: list[ClipResult] = []
    for i, job in enumerate(jobs):
        if jr is not None and jr.is_done(job):
            results.append(ClipResult(job, ok=True, seconds=0.0, skipped=True))
            continue
        t0 = time.perf_counter()
        err = ""
        ok = False
        for attempt in range(1 + max_retries):
            try:
                process_fn(
                    job.input_path, job.output_path, job.params,
                    width=job.width, height=job.height, fps=job.fps,
                    report=False, **job.kwargs,
                )
                ok = True
                break
            except Exception:
                err = traceback.format_exc(limit=4)
        dt = time.perf_counter() - t0
        if ok and jr is not None:
            jr.mark_done(job, dt)
        results.append(ClipResult(job, ok=ok, seconds=dt, error="" if ok else err))
        if progress_cb is not None:
            progress_cb((i + 1) / len(jobs))
    return results
