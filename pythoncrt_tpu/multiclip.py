"""Multi-clip batch render orchestrator: N decoders -> one clip-sharded
device step -> N encoders (BASELINE.json config 5 as a renderable
product, not just a bench harness).

The reference renders one clip per invocation (crt_filter.py:864-1150);
its only batch story is running the program N times. Here N clips render
in LOCKSTEP through a single jitted step: each step consumes one
batch_size-frame batch from every clip, stacked clip-major so
MultiClipEngine shards the clip axis across the device mesh with zero
collectives (clips are independent streams; per-clip persistence
carries live in the step — parallel/mesh.py).

Host pipeline (generalizing pipeline.process_video's single-clip ring):

  N decode threads (one per clip, vio reader tier)
      -> per-clip bounded queues
      -> collector thread: assembles (spc, C, B, ...) clip-major stacks
         (the one host memcpy; it overlaps device compute)
      -> main loop: MultiClipEngine.process_stack / process
         (async dispatch, per-clip carries threaded on device)
      -> async device->host copy
      -> N encode threads (per-clip writers, audio muxed per clip)

Clips may have different lengths: a finished clip's slot pads with
zeros (its writer stops at the real frame count; the padded compute is
wasted but keeps the step shape static — a recompile per departing clip
would cost far more). Per-clip decode/encode failures mark that clip
failed without killing the batch (SURVEY.md §5 elasticity obligation);
batch.render_batch layers journal/resume + retry on top and is the CLI
surface (--batch-manifest).
"""

from __future__ import annotations

import math
import os
import queue
import threading
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Optional, Sequence

import numpy as np

from . import perf
from .engine import CRTEngine
from .io import video as vio
from .params import EffectParams
from .pipeline import _feeder, _put_or_stop as _put, _writer_loop
from .text import overlay_for


@dataclass
class ClipRenderResult:
    input_path: str
    output_path: str
    ok: bool
    frames: int
    used_gpu: bool = False
    error: str = ""


class _AggregateProgress:
    """Fan-in for per-clip writer progress -> one overall callback."""

    def __init__(self, totals: Sequence[int], cb: Optional[Callable]):
        self._totals = list(totals)
        self._done = [0.0] * len(totals)
        self._cb = cb
        self._lock = threading.Lock()

    def for_clip(self, i: int):
        if self._cb is None:
            return None

        def update(frac: float) -> None:
            with self._lock:
                self._done[i] = frac * self._totals[i]
                total = sum(self._totals)
                cur = sum(self._done)
            self._cb(min(1.0, cur / total) if total else 1.0)

        return update


def best_mesh_size(n_clips: int, devices: int = 0) -> int:
    """Largest divisor of n_clips that fits the visible device count
    (MultiClipEngine needs C % ndev == 0)."""
    import jax

    ndev = len(jax.devices())
    if devices > 0:
        ndev = min(ndev, devices)
    best = 1
    for k in range(1, min(ndev, n_clips) + 1):
        if n_clips % k == 0:
            best = k
    return best


def _resolve_output_rate(infos, live, fps) -> float:
    """Common output rate for a lockstep batch. The rounding is only
    for the agreement CHECK across sources; the returned rate is the
    EXACT first source rate, like process_video uses. Parity demands
    it: fps_out drives the reader resample rate and the glitch-phase
    seeds (idx/fps), so 29.97 vs the exact 30000/1001 would make a
    grouped render differ from its sequential retry."""
    if fps and fps > 0:
        return float(fps)
    rates = {round(infos[i].fps or 24.0, 4) for i in live}
    if len(rates) != 1:
        raise ValueError(
            f"source frame rates differ ({sorted(rates)}); pass an "
            "explicit fps")
    return float(infos[live[0]].fps or 24.0)


def auto_steps_per_call(h: int, w: int, clips: int, batch: int) -> int:
    """The production auto steps-per-call rule for clip-sharded renders:
    same host-RAM budget as pipeline.process_video's auto rule (8
    batches of 32 at <=1080p), scaled by the clip-major device batch —
    keep ~spc * C * B frames in flight per dispatch. Single source of
    truth: bench.py's config-5 harness uses this same function, so its
    "production dispatch" claim stays honest if the budget changes."""
    budget = 256 if h * w <= 1920 * 1080 else 64
    return max(1, min(8, budget // max(1, clips * batch)))


def _collector(
    queues, stack_q: queue.Queue, stop: threading.Event,
    spc: int, batch: int, fshape, err: dict,
) -> None:
    """Assemble per-clip super-batches into clip-major step stacks.

    Emits ("stack", frames (spc, C, B, ...), idx0 (C,), valid (C,)) when
    every live clip produced a full super-batch, else spc ("batch",
    frames (C, B, ...), idx0, valid) items covering the ragged tail.
    Runs on its own thread so the memcpy overlaps device compute."""
    c = len(queues)
    feed_bs = spc * batch
    active = [True] * c
    next_idx = [0] * c
    try:
        while not stop.is_set() and any(active):
            bufs = [None] * c
            valid = np.zeros(c, np.int64)
            for i in range(c):
                if not active[i]:
                    continue
                # stop-aware get: a feeder that bailed on `stop` may
                # never deliver its EOF sentinel
                item = None
                got_item = False
                while not stop.is_set():
                    try:
                        item = queues[i].get(timeout=0.2)
                        got_item = True
                        break
                    except queue.Empty:
                        continue
                if not got_item:
                    return  # shutting down
                if item is None:
                    active[i] = False
                    continue
                idx0, buf = item
                bufs[i] = buf
                valid[i] = buf.shape[0]
                next_idx[i] = idx0
            if valid.sum() == 0:
                break
            idx0s = np.array(next_idx, np.int64)
            full = all(v == feed_bs for v, a in zip(valid, active) if a)
            if spc > 1 and full and valid.max() == feed_bs:
                stack = np.zeros((spc, c, batch) + fshape, np.uint8)
                for i in range(c):
                    if bufs[i] is not None:
                        stack[:, i] = bufs[i].reshape(
                            (spc, batch) + fshape)
                ok = _put(stack_q, ("stack", stack, idx0s, valid), stop)
                if not ok:
                    return
                continue
            # ragged tail (or spc == 1): per-batch items, zero-padded
            nb = max(1, -(-int(valid.max()) // batch))
            for s in range(nb):
                fr = np.zeros((c, batch) + fshape, np.uint8)
                v = np.zeros(c, np.int64)
                for i in range(c):
                    if bufs[i] is None:
                        continue
                    got = bufs[i].shape[0]
                    lo, hi = s * batch, min((s + 1) * batch, got)
                    if hi > lo:
                        fr[i, : hi - lo] = bufs[i][lo:hi]
                        v[i] = hi - lo
                if v.sum() == 0:
                    continue
                if not _put(stack_q, ("batch", fr, idx0s + s * batch, v),
                            stop):
                    return
    except Exception as e:
        err["collect"] = e
    finally:
        _put(stack_q, None, stop)


def process_videos(
    inputs: Sequence[str | Path],
    outputs: Sequence[str | Path],
    params: EffectParams,
    *,
    width: Optional[int] = None,
    height: Optional[int] = None,
    fps: Optional[float] = None,
    crf: int = 18,
    target_bitrate_kbps: int = 0,
    gpu: bool = False,
    nvenc_preset: str = "p4",
    encoder_preference: str = "auto",
    decoder_preference: str = "auto",
    batch_size: int = 8,
    engine_mode: str = "export",
    rng: str = "native",
    seed: int = 0,
    precision: str = "exact",
    pipe_format: str = "rgb24",
    devices: int = 0,
    steps_per_call: int = 0,
    progress_cb: Optional[Callable[[float], None]] = None,
    report: bool = True,
) -> list[ClipRenderResult]:
    """Render N clips in lockstep through the clip-sharded engine.

    All clips share the effect params and the output (width, height,
    fps) — that is what makes one compiled step serve the whole batch
    (BASELINE config 5: homogeneous 4K clips sharded across chips).
    With no explicit size/fps, every source must agree; otherwise pass
    width/height/fps explicitly (or render heterogeneous jobs through
    batch.render_batch, which groups by signature). Per-frame math is
    identical to N separate process_video runs: effects are frame-local,
    host/native RNG streams are frame-index keyed, and each clip's
    persistence carry threads through its own state slot.

    Returns one ClipRenderResult per clip, in input order. A clip whose
    decoder or encoder fails is marked failed without aborting the
    others."""
    inputs = [Path(p) for p in inputs]
    outputs = [Path(p) for p in outputs]
    if len(inputs) != len(outputs):
        raise ValueError("inputs and outputs must pair up")
    if not inputs:
        return []
    c = len(inputs)

    results = [
        ClipRenderResult(str(i), str(o), ok=True, frames=0)
        for i, o in zip(inputs, outputs)
    ]
    infos: list = []
    for i, p in enumerate(inputs):
        try:
            infos.append(vio.probe_clip(p))
        except Exception as e:
            # a missing/corrupt clip fails ALONE; its mesh slot pads
            infos.append(None)
            results[i].ok = False
            results[i].error = f"probe: {e}"
    live = [i for i, inf in enumerate(infos) if inf is not None]
    if not live:
        return results
    if width and height:
        out_w, out_h = int(width), int(height)
    else:
        sizes = {(infos[i].width, infos[i].height) for i in live}
        if len(sizes) != 1:
            raise ValueError(
                f"source sizes differ ({sorted(sizes)}); pass explicit "
                "width/height to render them at a common size")
        (out_w, out_h), = sizes
        out_w = int(width) if width else out_w
        out_h = int(height) if height else out_h
    fps_out = _resolve_output_rate(infos, live, fps)
    totals = [
        max(1, int(math.ceil(inf.duration * fps_out))) if inf else 0
        for inf in infos
    ]

    perf.perf_reset()
    t_start = time.perf_counter()

    text_rgba = overlay_for(out_w, out_h, params.text)
    with perf.timed("fx.compile"):
        from .pipeline import planar_pipe_gate

        want_planar = planar_pipe_gate(pipe_format)
        eng = CRTEngine(
            params, out_h, out_w, fps_out,
            engine=engine_mode, rng=rng, seed=seed,
            text_rgba=text_rgba, precision=precision,
            layout="auto" if want_planar else "nhwc",
            channel_order="gbr" if want_planar else "rgb",
        )
        planar = eng.layout == "planar"
        from .parallel import MultiClipEngine, make_mesh

        ndev = best_mesh_size(c, devices)
        mc = MultiClipEngine(eng, make_mesh(ndev, axis="clips"))
    pipe_eff = "gbrp" if planar else pipe_format
    out_pix_fmt = "gbrp" if planar else "rgb24"
    fshape = (3, out_h, out_w) if planar else (out_h, out_w, 3)

    spc = int(steps_per_call)
    if spc <= 0:
        spc = auto_steps_per_call(out_h, out_w, c, batch_size)

    audio_paths = [
        vio.extract_audio(p) if infos[i] is not None else None
        for i, p in enumerate(inputs)
    ]
    readers, writers = [], []
    feed_qs = []
    enc_qs = []
    feed_errs = [dict() for _ in range(c)]
    enc_errs = [dict() for _ in range(c)]
    stop = threading.Event()
    agg = _AggregateProgress(totals, progress_cb)
    threads: list[threading.Thread] = []
    stack_q: queue.Queue = queue.Queue(maxsize=2)
    coll_err: dict = {}

    try:
        for i, (inp, outp) in enumerate(zip(inputs, outputs)):
            if infos[i] is None:  # dead at probe: immediate EOF slot
                readers.append(None)
                writers.append(None)
                fq = queue.Queue(maxsize=2)
                fq.put(None)
                feed_qs.append(fq)
                enc_qs.append(queue.Queue(maxsize=4))
                continue
            try:
                # inside the per-clip handling: an unwritable output
                # path fails THIS clip, not the whole lockstep batch
                outp.parent.mkdir(parents=True, exist_ok=True)
                rd = vio.open_reader(
                    str(inp), out_w, out_h, fps_out, decoder_preference,
                    pipe_eff,
                )
            except Exception as e:
                results[i].ok = False
                results[i].error = f"open reader: {e}"
                rd = None
            readers.append(rd)
            if rd is None:
                # the reader already failed this clip: don't spawn an
                # encoder only to close it on zero frames — that leaves
                # a bogus empty output file next to an ok=False result
                wr = None
            else:
                try:
                    wr, used_gpu = vio.open_writer(
                        str(outp), out_w, out_h, fps_out,
                        encoder_preference=encoder_preference, gpu=gpu,
                        crf=crf, bitrate_kbps=target_bitrate_kbps,
                        nvenc_preset=nvenc_preset,
                        audio_path=audio_paths[i], pix_fmt=out_pix_fmt,
                    )
                    results[i].used_gpu = used_gpu
                except Exception as e:
                    results[i].ok = False
                    results[i].error = (
                        (results[i].error + "; " if results[i].error else "")
                        + f"open writer: {e}")
                    wr = None
            writers.append(wr)

            fq: queue.Queue = queue.Queue(maxsize=max(2, 4 // spc))
            feed_qs.append(fq)
            if rd is not None and wr is not None:
                t = threading.Thread(
                    target=_feeder,
                    args=(rd, spc * batch_size, fq, stop, 0, feed_errs[i]),
                    daemon=True,
                )
                threads.append(t)
                t.start()
            else:
                fq.put(None)  # dead clip: immediate EOF for the collector

            eq: queue.Queue = queue.Queue(maxsize=4)
            enc_qs.append(eq)
            if wr is not None:
                t = threading.Thread(
                    target=_writer_loop,
                    args=(wr, eq, agg.for_clip(i), totals[i], enc_errs[i]),
                    daemon=True,
                )
                threads.append(t)
                t.start()

        t_coll = threading.Thread(
            target=_collector,
            args=(feed_qs, stack_q, stop, spc, batch_size, fshape, coll_err),
            daemon=True,
        )
        threads.append(t_coll)
        t_coll.start()

        states = None
        pending = None  # (device array, idx->written bookkeeping)

        def enqueue(p):
            kind, out_dev, valid = p
            with perf.timed("fx.device_wait"):
                host = np.asarray(out_dev)
            if kind == "stack":  # (spc, C, B, ...) -> per clip (spc*B, ...)
                per_clip = np.swapaxes(host, 0, 1).reshape(
                    (c, -1) + host.shape[3:])
            else:  # (C, B, ...)
                per_clip = host
            for i in range(c):
                v = int(valid[i])
                if v == 0 or writers[i] is None or "encode" in enc_errs[i]:
                    continue
                while True:
                    if stop.is_set():
                        return
                    if "encode" in enc_errs[i]:
                        break  # clip failed; others keep going
                    try:
                        enc_qs[i].put(per_clip[i, :v], timeout=1.0)
                        results[i].frames += v
                        break
                    except queue.Full:
                        continue

        while True:
            item = stack_q.get()
            if item is None:
                break
            kind, frames, idx0s, valid = item
            with perf.timed("fx.dispatch"):
                if kind == "stack":
                    idx = (idx0s[None, :, None]
                           + np.arange(spc * batch_size).reshape(
                               spc, 1, batch_size))
                    out_dev, states = mc.process_stack(
                        frames, idx, states=states)
                    # the padded full-stack path only runs when every
                    # live clip filled feed_bs, so valid is feed_bs or 0
                else:
                    idx = idx0s[:, None] + np.arange(batch_size)[None, :]
                    out_dev, states = mc.process(frames, idx, states=states)
                out_dev.copy_to_host_async()
            if pending is not None:
                enqueue(pending)
            pending = (kind, out_dev,
                       valid if kind == "batch"
                       else np.minimum(valid, spc * batch_size))
        if pending is not None:
            enqueue(pending)
    finally:
        stop.set()
        for eq in enc_qs:
            try:
                eq.put(None, timeout=30)
            except queue.Full:
                pass
        for t in threads:
            t.join(timeout=120)
        for rd in readers:
            if rd is not None:
                try:
                    rd.close()
                except Exception:
                    pass
        for i, wr in enumerate(writers):
            if wr is not None:
                try:
                    wr.close()
                except Exception as e:
                    enc_errs[i].setdefault("encode", e)
        for ap in audio_paths:
            if ap:
                try:
                    os.unlink(ap)
                except OSError:
                    pass

    if "collect" in coll_err:
        raise RuntimeError("collector failed") from coll_err["collect"]
    for i in range(c):
        if "decode" in feed_errs[i]:
            results[i].ok = False
            results[i].error = (results[i].error + "; " if results[i].error
                                else "") + f"decode: {feed_errs[i]['decode']}"
        if "encode" in enc_errs[i]:
            results[i].ok = False
            results[i].error = (results[i].error + "; " if results[i].error
                                else "") + f"encode: {enc_errs[i]['encode']}"

    total_seconds = time.perf_counter() - t_start
    if report:
        perf.perf_report(
            total_frames=sum(r.frames for r in results),
            total_seconds=total_seconds,
        )
    if progress_cb is not None:
        progress_cb(1.0)
    return results
