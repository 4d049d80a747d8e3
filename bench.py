"""Headline benchmark: 1080p frames/sec/chip, full effect stack
(BASELINE.json config 3), vs the CPU reference path.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "fps", "vs_baseline": N}

vs_baseline = TPU fps / CPU-oracle fps on the identical config (the
oracle reproduces the reference chain; the upstream repo publishes no
numbers of its own — BASELINE.md).

Usage: python bench.py [--quick] [--all]
  --quick: small frames / few iters (CI smoke)
  --all:   also print per-config results for BASELINE configs 1-4 to stderr
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# Pinned CPU baselines (fps) for the vs_baseline ratios: the REAL
# reference's apply_static_effects + orchestrator drain, measured on
# this host via `scripts/bench_reference.py --all` (best-of-2; the c3
# perf report is recorded in BASELINE.md). Pinning stops vs_baseline
# from tracking shared-host load weather; the live oracle is still
# measured and logged, and if it ever beats the pin the larger (more
# conservative) denominator is used. These are the reference's BEST
# case — moviepy decode/encode overhead is excluded on every config —
# so the ratios are conservative.
PINNED_CPU_BASELINE = {
    "c1_defaults_480p": 108.26,   # 640x480
    "c2_retro_720p": 12.52,       # 1280x720
    "c3_full_1080p": 1.83,        # 1920x1080 (2026-08-17 remeasure; was 1.19)
    "c4_temporal_1080p": 2.51,    # 1920x1080
}
PINNED_CPU_BASELINE_FPS = PINNED_CPU_BASELINE["c3_full_1080p"]


def make_frames(b, h, w, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (b, h, w, 3), dtype=np.uint8)


def bench_engine(params, h, w, batch, iters, warmup=2, assoc_scan=False):
    """Device-resident engine throughput: frames and aux pre-staged in
    HBM, outputs stay in HBM (block_until_ready forces completion without
    a device->host copy).

    Rationale: this rig reaches the TPU through a loopback relay whose
    host<->device path measures ~25-90 MB/s — three orders of magnitude
    below real v5e PCIe DMA — so transfer-inclusive numbers here would
    benchmark the tunnel, not the framework. The production pipeline
    overlaps DMA with compute (pipeline.py); per-chip kernel throughput
    is the metric that transfers to real deployments.
    """
    import os

    import jax

    from pythoncrt_tpu.engine import CRTEngine

    import jax.numpy as jnp

    # PCRT_BENCH_LAYOUT=nhwc A/Bs the legacy interleaved layout; the
    # default mirrors the pipeline: layout=auto stages planar frames
    # exactly where production feeds them (ffmpeg -pix_fmt gbrp decodes
    # straight into the kernel layout) and NHWC where the planar step
    # can't run (XLA-glitch fallbacks, text-after overlays, non-Pallas
    # warp configs — engine.planar_ok; the c4 glitch config resolves
    # PLANAR here because its Pallas glitch kernel is active).
    layout = os.environ.get("PCRT_BENCH_LAYOUT", "auto")
    eng = CRTEngine(params, h, w, fps=30.0, assoc_scan=assoc_scan,
                    layout=layout)
    layout = eng.layout  # auto resolves per config
    # CHAIN each step's uint8 output into the next step's input: the
    # axon relay dedupes/elides repeated identical executions (a 480p
    # config measured 1.1M fake fps with static inputs, r3), and
    # chaining makes every dispatch unique AND serialized. The effect
    # chain is content-independent in FLOPs, and the serialization tax
    # measured ~1% vs independent steps at 4K. CAVEAT: even chained,
    # sub-~5ms steps (c1-class) still read physically impossible
    # numbers on this relay intermittently — only >=1080p configs time
    # reliably here; treat small-config rows as indicative only.
    #
    # SALT the initial frames with per-process entropy: the relay's
    # dedup cache is CROSS-PROCESS — a fixed seed makes the entire
    # chained run a replay of any earlier identical run (c3 "measured"
    # 1.12M fps on 2026-08-17 this way, ~1500x the honest number).
    # Unique starting content makes every chained step unique forever;
    # FLOPs are content-independent.
    # steps-per-call: n sequential chunks scanned inside ONE dispatch
    # (engine.jitted_multi_step) — amortizes the per-call dispatch
    # overhead this rig's relay charges (~0.1 ms/frame at n=1), exactly
    # as pipeline.py's steps_per_call batching does in production
    # (auto=8 at <=1080p there since r4; the default here matches).
    # Measured c3: spc ladder 878.3/890.3/906.6/912.5 at n=1/2/4/8
    # (2026-08-18); at the r4 state spc=8 measured +9.5 fps over 4, and
    # production auto now picks 8 at <=1080p (~1.6 GB host RAM held in
    # flight at B=32 — the pipeline keeps 4 above 1080p).
    spc = int(os.environ.get("PCRT_BENCH_SPC", "8"))
    salt = np.random.default_rng().integers(0, 256, (1, 1, 1, 3), dtype=np.uint8)
    staged = make_frames(spc * batch, h, w) ^ salt
    if layout == "planar":
        staged = np.ascontiguousarray(np.transpose(staged, (0, 3, 1, 2)))
    aux_np = eng.make_aux(np.arange(spc * batch))
    # STAGE first and force the transfers with a scalar fetch, timed
    # separately: the relay moves the spc*B input frames at single-digit
    # MB/s, and billing that into the "compile" figure is exactly the
    # r1->r4 "cold compile regressed 22.9 -> 479.6 s" mirage (round-5
    # decomposition, ROADMAP.md: compile is seconds; staging is minutes
    # and scales with spc)
    t0 = time.perf_counter()
    if spc > 1:
        staged = staged.reshape((spc, batch) + staged.shape[1:])
        aux = jax.tree.map(
            lambda a: jax.device_put(
                jnp.reshape(a, (spc, batch) + a.shape[1:])), aux_np)
        step = eng.jitted_multi_step()
    else:
        aux = jax.tree.map(jax.device_put, aux_np)
        step = eng.jitted_step()
    frames = jax.device_put(staged)
    np.asarray(frames[(0,) * frames.ndim])
    stage_s = time.perf_counter() - t0
    state = eng.init_state()
    first = jnp.zeros((1,), jnp.bool_)

    def sync(arr):
        # block_until_ready on this relay intermittently returns before
        # the work ran (measured 2026-08-17: c3 "1.12M fps", ~1500x the
        # honest number, even with unique inputs). A tiny host fetch
        # from the FINAL chained output cannot be satisfied without the
        # whole serialized chain executing: ~1 relay RTT (~30-60 ms) of
        # overhead per timed loop, amortized over iters.
        return np.asarray(arr[(0,) * (arr.ndim - 1)])

    t0 = time.perf_counter()
    out, _ = step(frames, aux, state, first, eng._c)
    sync(out)
    compile_s = time.perf_counter() - t0
    cur = out
    for _ in range(max(2, warmup)):
        cur, _ = step(cur, aux, state, first, eng._c)
    sync(cur)
    t0 = time.perf_counter()
    for _ in range(iters):
        cur, _ = step(cur, aux, state, first, eng._c)
    sync(cur)
    dt = time.perf_counter() - t0
    return spc * batch * iters / dt, compile_s, stage_s


def bench_oracle(params, h, w, n_frames):
    from pythoncrt_tpu import oracle

    p = params.clamped()
    frames = make_frames(n_frames, h, w)
    triad = oracle.triad_mask(h, w, p.triad_strength, p.triad_softness) if p.triad_on else None
    vig = oracle.vignette_mask(h, w, p.vignette_strength) if p.vignette_on else None
    noise = (
        np.random.default_rng(0).standard_normal(
            (max(1, h // p.grain_size), max(1, w // p.grain_size)), dtype=np.float32
        )
        if p.noise_on
        else None
    )
    # warmup (allocator/cache effects made the first frame ~2x noisier)
    oracle.apply_effects(
        frames[0], p, phase_px=0.0, time_sec=0.0,
        triad=triad, vignette=vig, noise_field=noise,
    )

    def one_pass():
        prev = None
        t0 = time.perf_counter()
        for i in range(n_frames):
            img = oracle.apply_effects(
                frames[i], p, phase_px=i * 1.25, time_sec=i / 30.0,
                triad=triad, vignette=vig, noise_field=noise,
            )
            img = oracle.persistence_blend(prev, img, p.persistence)
            prev = img
            oracle.ops.to_uint8(img)
        return n_frames / (time.perf_counter() - t0)

    # best of 2: this rig's host CPU intermittently degrades ~6x under
    # external load; the max is the machine's actual capability and the
    # conservative choice for the vs_baseline ratio
    return max(one_pass(), one_pass())


def bench_c5(quick=False, iters=3):
    """Config 5: multi-clip batch render through the clip-sharded engine
    (on however many chips are visible; 1 here).

    Round 5: the engine resolves layout="auto" (the c4 params resolve
    PLANAR — MultiClipEngine now inherits the in-place glitch + planar
    persist that won c4; PCRT_BENCH_LAYOUT=nhwc A/Bs the legacy
    interleaved layout), and the loop dispatches through process_stack's
    multi-chunk scan with the production auto steps-per-call
    (PCRT_BENCH_SPC_C5 overrides)."""
    import os

    import jax
    import jax.numpy as jnp

    from pythoncrt_tpu.engine import CRTEngine
    from pythoncrt_tpu.parallel import MultiClipEngine, make_mesh

    # 32 frames per step (4 clips x 8), matching bench_engine's batch:
    # the round-3 "c5 wrapper gap" (218 vs plain 311 fps) was a harness
    # artifact of stepping 16 frames while the plain engine stepped 32 —
    # at equal frames/step the clip-sharded wrapper measures FASTER
    # (340.0 vs 311, 2026-08-18: one persistence launch walks all clips)
    h, w, c, b = (540, 960, 2, 8) if quick else (2160, 3840, 4, 8)
    mesh = make_mesh(axis="clips")
    # clip count must be a multiple of the mesh size (the loop calls
    # _step/_mstep directly, bypassing process()'s divisibility check)
    ndev = mesh.devices.size
    c = -(-max(c, ndev) // ndev) * ndev
    layout = os.environ.get("PCRT_BENCH_LAYOUT", "auto")
    eng = CRTEngine(config_params("c4_temporal_1080p"), h, w, fps=30.0,
                    layout=layout)
    mc = MultiClipEngine(eng, mesh)
    # production auto steps-per-call (multiclip.process_videos):
    # ~spc * C * B frames in flight per dispatch under the same host-RAM
    # budget the pipeline uses
    spc = int(os.environ.get("PCRT_BENCH_SPC_C5", "0"))
    if spc <= 0:
        from pythoncrt_tpu.multiclip import auto_steps_per_call

        spc = auto_steps_per_call(h, w, c, b)
    # flat clip-major batch — the round-3 wrapper contract (no in-jit
    # reshapes around the Pallas calls)
    # per-process salt: defeat the relay's cross-process replay cache
    # (see bench_engine)
    salt = np.random.default_rng().integers(0, 256, (1, 1, 1, 3), dtype=np.uint8)
    staged = make_frames(spc * c * b, h, w) ^ salt
    if eng.layout == "planar":
        staged = np.ascontiguousarray(np.transpose(staged, (0, 3, 1, 2)))
    aux_np = eng.make_aux(np.tile(np.arange(spc * b).reshape(spc, 1, b),
                                  (1, c, 1)).reshape(-1))
    # pre-stage on device: this rig's relay has ~30 ms per-transfer
    # latency, which would otherwise dominate the loop
    states = jnp.zeros((c,) + eng.init_state().shape, jnp.float32)
    first = jnp.full((1,), True, jnp.bool_)
    later = jnp.full((1,), False, jnp.bool_)
    if spc > 1:
        clips = jax.device_put(
            staged.reshape((spc, c * b) + staged.shape[1:]))
        aux = jax.tree.map(
            lambda a: jax.device_put(
                jnp.reshape(a, (spc, c * b) + a.shape[1:])), aux_np)
        step = mc._mstep
        fetch = lambda o: np.asarray(o[0, 0, 0, 0])  # noqa: E731
    else:
        clips = jax.device_put(staged)
        aux = jax.tree.map(jax.device_put, aux_np)
        step = mc._step
        fetch = lambda o: np.asarray(o[0, 0, 0])  # noqa: E731
    # warmups sync via the same scalar fetch as the timed loop
    # (an earlier jit-sum readback + `del` of its executable right
    # before the timed region made the relay bill ~0.8 s of deferred
    # work INTO the loop: 14 fps where phase-instrumented runs measure
    # ~219 — see bench_engine.sync for why block_until_ready is out)
    out, st = step(clips, aux, states, first, eng._c)
    fetch(out)
    for _ in range(3):
        out, st = step(clips, aux, st, later, eng._c)
        fetch(out)
    # thread the state: each call consumes the previous call's carry, so
    # iterations serialize WITHOUT a per-iteration host readback
    t0 = time.perf_counter()
    for i in range(iters):
        out, st = step(clips, aux, st, later, eng._c)
    # scalar fetch from the final output: the threaded state serializes
    # the iterations (costs ~1 relay RTT, amortized over iters)
    fetch(out)
    return spc * c * b * iters / (time.perf_counter() - t0)


def device_time_fps(params, h, w, batch, steps=6):
    """fps derived from xprof DEVICE SELF-TIME over `steps` compiled
    steps — the cross-check for sub-~5ms configs whose wall timings the
    relay reads unreliably (bench_engine's CAVEAT; VERDICT r4 weak #3).
    Wall fps on this rig includes the ~0.1 ms/f relay dispatch floor;
    device fps is the chip's own busy time and transfers to real hosts.

    Returns (fps, total_device_ms) or (None, None) when the xprof
    tooling is unavailable."""
    import glob
    import json as _json
    import tempfile

    import jax
    import jax.numpy as jnp

    from pythoncrt_tpu.engine import CRTEngine

    try:
        from xprof.convert import raw_to_tool_data as r2t
    except Exception:
        return None, None

    eng = CRTEngine(params, h, w, fps=30.0, layout="auto")
    salt = np.random.default_rng().integers(0, 256, (1, 1, 1, 3),
                                            dtype=np.uint8)
    staged = make_frames(batch, h, w) ^ salt
    if eng.layout == "planar":
        staged = np.ascontiguousarray(np.transpose(staged, (0, 3, 1, 2)))
    aux = jax.tree.map(jax.device_put, eng.make_aux(np.arange(batch)))
    frames = jax.device_put(staged)
    state = eng.init_state()
    first = jnp.zeros((1,), jnp.bool_)
    step = eng.jitted_step()

    def sync(arr):
        return np.asarray(arr[(0,) * (arr.ndim - 1)])

    cur, _ = step(frames, aux, state, first, eng._c)
    sync(cur)
    cur, _ = step(cur, aux, state, first, eng._c)
    sync(cur)
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for _ in range(steps):
                cur, _ = step(cur, aux, state, first, eng._c)
            sync(cur)
        cands = sorted(glob.glob(f"{td}/**/*.xplane.pb", recursive=True))
        if not cands:
            return None, None
        try:
            data, _ = r2t.xspace_to_tool_data([cands[-1]],
                                              "framework_op_stats", {})
            if isinstance(data, bytes):
                data = data.decode()
            parsed = _json.loads(data)
        except Exception:
            return None, None
    total_us = 0.0
    tables = parsed if isinstance(parsed, list) else []
    for t in tables:
        if not (isinstance(t, dict) and "cols" in t):
            continue
        ids = [c.get("id") for c in t.get("cols", [])]
        st_col = next((i for i in ids if i and "self_time" in i
                       and "percent" not in i and "cumulative" not in i),
                      None)
        if st_col is None:
            continue
        for r in t.get("rows", []):
            cells = [c.get("v") if isinstance(c, dict) else None
                     for c in r.get("c", [])]
            vals = dict(zip(ids, cells))
            name = str(vals.get("operation") or vals.get("name") or "")
            if name.upper() == "IDLE":
                continue
            v = vals.get(st_col)
            if v is not None:
                total_us += float(v)
        if total_us:
            break
    if not total_us:
        return None, None
    return steps * batch / (total_us / 1e6), total_us / 1e3


def config_params(name):
    from pythoncrt_tpu.params import EffectParams

    if name == "c1_defaults_480p":  # scanlines + vignette only
        return EffectParams(
            scanline_strength=0.6, vignette_strength=0.25, triad_strength=0.0,
            aberration_px=0, bloom_strength=0.0, noise_strength=0.0,
            persistence=0.0, pixel_size=1, fast_bloom=False,
        )
    if name == "c2_retro_720p":  # scanlines + triad + aberration + noise
        return EffectParams(
            scanline_strength=0.6, triad_strength=0.35, aberration_px=2,
            noise_strength=4.0, vignette_strength=0.0, bloom_strength=0.0,
            persistence=0.0, pixel_size=1, fast_bloom=False,
        )
    if name == "c3_full_1080p":  # full stack: gaussian bloom, warp, flicker, grain, grade
        return EffectParams(
            scanline_strength=0.6, triad_strength=0.35, triad_softness=0.5,
            aberration_px=1, bloom_sigma=1.2, bloom_strength=0.25,
            fast_bloom=False, noise_strength=1.5, vignette_strength=0.25,
            persistence=0.0, pixel_size=2, grain_size=2, warp_strength=0.15,
            flicker_strength=0.2, flicker_hz=2.0, brightness=0.02,
            contrast=1.05, gamma=1.1, saturation=0.9, temperature=0.1,
        )
    if name == "c4_temporal_1080p":  # persistence + glitch + animated roll
        return EffectParams(
            scanline_strength=0.6, triad_strength=0.35, aberration_px=1,
            bloom_strength=0.25, fast_bloom=True, noise_strength=1.5,
            vignette_strength=0.25, persistence=0.6, pixel_size=1,
            glitch_amp_px=6, glitch_height_frac=0.3, scanline_speed_px_s=120.0,
        )
    raise KeyError(name)


def main():
    quick = "--quick" in sys.argv
    run_all = "--all" in sys.argv
    if quick:
        h, w, batch, iters, oracle_frames = 270, 480, 32, 10, 2
    else:
        h, w, batch, iters, oracle_frames = 1080, 1920, 32, 10, 4

    import jax

    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    p3 = config_params("c3_full_1080p")
    tpu_fps, compile_s, stage_s = bench_engine(p3, h, w, batch, iters)
    log(f"c3 full-stack {w}x{h}: {tpu_fps:.1f} fps "
        f"(stage {stage_s:.1f}s, compile+first {compile_s:.1f}s)")

    cpu_fps = bench_oracle(p3, h, w, oracle_frames)
    log(f"c3 CPU oracle {w}x{h}: {cpu_fps:.2f} fps (live)")
    if not quick:
        cpu_fps = max(cpu_fps, PINNED_CPU_BASELINE_FPS)
        log(f"c3 CPU baseline used: {cpu_fps:.2f} fps "
            f"(pinned reference {PINNED_CPU_BASELINE_FPS})")

    if run_all:
        # c4 at its NOMINAL size: (h, w) is already the quick stand-in
        # under --quick, and the branch below halves again
        sizes = {"c1_defaults_480p": (480, 640), "c2_retro_720p": (720, 1280),
                 "c4_temporal_1080p": (1080, 1920)}
        for name, (ch, cw) in sizes.items():
            if quick:
                ch, cw = ch // 2, cw // 2
            fps, cs, ss = bench_engine(config_params(name), ch, cw, batch, iters)
            pin = PINNED_CPU_BASELINE.get(name)
            vs = f", vs_baseline {fps / pin:.0f}x (ref {pin} fps)" \
                if pin and not quick else ""
            log(f"{name} {cw}x{ch}: {fps:.1f} fps (stage {ss:.1f}s, "
                f"compile+first {cs:.1f}s){vs}")
            if name in ("c1_defaults_480p", "c2_retro_720p") and not quick:
                # sub-~5ms steps read unreliable wall times on this
                # relay; record the xprof device-self-time fps alongside
                # (BASELINE.md carries both as (relay-wall, device) pairs)
                dfps, dms = device_time_fps(config_params(name), ch, cw,
                                            batch)
                if dfps:
                    log(f"{name} device-self-time: {dfps:.1f} fps "
                        f"({dms:.2f} ms over 6x{batch} frames)")
                else:
                    log(f"{name} device-self-time: unavailable "
                        "(xprof tooling missing)")
        log(f"c5 (multi-clip 4K): {bench_c5(quick):.1f} fps")

    print(json.dumps({
        "metric": f"1080p frames/sec/chip, full effect stack ({w}x{h})",
        "value": round(tpu_fps, 1),
        "unit": "fps",
        "vs_baseline": round(tpu_fps / max(cpu_fps, 1e-9), 1),
    }))


if __name__ == "__main__":
    main()
