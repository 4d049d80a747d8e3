"""Capture an xprof trace of the c3/c4 engine step on the real TPU.

Round-2 left one unexplained perf item (VERDICT r2 weak #2): the
gaussian-bloom budget (XLA 0.654 ms/f; the bloom2 Pallas kernel 0.82
vs ~0.2 theoretical). This grabs ground truth: per-fusion device times
for the full engine step, so optimization targets the measured cost
structure instead of more blind kernel variants.

Usage: python scripts/profile_c3.py [c3|c4|c5] [--dir /tmp/xprof_c3]
Then:  python scripts/profile_report.py /tmp/xprof_c3

c5 profiles the multi-clip 4K step (MultiClipEngine._step, 4 clips x 8
frames — bench.py bench_c5's exact harness shapes).
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import config_params, make_frames  # noqa: E402


def main() -> None:
    cfg = "c3"
    out_dir = None
    for i, a in enumerate(sys.argv):
        if a in ("c3", "c4", "c5"):
            cfg = a
        if a == "--dir":
            out_dir = sys.argv[i + 1]
    out_dir = out_dir or f"/tmp/xprof_{cfg}"

    import jax
    import jax.numpy as jnp

    from pythoncrt_tpu.engine import CRTEngine

    if cfg == "c5":
        return profile_c5(out_dir)

    h, w, batch = 1080, 1920, 32
    name = "c3_full_1080p" if cfg == "c3" else "c4_temporal_1080p"
    # layout=auto mirrors the shipping pipeline (planar gbrp feed where
    # the config qualifies)
    eng = CRTEngine(config_params(name), h, w, fps=30.0, layout="auto")

    def stage(arr):
        if eng.layout == "planar":
            arr = np.ascontiguousarray(np.transpose(arr, (0, 3, 1, 2)))
        return jax.device_put(arr)

    frames = stage(make_frames(batch, h, w))
    frames2 = stage(make_frames(batch, h, w, seed=1))
    aux = jax.tree.map(jax.device_put, eng.make_aux(np.arange(batch)))
    state = eng.init_state()
    first = jnp.zeros((1,), jnp.bool_)
    step = eng.jitted_step()

    t0 = time.perf_counter()
    out, st = step(frames, aux, state, first, eng._c)
    out.block_until_ready()
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    for _ in range(3):  # warm
        out, st = step(frames2, aux, st, first, eng._c)
    out.block_until_ready()

    with jax.profiler.trace(out_dir):
        for i in range(6):
            out, st = step(frames if i % 2 else frames2, aux, st, first, eng._c)
        out.block_until_ready()
    t0 = time.perf_counter()
    for i in range(6):
        out, st = step(frames if i % 2 else frames2, aux, st, first, eng._c)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"steady-state (untraced): {6 * batch / dt:.1f} fps "
          f"({1000 * dt / (6 * batch):.3f} ms/f)", flush=True)
    print(f"trace written to {out_dir}", flush=True)


def profile_c5(out_dir: str) -> None:
    """Trace the multi-clip 4K step — bench.py bench_c5's harness
    (4 clips x 8 frames/step, c4 params at 2160x3840, per-clip carries
    + the flat clip-major batch contract)."""
    import jax
    import jax.numpy as jnp

    from pythoncrt_tpu.engine import CRTEngine
    from pythoncrt_tpu.parallel import MultiClipEngine, make_mesh

    h, w, c, b = 2160, 3840, 4, 8
    mesh = make_mesh(axis="clips")
    c = max(c, mesh.devices.size)
    eng = CRTEngine(config_params("c4_temporal_1080p"), h, w, fps=30.0)
    mc = MultiClipEngine(eng, mesh)
    salt = np.random.default_rng().integers(0, 256, (1, 1, 1, 3),
                                            dtype=np.uint8)
    clips = jax.device_put(make_frames(c * b, h, w) ^ salt)
    clips2 = jax.device_put(make_frames(c * b, h, w, seed=1) ^ salt)
    aux = jax.tree.map(jax.device_put,
                       eng.make_aux(np.tile(np.arange(b), c)))
    states = jnp.zeros((c, h, w, 3), jnp.float32)
    first = jnp.full((1,), True, jnp.bool_)
    later = jnp.full((1,), False, jnp.bool_)

    t0 = time.perf_counter()
    out, st = mc._step(clips, aux, states, first, eng._c)
    np.asarray(out[0, 0, 0])
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    for i in range(3):
        out, st = mc._step(clips2 if i % 2 else clips, aux, st, later,
                           eng._c)
    np.asarray(out[0, 0, 0])

    with jax.profiler.trace(out_dir):
        for i in range(6):
            out, st = mc._step(clips if i % 2 else clips2, aux, st,
                               later, eng._c)
        np.asarray(out[0, 0, 0])
    t0 = time.perf_counter()
    for i in range(6):
        out, st = mc._step(clips if i % 2 else clips2, aux, st, later,
                           eng._c)
    np.asarray(out[0, 0, 0])
    dt = time.perf_counter() - t0
    n = 6 * c * b
    print(f"steady-state (untraced): {n / dt:.1f} fps "
          f"({1000 * dt / n:.3f} ms/f)", flush=True)
    print(f"trace written to {out_dir}", flush=True)


if __name__ == "__main__":
    main()
