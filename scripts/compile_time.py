"""Cold-compile latency decomposition (VERDICT r4 weak #2).

The c3 engine's cold compile regressed 22.9s (r1) -> 479.6s (r4)
(BENCH_r0*.json tails). This script measures WHERE the time goes, one
variant per process invocation (jit caches are per-process; the
persistent compilation cache is disabled for the measurement), printing
one JSON line:

  python scripts/compile_time.py VARIANT

Variants toggle one suspect each against the c3 spc-8 baseline:

  c3_spc8        the bench.py headline program (baseline)
  c3_spc1        no multi-step scan wrapper
  c3_warp1       single warp window-row class (PCRT_WARP_LADDER="")
  c3_nowarp      warp_strength=0 (no warp kernel at all)
  c3_bloomxla    gaussian bloom via XLA (PCRT_NO_BLOOM3=1)
  c3_pallasoff   whole step on XLA (pallas="off")
  c3_fast        --precision fast
  c1_spc8        the small c1 program (relay/fixed-floor reference)
  c4_spc8        the temporal config (glitch+persist kernels)

Phases timed separately: engine construction (mask/table builds),
jaxpr trace+lower (host-side), and backend compile (XLA+Mosaic on the
relay server). The split tells whether the regression is our program
(lower), the backend (compile), or the tunnel.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("PCRT_NO_COMPILE_CACHE", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    variant = sys.argv[1] if len(sys.argv) > 1 else "c3_spc8"
    h, w, batch = 1080, 1920, 32
    spc = 8
    cfg = "c3_full_1080p"
    kw = {}
    if variant == "c3_spc1":
        spc = 1
    elif variant == "c3_warp1":
        os.environ["PCRT_WARP_LADDER"] = ""
    elif variant == "c3_nowarp":
        pass  # params tweak below
    elif variant == "c3_bloomxla":
        os.environ["PCRT_NO_BLOOM3"] = "1"
    elif variant == "c3_pallasoff":
        kw["pallas"] = "off"
    elif variant == "c3_fast":
        kw["precision"] = "fast"
    elif variant == "c1_spc8":
        cfg, h, w = "c1_defaults_480p", 480, 640
    elif variant == "c4_spc8":
        cfg = "c4_temporal_1080p"
    elif variant != "c3_spc8":
        raise SystemExit(f"unknown variant {variant}")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import config_params, make_frames
    from pythoncrt_tpu.engine import CRTEngine

    params = config_params(cfg)
    if variant == "c3_nowarp":
        import dataclasses

        params = dataclasses.replace(params, warp_strength=0.0)

    t0 = time.perf_counter()
    eng = CRTEngine(params, h, w, fps=30.0, layout="auto", **kw)
    t_construct = time.perf_counter() - t0

    frames = make_frames(spc * batch, h, w)
    if eng.layout == "planar":
        frames = np.ascontiguousarray(np.transpose(frames, (0, 3, 1, 2)))
    aux = eng.make_aux(np.arange(spc * batch))
    state = eng.init_state()
    first = jnp.zeros((1,), jnp.bool_)
    if spc > 1:
        frames = frames.reshape((spc, batch) + frames.shape[1:])
        aux = jax.tree.map(
            lambda a: jnp.reshape(a, (spc, batch) + a.shape[1:]), aux)
        fn = eng._multi_step
    else:
        fn = eng._step

    # stage inputs FIRST and force the transfers with a scalar fetch:
    # bench.py's historical "compile" figure timed first-call-to-sync,
    # which conflates host->device staging through the relay (~spc*B
    # frames) with compilation. Splitting it out is the point.
    t0 = time.perf_counter()
    staged = jax.device_put(frames)
    auxd = jax.tree.map(jax.device_put, aux)
    np.asarray(staged[(0,) * (staged.ndim - 1)])
    t_stage = time.perf_counter() - t0
    staged_mb = frames.size / 1e6

    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    lowered = jfn.lower(staged, auxd, state, first, eng._c)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = compiled(staged, auxd, state, first, eng._c)
    out0 = out[0] if isinstance(out, (tuple, list)) else out
    np.asarray(out0[(0,) * (out0.ndim - 1)])
    t_first_run = time.perf_counter() - t0
    # second run: the warm step cost, to isolate any lazy backend work
    # billed into the first execution
    t0 = time.perf_counter()
    out = compiled(staged, auxd, state, first, eng._c)
    out0 = out[0] if isinstance(out, (tuple, list)) else out
    np.asarray(out0[(0,) * (out0.ndim - 1)])
    t_second_run = time.perf_counter() - t0

    try:
        cost = compiled.cost_analysis()
        flops = cost.get("flops") if isinstance(cost, dict) else None
    except Exception:
        flops = None

    print(json.dumps({
        "variant": variant,
        "backend": jax.default_backend(),
        "construct_s": round(t_construct, 2),
        "stage_s": round(t_stage, 2),
        "staged_mb": round(staged_mb, 1),
        "lower_s": round(t_lower, 2),
        "compile_s": round(t_compile, 2),
        "first_run_s": round(t_first_run, 2),
        "second_run_s": round(t_second_run, 2),
        "total_s": round(t_construct + t_stage + t_lower + t_compile
                         + t_first_run, 2),
        "layout": eng.layout,
        "spc": spc,
        "flops": flops,
    }))


if __name__ == "__main__":
    main()
