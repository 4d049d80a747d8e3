"""AOT-compile the sharded render step against an UNATTACHED v5e-8
topology (VERDICT r4 item 5).

The 8-device virtual CPU mesh validates the shard_map program's math
and SPMD partitioning, but CPU collectives lower to a different backend
path than TPU ICI — this script asks the real TPU compiler to lower the
ppermute persistence prefix-scan + Pallas kernels for an actual 8-chip
v5e mesh, without needing 8 chips attached
(jax.experimental.topologies + compile-only AOT).

Prints one JSON line per phase; the recorded outcome (success or the
exact refusal) lives in docs/ARCHITECTURE.md. Run on the TPU rig:

  python scripts/aot_topology.py [--accel v5e-8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def get_topology(accel: str):
    """Try the known spellings for a v5e-8 topology descriptor.
    jax's get_topology_desc takes the topology NAME as its first
    positional (regex ^name[:=_]NxM...$); v5e names use the 'v5e:AxB'
    form with chips_per_host_bounds describing the host shape."""
    from jax.experimental import topologies

    attempts = [
        ("v5e:2x4", {}),
        ("v5e:1x8", {}),
        ("v5litepod:2x4", {}),
        ("v5e:2x4", {"chips_per_host_bounds": "2,4,1"}),
        (accel, {}),
    ]
    errs = []
    for name, kw in attempts:
        try:
            topo = topologies.get_topology_desc(name, "tpu", **kw)
            return topo, {"topology_name": name, **kw}, errs
        except Exception as e:
            errs.append({"topology_name": name, **kw,
                         "error": f"{type(e).__name__}: {e}"})
    return None, None, errs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--accel", default="v5e-8")
    ap.add_argument("--ndev", type=int, default=8)
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    out = {"accel": a.accel, "backend": None, "topology": None,
           "lowered": False, "compiled": False, "errors": []}
    try:
        out["backend"] = jax.default_backend()
    except Exception as e:
        out["errors"].append(f"backend init: {e}")

    topo, kw, errs = get_topology(a.accel)
    out["topology_attempts"] = errs
    if topo is None:
        out["errors"].append("no topology descriptor obtained")
        print(json.dumps(out))
        return
    out["topology"] = {"kwargs": kw, "n_devices": len(topo.devices)}

    # The sharded step over the TOPOLOGY mesh (not the attached devices)
    from __graft_entry__ import FULL_STACK
    from pythoncrt_tpu.engine import CRTEngine
    from pythoncrt_tpu.parallel import FRAME_AXIS, ShardedCRTEngine

    ndev = min(a.ndev, len(topo.devices))
    mesh = Mesh(np.array(topo.devices[:ndev]), (FRAME_AXIS,))
    h, w, b = 128, 256, 2 * ndev  # multiples that keep Pallas kernels on
    eng = CRTEngine(FULL_STACK, h, w, fps=24.0)
    sharded = ShardedCRTEngine(eng, mesh)

    # Abstract args with shardings attached (no data: compile-only AOT)
    def sds(shape, dtype, spec):
        return jax.ShapeDtypeStruct(
            shape, dtype, sharding=NamedSharding(mesh, spec))

    aux_np = eng.make_aux(np.arange(b))
    frames = sds((b, h, w, 3), np.uint8, P(FRAME_AXIS))
    aux = jax.tree.map(
        lambda arr: sds(arr.shape, arr.dtype, P(FRAME_AXIS)), aux_np)
    state = sds((h, w, 3), np.float32, P())
    first = sds((1,), np.bool_, P())
    consts = jax.tree.map(
        lambda arr: sds(jnp.shape(arr), jnp.result_type(arr), P()), eng._c)

    try:
        lowered = sharded._step.lower(frames, aux, state, first, consts)
        out["lowered"] = True
        # count the collectives in the stablehlo as a sanity signal
        txt = lowered.as_text()
        out["collectives"] = {
            "collective_permute": txt.count("collective_permute"),
            "all_reduce": txt.count("all_reduce"),
            "all_gather": txt.count("all_gather"),
            "custom_call(mosaic)": txt.count("tpu_custom_call"),
        }
    except Exception as e:
        out["errors"].append(f"lower: {type(e).__name__}: {e}")
        print(json.dumps(out))
        return

    try:
        compiled = lowered.compile()
        out["compiled"] = True
        try:
            mem = compiled.memory_analysis()
            out["memory"] = {
                "argument_size_bytes": getattr(mem, "argument_size_in_bytes", None),
                "output_size_bytes": getattr(mem, "output_size_in_bytes", None),
                "temp_size_bytes": getattr(mem, "temp_size_in_bytes", None),
            }
        except Exception:
            pass
    except Exception as e:
        out["errors"].append(f"compile: {type(e).__name__}: {e}")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
