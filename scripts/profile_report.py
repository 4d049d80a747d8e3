"""Summarize an xprof trace (from profile_c3.py) as a per-HLO-op cost
table: self-time, category, and occurrence count — the ground truth for
where the engine step's device time goes.

Usage: python scripts/profile_report.py /tmp/xprof_c3 [--top 40]
"""

from __future__ import annotations

import glob
import json
import sys


def find_xplane(root: str) -> str:
    cands = sorted(glob.glob(f"{root}/**/*.xplane.pb", recursive=True))
    if not cands:
        raise SystemExit(f"no .xplane.pb under {root}")
    return cands[-1]


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xprof_c3"
    top = 40
    for i, a in enumerate(sys.argv):
        if a == "--top":
            top = int(sys.argv[i + 1])
    path = find_xplane(root)
    print(f"xplane: {path}", file=sys.stderr)

    from xprof.convert import raw_to_tool_data as r2t

    data, _ = r2t.xspace_to_tool_data([path], "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    rows = json.loads(data)
    # rows: list of dicts (first entries may carry metadata); normalize
    table = [r for r in rows if isinstance(r, dict) and "selfTimeUs" in r
             or isinstance(r, dict) and "self_time_us" in r]
    if not table:
        # fall back: dump whatever structure came back
        print(json.dumps(rows[:3], indent=2)[:4000])
        return
    key = "selfTimeUs" if "selfTimeUs" in table[0] else "self_time_us"
    name_k = "name" if "name" in table[0] else "opName"
    table.sort(key=lambda r: -float(r.get(key, 0.0)))
    tot = sum(float(r.get(key, 0.0)) for r in table)
    print(f"total self time: {tot / 1e3:.3f} ms")
    for r in table[:top]:
        t = float(r.get(key, 0.0))
        print(f"{t / 1e3:9.3f} ms {100 * t / max(tot, 1e-9):5.1f}%  "
              f"{str(r.get('category', ''))[:18]:18s} "
              f"{str(r.get(name_k, ''))[:90]}")


if __name__ == "__main__":
    main()
