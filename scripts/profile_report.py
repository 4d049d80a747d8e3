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
    parsed = json.loads(data)

    table = []
    if parsed and isinstance(parsed, list) and isinstance(parsed[0], dict) \
            and "cols" in parsed[0]:
        # gviz DataTable list (xprof >= 2.x): pick the table whose cols
        # include a self-time column, map rows by column id
        for t in parsed:
            ids = [c.get("id") for c in t.get("cols", [])]
            if not any("self" in (i or "") for i in ids):
                continue
            for r in t.get("rows", []):
                # gviz encodes missing cells as null; rows may be short
                cells = [c.get("v") if isinstance(c, dict) else None
                         for c in r.get("c", [])]
                vals = dict(zip(ids, cells))
                st = next((vals.get(i) for i in ids if i and "self_time" in i
                           and "percent" not in i and "cumulative" not in i
                           and vals.get(i) is not None),
                          None)
                if st is None:
                    continue
                table.append({
                    "name": vals.get("operation") or vals.get("name", ""),
                    "category": vals.get("type")
                    or vals.get("category", ""),
                    "self": float(st),
                    "n": vals.get("occurrences", ""),
                })
            if table:
                break
    else:  # legacy flat-dict rows
        for r in parsed:
            if isinstance(r, dict) and ("selfTimeUs" in r
                                        or "self_time_us" in r):
                table.append({
                    "name": r.get("name") or r.get("opName", ""),
                    "category": r.get("category", ""),
                    "self": float(r.get("selfTimeUs",
                                        r.get("self_time_us", 0.0))),
                    "n": r.get("occurrences", ""),
                })
    if not table:
        print(json.dumps(parsed[:3], indent=2)[:4000])
        return
    table.sort(key=lambda r: -r["self"])
    tot = sum(r["self"] for r in table)
    print(f"total self time: {tot / 1e3:.3f} ms")
    for r in table[:top]:
        print(f"{r['self'] / 1e3:9.3f} ms {100 * r['self'] / max(tot, 1e-9):5.1f}%  "
              f"x{str(r['n']):>5s} {str(r['category'])[:14]:14s} "
              f"{str(r['name'])[:90]}")


if __name__ == "__main__":
    main()
