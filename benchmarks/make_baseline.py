#!/usr/bin/env python
"""Regenerate the measured section of BASELINE.md from results_r*.json.

BASELINE.md's prose header (reference provenance) is hand-written; every
measured number lives between the GENERATED markers and is emitted by this
script from the newest ``benchmarks/results_r*.json`` — so the tables can
never drift from the data (the round-1 failure mode).

Usage: python benchmarks/make_baseline.py [results.json]
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
BASELINE = os.path.join(HERE, "..", "BASELINE.md")
BEGIN = "<!-- BEGIN GENERATED RESULTS (benchmarks/make_baseline.py) -->"
END = "<!-- END GENERATED RESULTS -->"


def newest_results() -> str:
    paths = sorted(glob.glob(os.path.join(HERE, "results_r*.json")))
    if not paths:
        raise SystemExit("no benchmarks/results_r*.json found")
    return paths[-1]


def fmt_ms(v: float) -> str:
    return f"{v*1e3:.1f} µs" if v < 1 else f"{v:.2f} ms"


def generate(path: str) -> str:
    rows = json.load(open(path))
    src = os.path.basename(path)
    by_group: dict[str, list] = {}
    for r in rows:
        if r.get("unreliable"):
            continue  # noise must not ship next to real numbers
        group = r["name"].split("/")[0]
        by_group.setdefault(group, []).append(r)
    out = [BEGIN, "",
           f"*(generated from `benchmarks/{src}` — do not edit by hand; "
           "run `python benchmarks/make_baseline.py`)*", ""]
    for group, rs in by_group.items():
        out.append(f"### {group}")
        out.append("")
        out.append("| path | shape | min | Gnnz/s | SoL% | check |")
        out.append("|---|---|---|---|---|---|")
        for r in rs:
            sol = (f"{100*r['sol_frac']:.1f}%" if r.get("sol_frac")
                   is not None else "—")
            chk = {True: "ok", False: "FAIL", None: "—"}[r.get("checked")]
            extra = ""
            if r.get("extras", {}).get("vs_baseline"):
                extra = f" ({r['extras']['vs_baseline']:.0f}× ref)"
            bw = r.get("extras", {}).get("bw_util")
            shape = r["shape"] + (f",bw={100*bw:.0f}%" if bw else "")
            r = dict(r, shape=shape)
            if r.get("extras", {}).get("modeled"):
                # model outputs must not typeset like measurements: tag
                # the row itself, not just the surrounding prose
                out.append(
                    f"| {r['name']} | {r['shape']} | "
                    f"{fmt_ms(r['min_ms'])} (MODEL){extra} "
                    f"| {r['gnnz_per_s']:.2f} (MODEL) | {sol} | {chk} |")
                continue
            out.append(
                f"| {r['name']} | {r['shape']} | {fmt_ms(r['min_ms'])}{extra} "
                f"| {r['gnnz_per_s']:.2f} | {sol} | {chk} |")
        out.append("")
        # time-to-tolerance table for solver groups (the number that
        # decides whether preconditioning wins end-to-end)
        tol_rows = [r for r in rs
                    if r.get("extras", {}).get("ms_to_tol") is not None]
        if tol_rows:
            out.append("| path | per-iter | iters→tol | **ms to tol** | "
                       "true ‖r‖/‖b‖ | setup s | solves to amortize |")
            out.append("|---|---|---|---|---|---|---|")
            for r in tol_rows:
                e = r["extras"]
                amort = e.get("solves_to_amortize")
                amort_s = ("—" if amort is None
                           else "∞ (no per-solve win)"
                           if amort == float("inf") else f"{amort:g}")
                out.append(
                    f"| {r['name']} | {e['per_iter_ms']*1e3:.1f} µs | "
                    f"{e['iters_to_tol']} | **{e['ms_to_tol']:.2f}** | "
                    f"{e.get('true_rel_residual', float('nan')):.1e} | "
                    f"{e.get('pack_seconds', 0):.2f} | {amort_s} |")
            out.append("")
    out.append(END)
    return "\n".join(out)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else newest_results()
    block = generate(path)
    text = open(BASELINE).read()
    if BEGIN in text:
        pat = re.compile(re.escape(BEGIN) + ".*?" + re.escape(END), re.S)
        text = pat.sub(lambda _: block, text)
    else:
        text = text.rstrip() + "\n\n## Measured results\n\n" + block + "\n"
    open(BASELINE, "w").write(text)
    print(f"BASELINE.md regenerated from {os.path.basename(path)}")


if __name__ == "__main__":
    main()
