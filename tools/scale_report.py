#!/usr/bin/env python3
"""Build the sf1-vs-sf0.1 scale report (dev tool).

Usage: scale_report.py <bench_sf01.json> <bench_sf1.json> <out_md>

Reads two Bench artifacts (the single-line JSON the driver parses),
computes per-query time ratios, and writes a markdown table sorted by
ratio with a super-linear (> 15x for a 10x data step) call-out section.
"""
import json
import sys


def load(path):
    line = open(path).read()
    if "[info] " in line:
        line = line.split("[info] ", 1)[-1]
    return json.loads(line)


a = load(sys.argv[1])   # sf0.1
b = load(sys.argv[2])   # sf1
out = sys.argv[3]

rows = []
for q, t1 in sorted(b["queries"].items()):
    t0 = a["queries"].get(q)
    if t0 is None or t0 <= 0 or t1 <= 0:
        continue
    rows.append((q, t0, t1, t1 / t0))
rows.sort(key=lambda r: -r[3])

lines = [
    "# Scale-up evidence: sf1 vs sf0.1 (10x data)",
    "",
    f"Generated from `{sys.argv[1]}` (sf0.1) and `{sys.argv[2]}` (sf1),",
    "both min-of-3 on local[32]. sf1 data from `tools/gen_scale.py`",
    "(10 disjoint key universes; per-key densities preserved).",
    "",
    f"- sf0.1 total: {a['value']:.1f}s over {len(a['queries'])} queries,"
    f" failed={a['failed']}",
    f"- sf1 total: {b['value']:.1f}s over {len(b['queries'])} queries,"
    f" failed={b['failed']}",
    "",
    "A linear query costs <= 10x; shuffle/sort log factors and fixed",
    "per-query overheads (job launch, codegen) push small queries BELOW",
    "10x. Ratios > 15x are called out below the table.",
    "",
    "| query | sf0.1 s | sf1 s | ratio |",
    "| --- | --- | --- | --- |",
]
for q, t0, t1, r in rows:
    flag = " **>15x**" if r > 15 else ""
    lines.append(f"| {q}{flag} | {t0:.3f} | {t1:.3f} | {r:.1f}x |")

over = [(q, t0, t1, r) for q, t0, t1, r in rows if r > 15]
lines += ["", f"## Super-linear queries (> 15x): {len(over)}", ""]
if not over:
    lines.append("None.")
for q, t0, t1, r in over:
    lines.append(f"- `{q}`: {t0:.3f}s -> {t1:.3f}s ({r:.1f}x)")

open(out, "w").write("\n".join(lines) + "\n")
print(f"[scale-report] wrote {out}: {len(rows)} queries, {len(over)} over 15x")
