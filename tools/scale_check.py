#!/usr/bin/env python
"""Scale-factor escalation check (VERDICT r5 item 4).

Runs the headline bench query battery (bench.py with
SPARK_GRAFT_QUERIES_ONLY=1, one subprocess per scale so each run gets
a fresh JVM and input-sized scan partitions) at sf0.1 (driver data)
and the replicated sf1 / sf10 dirs produced by tools/scale_data.py,
then asserts no query grows WORSE than linearly in the data volume.

Linearity gate: for each adjacent pair (sf_a → sf_b, volume ×F),
    warm(b) <= warm(a) * F * SLACK + FLOOR
FLOOR absorbs the fixed per-query cost (plan build + task floors)
that dominates sub-second rows at toy scale — without it a 0.2 s
query that stays 0.2 s at ×10 would trivially pass, but one that
goes 0.2 → 0.9 s (still pure overhead movement) would flake. A
super-linear operator (e.g. an accidental O(n²) join) blows through
FLOOR immediately at ×10 and ×100.

Usage: python tools/scale_check.py [out_json]
Prints a markdown table (for README) and ONE final JSON line; exits
non-zero if any query is super-linear.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SLACK = 2.0     # local[32] noise: GC, JIT, shuffle-partition fit
FLOOR = 1.5     # seconds of fixed cost absorbed per query

SCALES = [
    ("sf0.1", "/root/testdata/sf0.1", 1),
    ("sf1", str(REPO / ".scaledata" / "sf1"), 10),
    ("sf10", str(REPO / ".scaledata" / "sf10"), 100),
]


def run_battery(sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_QUERIES_ONLY="1",
               SPARK_GRAFT_SF_DIR=sf_dir)
    p = subprocess.run([sys.executable, str(REPO / "bench.py")],
                       capture_output=True, text=True, env=env,
                       cwd=str(REPO), timeout=7200)
    if p.returncode != 0:
        raise RuntimeError(
            f"bench at {sf_dir} rc={p.returncode}: {p.stderr[-800:]}")
    # compact summary is the LAST stdout line; detail is the first
    lines = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
    return json.loads(lines[0])


def main() -> None:
    results: dict[str, dict] = {}
    for name, path, _ in SCALES:
        if not Path(path).exists():
            print(f"SKIP {name}: {path} missing "
                  "(run tools/scale_data.py first)", file=sys.stderr)
            continue
        results[name] = run_battery(path)
        print(f"# {name}: total {results[name]['value']}s",
              file=sys.stderr)

    ran = [(n, p, v) for n, p, v in SCALES if n in results]
    if not ran:
        print(json.dumps({"metric": "scale_check", "scales": {},
                          "violations": ["no scale dirs found — run "
                                         "tools/scale_data.py first"]}))
        sys.exit(1)
    queries = sorted(results[ran[0][0]]["queries"])
    viol: list[str] = []
    rows = []
    for q in queries:
        row = {"query": q}
        for name, _, _ in ran:
            row[name] = results[name]["queries"].get(q)
        for (a, _, va), (b, _, vb) in zip(ran, ran[1:]):
            ta, tb = row.get(a), row.get(b)
            if ta is None or tb is None:
                continue
            factor = vb / va
            bound = ta * factor * SLACK + FLOOR
            row[f"ratio:{a}->{b}"] = round(tb / ta, 2)
            if tb > bound:
                viol.append(f"{q}: {a}={ta}s -> {b}={tb}s "
                            f"(bound {bound:.2f}s at x{factor:g})")
        rows.append(row)

    # markdown table for README
    hdr = ["query"] + [n for n, _, _ in ran] + [
        f"{a}→{b} (×{vb // va} data)"
        for (a, _, va), (b, _, vb) in zip(ran, ran[1:])]
    print("| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))
    for row in rows:
        cells = [row["query"]] + [
            f"{row.get(n, float('nan')):.2f}" for n, _, _ in ran] + [
            str(row.get(f"ratio:{a}->{b}", ""))
            for (a, _, _), (b, _, _) in zip(ran, ran[1:])]
        print("| " + " | ".join(cells) + " |")
    for (a, _, _), (b, _, _) in zip(ran, ran[1:]):
        print(f"| total | " + " | ".join(
            f"{results[n]['value']:.2f}" for n, _, _ in ran) + " |",
            file=sys.stderr)
        break

    out = {"metric": "scale_check",
           "scales": {n: results[n]["value"] for n, _, _ in ran},
           "violations": viol}
    if len(sys.argv) > 1:
        Path(sys.argv[1]).write_text(json.dumps(
            {"summary": out, "detail": results, "rows": rows},
            indent=1))
    print(json.dumps(out))
    if viol:
        print("SUPER-LINEAR:", *viol, sep="\n  ", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
