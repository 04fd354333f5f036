#!/usr/bin/env python3
"""Min-merge a bench run into BENCH_BASELINE.json.

Usage: python3 tools/merge_bench_baseline.py [BENCH_SELF.json ...]

Each argument is a bench output file (the one-line JSON graft.Bench emits,
possibly wrapped in sbt's `[info] ` prefix). Every successful per-query time
that beats the current recorded best replaces it; new queries are added.
Failed queries (-1.0) are ignored. Writes BENCH_BASELINE.json in place and
prints a summary. Run this after a clean idle-box bench so the retry
thresholds track the binary's true bests.
"""
import json
import sys
from pathlib import Path

BASELINE = Path(__file__).resolve().parent.parent / "BENCH_BASELINE.json"


def load_run(path):
    text = Path(path).read_text()
    return json.loads(text[text.index("{"):])["queries"]


def main():
    runs = sys.argv[1:] or ["BENCH_SELF.json"]
    base = json.loads(BASELINE.read_text())
    queries = base["queries"]
    updated = added = 0
    for run in runs:
        for name, secs in load_run(run).items():
            if secs is None or secs < 0:
                continue
            if name not in queries:
                queries[name] = round(secs, 4)
                added += 1
            elif secs < queries[name]:
                queries[name] = round(secs, 4)
                updated += 1
    base["queries"] = dict(sorted(queries.items()))
    BASELINE.write_text(json.dumps(base, indent=1) + "\n")
    total = sum(queries.values())
    print(f"{updated} bests updated, {added} queries added, "
          f"{len(queries)} total, sum {total:.1f}s")


if __name__ == "__main__":
    main()
