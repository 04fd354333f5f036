#!/usr/bin/env python3
"""Min-merge a bench run into BENCH_BASELINE.json.

Usage: python3 tools/merge_bench_baseline.py [BENCH_SELF.json ...]

Each argument is a bench output file (the one-line JSON graft.Bench emits,
possibly wrapped in sbt's `[info] ` prefix or followed by trailing sbt
output). Every successful per-query time that beats the current recorded
best replaces it; new queries are added. Failed queries (-1.0) are ignored.

Guards (a poisoned baseline can never self-heal, the merge only lowers):
- a run whose "sf" doesn't match the baseline's recorded sf is refused —
  merging an sf0.01 smoke run would record ~10x-too-fast bests and make
  every future full run retry everything;
- a run covering less than 90% of the baseline's queries is refused
  (SPARK_GRAFT_BENCH_ONLY subset runs are not representative).

Writes BENCH_BASELINE.json in place and prints a summary. Run after a
clean idle-box bench so the retry thresholds track the binary's bests.
"""
import json
import sys
from pathlib import Path

BASELINE = Path(__file__).resolve().parent.parent / "BENCH_BASELINE.json"


def load_run(path):
    text = Path(path).read_text()
    start = text.find("{")
    if start < 0:
        raise SystemExit(f"{path}: no JSON object found (failed run?)")
    obj, _ = json.JSONDecoder().raw_decode(text[start:])
    return obj


def main():
    runs = sys.argv[1:] or ["BENCH_SELF.json"]
    base = json.loads(BASELINE.read_text())
    queries = base["queries"]
    cpu = base.get("cpu", {})
    base_sf = base.get("sf")
    if not base_sf:
        # same poison-guard as the run side: a baseline of unknown scale
        # (hand-edited / pre-"sf" vintage) must not silently accept merges
        # against an ASSUMED scale — re-record it with an "sf" field first
        raise SystemExit(
            f"{BASELINE}: baseline lacks 'sf' — refusing to merge against "
            "an assumed scale; add the field (e.g. \"sf\": "
            "\"/root/testdata/sf0.1\") after confirming what it was "
            "recorded at")
    # compare the SCALE token (path basename, e.g. "sf0.1"), not the
    # absolute path — the same-scale data mounted elsewhere is a valid
    # merge source; a missing "sf" in the run is still refused (unknown
    # scale could poison the baseline irreversibly)
    base_scale = Path(base_sf).name
    updated = added = 0
    for run_path in runs:
        run = load_run(run_path)
        run_sf = run.get("sf")
        run_scale = Path(run_sf).name if run_sf else None
        if run_scale != base_scale:
            raise SystemExit(
                f"{run_path}: scale mismatch ({run_scale!r} vs baseline "
                f"{base_scale!r}) — refusing to merge a different-scale run")
        run_queries = run.get("queries", {})
        if queries and len(run_queries) < 0.9 * len(queries):
            raise SystemExit(
                f"{run_path}: covers only {len(run_queries)}/{len(queries)} "
                "queries — refusing to merge a subset run")
        run_cpu = run.get("cpu", {})
        for name, secs in run_queries.items():
            if secs is None or secs < 0:
                continue
            if name not in queries:
                queries[name] = round(secs, 4)
                added += 1
            elif secs < queries[name]:
                queries[name] = round(secs, 4)
                updated += 1
        # CPU bests are min-merged independently of wall: CPU is the
        # load-invariant contract (co-tenant bursts stretch wall, not the
        # CPU our own work burns), so its best is meaningful on its own.
        # Runs predating the cpu field simply contribute nothing here.
        for name, csecs in run_cpu.items():
            if csecs is None or csecs < 0 or run_queries.get(name, -1) < 0:
                continue
            if name not in cpu or csecs < cpu[name]:
                cpu[name] = round(csecs, 4)
    base["sf"] = base_sf
    base["queries"] = dict(sorted(queries.items()))
    if cpu:
        base["cpu"] = dict(sorted(cpu.items()))
    BASELINE.write_text(json.dumps(base, indent=1) + "\n")
    total = sum(queries.values())
    cpu_total = sum(cpu.values())
    print(f"{updated} bests updated, {added} queries added, "
          f"{len(queries)} total, sum {total:.1f}s"
          + (f", cpu sum {cpu_total:.1f}s over {len(cpu)}" if cpu else ""))


if __name__ == "__main__":
    main()
