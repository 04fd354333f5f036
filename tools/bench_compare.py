#!/usr/bin/env python3
"""Classify a bench run's drift vs BENCH_BASELINE.json using the CPU contract.

Usage: python3 tools/bench_compare.py [BENCH_SELF.json] [--wall-x=2.0] [--cpu-x=1.3]
       (the two-token form `--wall-x 2.0` is also accepted)

The shared box's co-tenant bursts stretch WALL while leaving (or slightly
shrinking) the CPU our own work burns (SCALE.md §round 16: wall 2.01x under
a synthetic 32-spinner burst, CPU composite 0.82x). A real regression
inflates both. So each gate whose wall exceeds `--wall-x` times its
recorded best is classified by its CPU reading:

  REGRESSION  wall over threshold AND cpu > --cpu-x times its cpu best
              (the work itself got more expensive — investigate)
  LOAD        wall over threshold but cpu within the cpu threshold
              (the box was busy — ignore, or re-run idle and min-merge)
  NO-CPU-REF  wall over threshold, no cpu best recorded yet (pre-contract
              baseline entry) — wall-only signal, treat as LOAD unless it
              repeats on an idle box

Exit code: 1 if any REGRESSION, else 0. Prints composites first.
"""
import json
import signal
import sys
from pathlib import Path

# tolerate `| head` consumers
try:
    signal.signal(signal.SIGPIPE, signal.SIG_DFL)
except (AttributeError, ValueError):
    pass

BASELINE = Path(__file__).resolve().parent.parent / "BENCH_BASELINE.json"


def load_run(path):
    text = Path(path).read_text()
    start = text.find("{")
    if start < 0:
        raise SystemExit(f"{path}: no JSON object found")
    obj, _ = json.JSONDecoder().raw_decode(text[start:])
    return obj


def main():
    # accept both --name=value and the two-token --name value form
    argv, flags, args = sys.argv[1:], {}, []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--"):
            if "=" in a:
                name, val = a[2:].split("=", 1)
            elif i + 1 < len(argv):
                name, val = a[2:], argv[i + 1]
                i += 1
            else:
                raise SystemExit(f"{a}: missing value")
            flags[name] = float(val)
        else:
            args.append(a)
        i += 1
    def flag(name, default):
        return flags.get(name, default)
    wall_x = flag("wall-x", 2.0)
    cpu_x = flag("cpu-x", 1.3)
    run = load_run(args[0] if args else "BENCH_SELF.json")
    base = json.loads(BASELINE.read_text())
    bests, cpu_bests = base["queries"], base.get("cpu", {})
    walls, cpus = run.get("queries", {}), run.get("cpu", {})
    common = [k for k, w in walls.items() if w is not None and w >= 0 and k in bests]
    if not common:
        raise SystemExit("no overlapping successful gates to compare")
    # the CPU contract's validity regime: under MODERATE external load CPU
    # holds while wall stretches (SCALE.md round 16 probe), but once the
    # box SATURATES (runnable threads well past the cores — observed at
    # load1 ~9 with our own 32 threads) context-switch/cache thrash
    # inflates CPU too (run 4 of round 16: untouched gates at 1.8-5.8x CPU
    # that reproduced their bests on the same binary in calmer runs).
    # Flag that regime instead of emitting confident REGRESSION verdicts.
    run_load = max(run.get("load1_before", 0.0), run.get("load1_after", 0.0))
    saturated = run_load > 4.0
    if saturated:
        print(f"WARNING: run saw load1 up to {run_load:.1f} — burst-saturated; "
              "CPU inflates under saturation, so REGRESSION flags below are "
              "tentative (re-run on a calmer box before acting)")
    wall_comp = sum(walls[k] / bests[k] for k in common) / len(common)
    cpu_common = [k for k in common
                  if cpus.get(k, -1) >= 0 and cpu_bests.get(k, -1) > 0]
    cpu_comp = (sum(cpus[k] / cpu_bests[k] for k in cpu_common) / len(cpu_common)
                if cpu_common else float("nan"))
    print(f"gates: {len(common)}  wall composite {wall_comp:.2f}x  "
          f"cpu composite {cpu_comp:.2f}x (over {len(cpu_common)})")
    regressions = []
    for k in sorted(common, key=lambda k: -walls[k]):
        if walls[k] <= wall_x * bests[k] + 0.2:
            continue
        cb, c = cpu_bests.get(k, -1), cpus.get(k, -1)
        if cb > 0 and c >= 0:
            if c > cpu_x * cb:
                cls = "REGRESSION?" if saturated else "REGRESSION"
                if not saturated:
                    regressions.append(k)
            else:
                cls = "LOAD"
            print(f"{cls:10s} {k}: wall {walls[k]:.2f}s vs best {bests[k]:.2f}s "
                  f"({walls[k]/bests[k]:.1f}x), cpu {c:.2f}s vs best {cb:.2f}s "
                  f"({c/cb:.1f}x)")
        else:
            print(f"{'NO-CPU-REF':10s} {k}: wall {walls[k]:.2f}s vs best "
                  f"{bests[k]:.2f}s ({walls[k]/bests[k]:.1f}x)")
    if not regressions:
        print("verdict: no CPU-confirmed regressions")
    else:
        print(f"verdict: {len(regressions)} CPU-confirmed regression(s): "
              + ", ".join(regressions))
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
