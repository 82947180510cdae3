#!/usr/bin/env python3
"""Record per-query floors from a median-of-N warm bench run.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_WARM_REPS=3 sbt -batch "runMain graft.Bench"
  python3 tools/make_floors.py BENCH_full.json FLOORS_local.json

Methodology (VERDICT r9 item 7): the old BASELINE_local.json floors were
all-time minima mixed across quiet and contended boxes, so a query whose
lucky floor was 0.28 s but whose stable warm is ~1.9 s tripped the 2x
regression flag every round. Floors are now the median-of-3 warm time on
the gate box, re-recorded per round — a 2x excursion against THAT is a
real regression signal.
"""
import json
import sys


def main() -> None:
    bench_f = sys.argv[1] if len(sys.argv) > 1 else "BENCH_full.json"
    out_f = sys.argv[2] if len(sys.argv) > 2 else "FLOORS_local.json"
    bench = json.load(open(bench_f))
    warm = bench.get("warm_queries")
    if not warm:
        sys.exit(f"{bench_f} has no warm_queries — run Bench with warm on")
    floors = {
        "cpus": 32,
        "note": ("per-query median-of-3 warm seconds on the gate box "
                 "(tools/make_floors.py); re-recorded per round"),
        "sf": bench.get("sf"),
        "queries": dict(sorted(warm.items())),
    }
    with open(out_f, "w") as f:
        json.dump(floors, f, indent=1)
        f.write("\n")
    print(f"wrote {out_f}: {len(warm)} query floors, "
          f"sum {sum(warm.values()):.1f}s")


if __name__ == "__main__":
    main()
