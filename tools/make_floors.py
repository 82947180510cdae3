#!/usr/bin/env python3
"""Record per-query floors from a median-of-N warm bench run.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench"     # median-of-3 warm is the default
  python3 tools/make_floors.py BENCH_full.json FLOORS_local.json

Methodology (VERDICT r9 item 7, r13 item 2, r14 item 6): ONE floors file.
Floors are the median-of-3 warm time on the gate box, re-recorded per
round — a 2x excursion against THAT is a real regression signal (all-time
minima mixed across quiet and contended boxes were lucky floors that
tripped the 2x flag on noise; the separate min-over-rounds baseline file
was retired in r15 so no tool can read a floor under a different rule).

Every floor carries the query's plan fingerprint from the same bench run:
a floor is only comparable against the SAME hash (bench_adjudicate.py
enforces this). Hash values of "err" (fingerprinting threw) or "" are
NO-hash — they never count as matching, so an unverifiable plan can never
launder a stale floor.

A query absent from this round's warm set (errored, or filtered out)
KEEPS its previous floor, carried with its previous hash and reported
loudly — dropping it would forget the baseline exactly when the query is
broken (ADVICE r14).
"""
import json
import sys

NO_HASH = ("", "err")


def main() -> None:
    bench_f = sys.argv[1] if len(sys.argv) > 1 else "BENCH_full.json"
    out_f = sys.argv[2] if len(sys.argv) > 2 else "FLOORS_local.json"
    bench = json.load(open(bench_f))
    warm = bench.get("warm_queries")
    if not warm:
        sys.exit(f"{bench_f} has no warm_queries — run Bench with warm on")
    hashes = bench.get("plan_hashes", {})

    try:
        prev = json.load(open(out_f))
    except FileNotFoundError:
        prev = {}
    prev_q = prev.get("queries", {})
    prev_h = prev.get("plan_hashes", {})

    queries = dict(sorted(warm.items()))
    plan_hashes = {k: hashes.get(k, "") for k in sorted(warm)}
    unhashed = sorted(k for k, h in plan_hashes.items() if h in NO_HASH)
    carried = sorted(set(prev_q) - set(warm))
    for k in carried:
        queries[k] = prev_q[k]
        plan_hashes[k] = prev_h.get(k, "")

    floors = {
        "cpus": 32,
        "note": ("per-query median-of-3 warm seconds on the gate box "
                 "(tools/make_floors.py); re-recorded per round; plan_hashes "
                 "from the same run — compare floors only against the same "
                 "hash, and never against an 'err'/'' hash"),
        "sf": bench.get("sf"),
        "queries": dict(sorted(queries.items())),
        "plan_hashes": dict(sorted(plan_hashes.items())),
    }
    if carried:
        floors["carried_from_previous_round"] = carried
    with open(out_f, "w") as f:
        json.dump(floors, f, indent=1)
        f.write("\n")
    print(f"wrote {out_f}: {len(queries)} query floors, "
          f"sum {sum(queries.values()):.1f}s")
    if unhashed:
        print("  NO-hash queries (fingerprint err — floors not "
              "plan-comparable): " + ", ".join(unhashed))
    if carried:
        print("  carried (ABSENT this round — investigate): "
              + ", ".join(carried))


if __name__ == "__main__":
    main()
