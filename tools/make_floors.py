#!/usr/bin/env python3
"""Record per-query floors from a median-of-N warm bench run.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench"     # median-of-3 warm is the default
  python3 tools/make_floors.py BENCH_full.json FLOORS_local.json [BASELINE_local.json]

Methodology (VERDICT r9 item 7): the old BASELINE_local.json floors were
all-time minima mixed across quiet and contended boxes, so a query whose
lucky floor was 0.28 s but whose stable warm is ~1.9 s tripped the 2x
regression flag every round. Floors are now the median-of-3 warm time on
the gate box, re-recorded per round — a 2x excursion against THAT is a
real regression signal.

Plan-hash-aware floors (VERDICT r13 item 2): every floor carries the
query's plan fingerprint from the same bench run. When the optional third
argument (the min-over-rounds baseline) is given, it is updated in place:
a query keeps min(old, new) ONLY while its plan hash is unchanged; a
changed hash RESETS the floor to the new median (comparing a new plan
against a retired plan's lucky floor is exactly the rfm_segments 2.89x
false flag), and queries absent from the baseline (new registry rows) get
their first floor.
"""
import json
import sys


def main() -> None:
    bench_f = sys.argv[1] if len(sys.argv) > 1 else "BENCH_full.json"
    out_f = sys.argv[2] if len(sys.argv) > 2 else "FLOORS_local.json"
    base_f = sys.argv[3] if len(sys.argv) > 3 else None
    bench = json.load(open(bench_f))
    warm = bench.get("warm_queries")
    if not warm:
        sys.exit(f"{bench_f} has no warm_queries — run Bench with warm on")
    hashes = bench.get("plan_hashes", {})
    floors = {
        "cpus": 32,
        "note": ("per-query median-of-3 warm seconds on the gate box "
                 "(tools/make_floors.py); re-recorded per round; plan_hashes "
                 "from the same run — compare floors only against the same "
                 "hash"),
        "sf": bench.get("sf"),
        "queries": dict(sorted(warm.items())),
        "plan_hashes": {k: hashes.get(k, "") for k in sorted(warm)},
    }
    with open(out_f, "w") as f:
        json.dump(floors, f, indent=1)
        f.write("\n")
    print(f"wrote {out_f}: {len(warm)} query floors, "
          f"sum {sum(warm.values()):.1f}s")

    if base_f:
        try:
            base = json.load(open(base_f))
        except FileNotFoundError:
            base = {}
        old_q = base.get("queries", {})
        old_h = base.get("plan_hashes", {})
        new_q, new_h, resets, fresh = {}, {}, [], []
        for k in sorted(warm):
            h = hashes.get(k, "")
            if k in old_q and old_h.get(k) == h and h:
                new_q[k] = min(old_q[k], warm[k])
            else:
                new_q[k] = warm[k]
                (resets if k in old_q else fresh).append(k)
            new_h[k] = h
        out = {
            "cpus": 32,
            "note": ("per-query wall-second floor: min over rounds WHILE the "
                     "plan hash is unchanged, reset on plan change "
                     "(tools/make_floors.py)"),
            "queries": new_q,
            "plan_hashes": new_h,
        }
        with open(base_f, "w") as f:
            json.dump(out, f, indent=1)
            f.write("\n")
        dropped = sorted(set(old_q) - set(new_q))
        print(f"updated {base_f}: {len(new_q)} floors "
              f"({len(resets)} plan-change resets, {len(fresh)} new keys"
              + (f", {len(dropped)} retired keys dropped" if dropped else "")
              + ")")
        if resets:
            print("  resets: " + ", ".join(resets))
        if fresh:
            print("  new: " + ", ".join(fresh))


if __name__ == "__main__":
    main()
