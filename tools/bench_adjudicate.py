#!/usr/bin/env python3
"""Adjudicate a BENCH_full.json run against the per-query floors and a
reference round's plan hashes.

Usage: bench_adjudicate.py BENCH_full.json FLOORS_local.json [BENCH_rREF.json]

Floors: FLOORS_local.json is THE floors file (median-of-3 warm on the gate
box, re-recorded per round via tools/make_floors.py, plan-hash per query).
The former min-over-rounds BASELINE_local.json was retired in r15 —
exactly one floors file exists, under exactly one rule.

Methodology (SURVEY §5 / round-5 bench note): a query slower than 2x its
floor with an UNCHANGED plan fingerprint is machine noise; a changed
fingerprint marks a real plan regression that needs a plan diff. Hash
values of "err" or "" are NO-hash: they never count as same-plan.
"""
import json
import sys

NO_HASH = ("", "err")


def same_plan(a, b):
    return a == b and a not in NO_HASH and a is not None


def main() -> None:
    cur_f, base_f = sys.argv[1], sys.argv[2]
    ref_f = sys.argv[3] if len(sys.argv) > 3 else None
    cur = json.load(open(cur_f))
    floors_file = json.load(open(base_f))
    floor_hashes = floors_file.get("plan_hashes", {})
    floors = floors_file.get("queries", floors_file)
    # floor files carry their own plan hashes since r14 — a floor is only
    # comparable against the SAME plan, so those take precedence over (and
    # make optional) the reference-round hashes
    ref_hashes = dict(floor_hashes)
    if ref_f:
        ref = json.load(open(ref_f))
        for k, v in ref.get("plan_hashes", {}).items():
            ref_hashes.setdefault(k, v)

    cold = cur["queries"]
    warm = cur.get("warm_queries", cold)
    hashes = cur.get("plan_hashes", {})
    errors = cur.get("errors", {})

    floor_sum = sum(v for k, v in floors.items() if k in cold)
    print(f"total cold {cur['value']:.1f}s  vs floor-sum {floor_sum:.1f}s "
          f"=> {cur['value'] / floor_sum:.2f}x")
    warm_sum = sum(warm.values())
    print(f"total warm {warm_sum:.1f}s => {warm_sum / floor_sum:.2f}x")
    if errors:
        print(f"ERRORS ({len(errors)}):")
        for k, v in errors.items():
            print(f"  {k}: {v[:120]}")

    if not ref_hashes:
        print("\nno plan hashes available — hash comparison did not run "
              "(use a committed BENCH_full.json as the reference)")
    else:
        changed = sorted(k for k, h in hashes.items()
                         if k in ref_hashes and not same_plan(ref_hashes[k], h))
        missing = sorted(k for k in hashes if k not in ref_hashes)
        print(f"\nplan hashes changed/unverifiable vs floors/reference: {len(changed)}"
              + (f" ({len(missing)} not in reference)" if missing else ""))
        for k in changed:
            print(f"  {k}: {ref_hashes[k]} -> {hashes[k]}")

    print("\nqueries >2x floor (warm):")
    flagged = []
    for k in sorted(cold):
        fl = floors.get(k)
        if fl is None:
            continue
        w = warm.get(k, cold[k])
        if w > 2 * fl and w > 0.25:  # ignore sub-quarter-second jitter
            same = "same-plan" if same_plan(hashes.get(k), ref_hashes.get(k)) else "PLAN-CHANGED"
            flagged.append(k)
            print(f"  {k}: warm {w:.2f}s vs floor {fl:.2f}s "
                  f"({w / fl:.1f}x) [{same}] cold {cold[k]:.2f}s")
    if not flagged:
        print("  none")


if __name__ == "__main__":
    main()
