#!/usr/bin/env python3
"""Determinism audit: compare two Verify output directories query by query.

Usage: python3 tools/determinism.py OUT_A OUT_B

For every query parquet in OUT_A, asserts the matching output in OUT_B is
content-AND-order identical (pyarrow table equality after aligning column
order by name). Exits non-zero on any mismatch or missing query.
Dev tooling (pyarrow is driver-side only, like parity.py).
"""
import sys
import os
import pyarrow.parquet as pq


def main():
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    names = sorted(
        d for d in os.listdir(a_dir)
        if os.path.isdir(os.path.join(a_dir, d))
    )
    bad = 0
    order_only = 0
    for name in names:
        pa = os.path.join(a_dir, name)
        pb = os.path.join(b_dir, name)
        if not os.path.isdir(pb):
            print(f"[MISS] {name}: absent in {b_dir}")
            bad += 1
            continue
        ta = pq.read_table(pa)
        tb = pq.read_table(pb)
        cols = sorted(ta.column_names)
        if sorted(tb.column_names) != cols:
            print(f"[SCHEMA] {name}: {ta.column_names} vs {tb.column_names}")
            bad += 1
            continue
        if not ta.select(cols).equals(tb.select(cols)):
            # distinguish CONTENT divergence (a real determinism bug) from
            # row-ORDER divergence (shuffle-fetch order on a join-tailed
            # frame — the driver's sorted-hash compare is order-free, and
            # an unordered operator is CORRECT to leave unordered at scale)
            # Normalize every cell to a totally-ordered, equality-stable
            # form BEFORE sorting and comparing: Python 3 refuses
            # None < int, NaN != NaN breaks both tuple equality and sort
            # totality (nan<x and x<nan are both False), and NULLs/NaNs
            # are legitimate in compared columns. repr() keeps full float
            # precision so distinct doubles never collide.
            def _norm(row):
                out = []
                for v in row:
                    if v is None:
                        out.append((0, ""))
                    elif isinstance(v, float):
                        out.append((1, "nan" if v != v else repr(v)))
                    else:
                        out.append((2, f"{type(v).__name__}:{v}"))
                return tuple(out)
            ra = sorted(_norm(r) for r in zip(*[ta.column(c).to_pylist() for c in cols]))
            rb = sorted(_norm(r) for r in zip(*[tb.column(c).to_pylist() for c in cols]))
            if ra == rb:
                print(f"[ORDR] {name}: content identical, row order differs "
                      f"(unordered operator; driver compare unaffected)")
                order_only += 1
            else:
                print(f"[DIFF] {name}: CONTENT differs")
                bad += 1
            continue
        print(f"[ OK ] {name}: {ta.num_rows} rows identical")
    print(f"\n{len(names) - bad - order_only} identical, "
          f"{order_only} order-only, {bad} content-mismatched")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
