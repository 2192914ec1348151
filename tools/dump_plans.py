"""Regenerate PLANS.md: formatted physical plans of representative
queries with scalability commentary.

Usage: python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SELECTED = {
    "group_counts_q1": (
        "TPC-H Q1 shape: pruned 6-column scan → codegen'd projection to integer cents → "
        "map-side partial aggregate → one exchange on the two group keys → final aggregate. "
        "At 100 TB the exchange carries 6 partial sums per (flag,status,partition), not rows."
    ),
    "enrich_broadcast": (
        "Dimension enrichment: both nation and region broadcast (no shuffle for the joins); "
        "IsNotNull join-key filters pushed into every parquet scan; single exchange for the "
        "final rollup."
    ),
    "topk_orders": (
        "Deterministic LIMIT: TakeOrderedAndProject — per-partition top-50 heaps merged on "
        "the driver; no global sort, no exchange."
    ),
    "minhash_lsh_candidates": (
        "Near-dup candidates: shingle+minhash is one narrow codegen'd pass (regex n-grams, "
        "one md5/shingle); ONE exchange groups (band,minhash) buckets; a<b pairs generated "
        "per bucket row (no self-join, the signature subplan is never re-evaluated); final "
        "distinct de-dupes across bands."
    ),
    "asof_click_purchase": (
        "As-of join without an inequality join: union both sides, one exchange on user_id, "
        "last(ignorenulls) window carries the latest purchase forward. An ASOF via range "
        "predicate would be a broadcast nested loop."
    ),
}


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from frontpage_spark.queries import QUERIES
    from frontpage_spark.session import get_spark

    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# PLANS — physical plans of representative queries (sf0.1, AQE on)",
        "",
        "Regenerate with: `python tools/dump_plans.py` (this file is its output).",
        "",
    ]
    for name, note in SELECTED.items():
        df = QUERIES[name](spark, sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        lines = buf.getvalue().splitlines()
        tree_end = next((i for i, l in enumerate(lines) if l.strip() == "" and i > 2), len(lines))
        tree = "\n".join(lines[:tree_end])
        scans = "\n".join(l for l in lines if "PushedFilters" in l or "ReadSchema" in l)
        out += [f"## {name}", "", note, "", "```", tree, "", scans, "```", ""]

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
