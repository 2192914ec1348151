"""BENCH harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Also times the DuckDB oracle for each query (the practical baseline per
BASELINE.md) when --oracle is passed; per-query oracle secs land in
"oracle_queries".
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "phone_mine_segments",
    "url_parse_tokens",
    "group_counts_q1",
    "enrich_broadcast",
    "topk_orders",
    "json_props_extract",
    "dedup_exact",
    "minhash_lsh_candidates",
    "simhash_buckets",
    "embedding_topk_cosine",
    "text_quality_by_lang",
    "token_counts_by_source",
    "doc_fingerprints",
    "sessionize_users",
    "tumbling_window_counts",
    "incremental_delta_scan",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    with_oracle = "--oracle" in sys.argv

    from frontpage_spark.queries import ORACLES, QUERIES
    from frontpage_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/codegen once so per-query numbers measure the plan,
    # not first-call classloading
    QUERIES["global_minmax"](spark, sf_dir).collect()

    per_query: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        dt = time.time() - t0
        per_query[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.2f}s ({n} rows)", file=sys.stderr)

    out = {
        "metric": "headline_queries_total_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "sf": sf_dir,
    }

    if with_oracle:
        import duckdb

        from frontpage_spark.schemas import TESTDATA_TABLES

        con = duckdb.connect()
        for t in TESTDATA_TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t + '.parquet')}'"
            )
        oracle_q: dict[str, float] = {}
        for name in HEADLINE:
            if name not in ORACLES:
                continue
            t0 = time.time()
            con.execute(ORACLES[name]).fetchall()
            oracle_q[name] = round(time.time() - t0, 3)
        out["oracle_queries"] = oracle_q

    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
