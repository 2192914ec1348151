"""CLI — the reference's console surface (`frontpage scraper|etl`,
cli.py:5-16) re-expressed for the Spark engine.

  python -m frontpage_spark etl --raw DIR --dim CSV --out DIR [--stream]
  python -m frontpage_spark conform --clean DIR --raw DIR --out DIR
  python -m frontpage_spark query NAME [--sf-dir DIR]

`scraper` (network acquisition over Tor) is intentionally not
reproduced — the engine consumes acquired records (SURVEY.md §2.1 S1-S2
are out of correctness scope); `etl` covers EP2 and `conform` EP3.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="frontpage_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    etl = sub.add_parser("etl", help="raw→clean batch (EP2 body)")
    etl.add_argument("--raw", required=True, help="raw ad parquet dir")
    etl.add_argument("--dim", required=True, help="site_map CSV path")
    etl.add_argument("--out", required=True, help="clean sink parquet dir")
    etl.add_argument("--stream", action="store_true", help="Structured Streaming (availableNow)")
    etl.add_argument("--checkpoint", default=None, help="stream checkpoint dir")

    conf = sub.add_parser("conform", help="conformance invariants (EP3)")
    conf.add_argument("--clean", required=True)
    conf.add_argument("--raw", required=True)
    conf.add_argument("--out", required=True)

    q = sub.add_parser("query", help="run a registered query")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--limit", type=int, default=20)

    args = p.parse_args(argv)

    from .session import get_spark

    spark = get_spark(f"frontpage_spark-{args.cmd}")
    try:
        if args.cmd == "etl":
            from .pipeline import run_batch, to_compat, write_append
            from .sources import csv_dimension

            raw = spark.read.parquet(args.raw)
            site_map = csv_dimension(spark, args.dim)
            try:
                existing = spark.read.parquet(args.out).select("uniq_id")
            except Exception:
                existing = spark.createDataFrame([], "uniq_id string")
            if args.stream:
                from .incremental import stream_pipeline

                def body(batch, _eid):
                    # Re-read the sink each epoch so later batches see keys the
                    # earlier ones appended; if no batch has appended yet the
                    # sink dir has no parquet footers — fall back to the empty
                    # (or pre-existing) key set instead of crashing the stream.
                    seen = existing
                    if _eid > 0:
                        try:
                            seen = spark.read.parquet(args.out).select("uniq_id")
                        except Exception:
                            seen = existing
                    out = run_batch(batch, site_map, seen)
                    write_append(to_compat(out), args.out)

                sq = stream_pipeline(
                    spark, args.raw, args.checkpoint or args.out + "_chk",
                    body, schema=raw.schema, available_now=True,
                )
                sq.awaitTermination()
            else:
                out = run_batch(raw, site_map, existing)
                write_append(to_compat(out), args.out)
            print(f"etl: sink now has {spark.read.parquet(args.out).count()} rows")
        elif args.cmd == "conform":
            import os

            from .conform import conform

            if os.path.realpath(args.out) in (
                os.path.realpath(args.clean),
                os.path.realpath(args.raw),
            ):
                print("conform: --out must differ from --clean/--raw "
                      "(lazy read + overwrite would destroy the input)")
                return 2
            clean = spark.read.parquet(args.clean)
            raw = spark.read.parquet(args.raw)
            kept = conform(clean, raw)
            kept.write.mode("overwrite").parquet(args.out)
            print(f"conform: kept {spark.read.parquet(args.out).count()} rows")
        elif args.cmd == "query":
            from .queries import QUERIES

            if args.name not in QUERIES:
                print(f"unknown query {args.name!r}; available: {', '.join(sorted(QUERIES))}")
                return 2
            QUERIES[args.name](spark, args.sf_dir).show(args.limit, truncate=False)
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
