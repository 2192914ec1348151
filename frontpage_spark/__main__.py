"""CLI — the reference's console surface (`frontpage scraper|etl`,
cli.py:5-16) re-expressed for the Spark engine.

  python -m frontpage_spark ingest --urls FILE --html-dir DIR --out DIR
  python -m frontpage_spark etl --raw DIR --dim CSV --out DIR [--stream]
  python -m frontpage_spark conform --clean DIR --raw DIR --out DIR
  python -m frontpage_spark query NAME [--sf-dir DIR]

`ingest` is EP1 (the reference's `scraper`) with the network swapped
for a disk-backed fetcher: each URL resolves to --html-dir/<md5(url)>
(.html), runs through the distributed fetch operator (retry/backoff/
dead-letter), record assembly, and insert-if-absent into the raw sink.
Live acquisition (Tor) is out of engine scope; everything from the
fetch boundary inward is the real dataflow. `etl` covers EP2,
`conform` EP3.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="frontpage_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    ing = sub.add_parser("ingest", help="urls→raw records (EP1 body, disk-backed fetch)")
    ing.add_argument("--urls", required=True, help="newline-delimited URL file")
    ing.add_argument("--html-dir", required=True, help="dir of <md5(url)>.html payloads")
    ing.add_argument("--out", required=True, help="raw sink parquet dir")
    ing.add_argument("--max-retries", type=int, default=2)
    ing.add_argument(
        "--scrape-date", default=None,
        help="fixed 'yyyy-MM-dd HH:mm:ss' scrape timestamp (reproducible backfills); default now()",
    )

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

    pr = sub.add_parser(
        "prep", help="training-data prep: quality→dedup→decontam→tokenize→split"
    )
    pr.add_argument("--docs", required=True, help="parquet with (doc_id, text)")
    pr.add_argument("--benchmark", help="parquet with (text) to decontaminate against")
    pr.add_argument("--out", required=True)

    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from .session import get_spark

    # only stop the session on exit if WE created it (embedded callers —
    # tests, notebooks — hand us their live session via getOrCreate)
    preexisting = SparkSession.getActiveSession() or SparkSession._instantiatedSession
    spark = get_spark(f"frontpage_spark-{args.cmd}")
    try:
        if args.cmd == "ingest":
            from pyspark.sql import functions as F

            from .pipeline import dedup_new_keys, write_append
            from .sources import assemble_raw, fetch_documents

            html_dir = args.html_dir

            def fetcher(url: str) -> tuple[int, str]:
                import hashlib
                import os as _os

                p = _os.path.join(html_dir, hashlib.md5(url.encode()).hexdigest() + ".html")
                with open(p, encoding="utf-8") as f:  # missing file raises -> retries -> dead-letter
                    return 200, f.read()

            urls = (
                spark.read.text(args.urls)
                .select(F.trim("value").alias("url"))
                .filter(F.col("url") != "")
                .distinct()
            )
            clock = (lambda d=args.scrape_date: d) if args.scrape_date else None
            fetched = fetch_documents(urls, fetcher, max_retries=args.max_retries, clock=clock)
            raw = assemble_raw(fetched)
            try:
                existing = spark.read.parquet(args.out).select("uniq_id")
            except Exception:
                existing = spark.createDataFrame([], "uniq_id string")
            write_append(dedup_new_keys(raw, existing), args.out)
            n_dead = fetched.filter(F.col("error").isNotNull()).count()
            print(
                f"ingest: sink now has {spark.read.parquet(args.out).count()} rows"
                f" ({n_dead} dead-lettered fetches)"
            )
        elif args.cmd == "etl":
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
        elif args.cmd == "prep":
            from .ext.prep import prep_corpus

            docs = spark.read.parquet(args.docs).select("doc_id", "text")
            bench = (
                spark.read.parquet(args.benchmark).select("text")
                if args.benchmark
                else spark.createDataFrame([], "text string")
            )
            _, funnel = prep_corpus(docs, bench, out_path=args.out)
            for r in funnel.orderBy("stage_no").collect():
                print(f"prep: {r.stage:15s} {r.n}")
            print(f"prep: wrote split corpus to {args.out}")
        return 0
    finally:
        if preexisting is None:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
