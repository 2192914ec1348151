"""Source adapters (SURVEY.md §2.1).

The reference reads: Postgres tables (S4/S7/S8), a CSV dimension file
(S5, etl_process.py:185-200), newline parameter files (S6,
scraper.py:159-160), and live HTTP (S1-S2 — out of engine scope; the
correctness harness substitutes the parquet testdata). Here every
source is a DataFrame reader so Catalyst sees the whole plan: column
pruning and predicate pushdown reach the parquet scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Columns written as parquet TIMESTAMP(NANOS), which Spark's vectorized
# reader rejects outright (PARQUET_TYPE_ILLEGAL). We read them as raw
# nano longs (legacy.parquet.nanosAsLong) and convert to micros —
# identical to what DuckDB's ns→us cast does, so oracle parity holds.
NANO_TS_COLUMNS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """One testdata parquet table. Vectorized reader; pruning/pushdown free."""
    nano_cols = NANO_TS_COLUMNS.get(name, ())
    if nano_cols:
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in nano_cols:
        if dict(df.dtypes).get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register the testdata tables as temp views for spark.sql use."""
    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def paginated_scan(
    fetch_page,
    max_pages: int = 49,
    is_last=None,
) -> DataFrame | None:
    """S1/P4 — bounded pagination with data-driven termination
    (scraper.py:43-83: pages 1..49, stop at 'No matches found.').

    ``fetch_page(n) -> DataFrame`` produces page n; iteration stops at
    the first page for which ``is_last`` (default: DataFrame.isEmpty)
    is true, or after ``max_pages``. The emptiness probe is a job per
    page — inherent to data-driven termination, exactly as the
    reference had to fetch a page to see it was empty. Returns the
    union of fetched pages, or None if page 1 was already empty.
    """
    from functools import reduce

    pages: list[DataFrame] = []
    for n in range(1, max_pages + 1):
        page = fetch_page(n)
        if is_last(page) if is_last is not None else page.isEmpty():
            break
        pages.append(page)
    return reduce(DataFrame.unionByName, pages) if pages else None


def csv_dimension(spark: SparkSession, path: str, column_map: dict[str, str] | None = None) -> DataFrame:
    """S5 — CSV dimension source (reference: dict keyed on site_id,
    etl_process.py:185-200). Small table; callers wrap in broadcast()."""
    df = spark.read.option("header", True).csv(path)
    if column_map:
        df = df.select([F.col(src).alias(dst) for src, dst in column_map.items()])
    return df


def text_params(spark: SparkSession, path: str) -> DataFrame:
    """S6 — newline param file → normalized distinct one-column DataFrame
    (reference: set(line.lower().strip()), scraper.py:159-160)."""
    from .functions import normalize_param

    return (
        spark.read.text(path)
        .select(normalize_param(F.col("value")).alias("value"))
        .filter(F.col("value") != "")
        .distinct()
    )
