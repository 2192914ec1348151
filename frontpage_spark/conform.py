"""Conformance invariants (SURVEY.md §3 EP3; reference
etl_process.py:227-241 — defined there but never invoked; here they
are first-class batch jobs).

1. Temporal: drop clean rows with post_date earlier than the first
   scrape (data posted before the collection window).
2. Referential: drop clean rows whose uniq_id no longer exists in raw.

Both are single Catalyst plans; the scalar subquery is a broadcast of
one row, the referential check a left_semi join on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def temporal_conform(
    clean: DataFrame, ts_col: str = "post_date", anchor_col: str = "scrape_date"
) -> DataFrame:
    """P3 — keep rows with ts_col >= global min(anchor_col).
    (Reference: DELETE WHERE post_date < (SELECT MIN(scrape_date)...),
    etl_process.py:230-235.)"""
    m = clean.agg(F.min(anchor_col).alias("__m"))
    return (
        clean.crossJoin(F.broadcast(m))
        .filter(F.col(ts_col) >= F.col("__m"))
        .drop("__m")
    )


def referential_conform(clean: DataFrame, raw: DataFrame, key: str = "uniq_id") -> DataFrame:
    """J4 — keep clean rows whose key still exists in raw
    (etl_process.py:238-241)."""
    return clean.join(raw.select(key), key, "left_semi")


def conform(clean: DataFrame, raw: DataFrame, key: str = "uniq_id") -> DataFrame:
    return temporal_conform(referential_conform(clean, raw, key))
