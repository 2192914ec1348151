"""Temporal join operators Spark lacks natively: as-of join (each left
row matched to the most recent right row at or before its timestamp)
and banded range join (all right rows within a time window of each
left row).

Implemented without inequality-only join conditions: a raw range
predicate forces a broadcast nested-loop (O(L×R) comparisons). The
as-of join uses the union + last(ignorenulls) window trick — ONE
shuffle on the key and a linear pass per partition; the range join
buckets both sides by window-width time bands so the range predicate
becomes an equi-join on (key, band) plus an exact residual filter —
at 100 TB both cost what a groupBy on the key costs.

Oracle parity: DuckDB's native ASOF JOIN (l.ts >= r.ts) — equal
timestamps match, which the union form reproduces by sorting right
rows before left rows at ties; the range join oracle is the plain
inequality join DuckDB's IEJoin executes natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    payload: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every left row + the payload of the latest right
    row with right.ts <= left.ts for the same key (NULLs if none).

    ``right`` must be unique per (on, ts) — pre-aggregate if not, or
    ties are resolved arbitrarily. Payload columns must not collide
    with left column names (they are emitted as ``<col><suffix>``,
    plus ``<ts><suffix>`` for the matched timestamp).
    """
    pay_out = [f"{c}{suffix}" for c in payload] + [f"{ts}{suffix}"]
    l_side = left.select(
        "*",
        F.lit(1).alias("__is_l"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"{c}{suffix}") for c in payload],
        F.lit(None).cast(dict(right.dtypes)[ts]).alias(f"{ts}{suffix}"),
    )
    left_nulls = [
        F.lit(None).cast(t).alias(c) for c, t in left.dtypes if c not in (on, ts)
    ]
    r_side = right.select(
        F.col(on),
        F.col(ts),
        *left_nulls,
        F.lit(0).alias("__is_l"),
        *[F.col(c).alias(f"{c}{suffix}") for c in payload],
        F.col(ts).alias(f"{ts}{suffix}"),
    ).select(*[c for c, _ in left.dtypes], "__is_l", *pay_out)
    unioned = l_side.select(*[c for c, _ in left.dtypes], "__is_l", *pay_out).unionByName(
        r_side
    )
    # right rows (flag 0) sort before left rows at equal ts → ties match
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts), F.col("__is_l"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in pay_out
        ],
    )
    return (
        filled.filter(F.col("__is_l") == 1)
        .select(
            *[c for c, _ in left.dtypes],
            *[F.col(f"__f_{c}").alias(c) for c in pay_out],
        )
    )


def range_join_banded(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    window_seconds: int,
) -> DataFrame:
    """All (left, right) pairs with the same ``on`` key where
    ``right_ts`` falls in the half-open window
    ``(left_ts - window_seconds, left_ts]``.

    Spark has no range-join physical operator; a bare inequality
    condition degenerates to BroadcastNestedLoopJoin. Instead both
    sides are bucketed into ``window_seconds``-wide epoch bands: a
    right row in band b can only match left rows in bands b or b+1,
    so the left side is exploded to (its band, band-1) and the join
    runs as an equi-join on (key, band) — hash-shuffled, AQE-eligible
    — followed by the exact residual range filter. Fan-out is exactly
    2x the left side regardless of window width.

    Column collisions: right columns keep their names; callers select/
    alias before joining if both sides share payload names (``on``,
    band, and the two ts columns are handled here).
    """
    l_band = (F.unix_timestamp(F.col(left_ts)) / window_seconds).cast("long")
    r_band = (F.unix_timestamp(F.col(right_ts)) / window_seconds).cast("long")
    l_exp = left.withColumn("__band", F.explode(F.array(l_band, l_band - 1)))
    r_exp = right.withColumn("__band", r_band)
    joined = l_exp.join(r_exp, [on, "__band"])
    lo = F.col(left_ts) - F.expr(f"INTERVAL {window_seconds} SECONDS")
    return (
        joined.filter((F.col(right_ts) > lo) & (F.col(right_ts) <= F.col(left_ts)))
        .drop("__band")
    )
