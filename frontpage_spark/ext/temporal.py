"""Temporal join operators Spark lacks natively: as-of join (each left
row matched to the most recent right row at or before its timestamp).

Implemented with the union + last(ignorenulls) window trick rather than
an inequality join: a raw range predicate would force a broadcast
nested-loop (O(L×R) comparisons); the union form is ONE shuffle on the
key and a linear pass per partition — at 100 TB the as-of join costs
the same as a groupBy on the key.

Oracle parity: DuckDB's native ASOF JOIN (l.ts >= r.ts) — equal
timestamps match, which the union form reproduces by sorting right
rows before left rows at ties.
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
