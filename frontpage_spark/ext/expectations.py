"""Data-quality expectations: declarative constraint checks compiled
into a minimal number of passes, reported as one tidy DataFrame.

The shape every large-scale pipeline needs before training-data
ingestion (Deequ/Great-Expectations class): assert null-fractions,
value ranges, set membership, key uniqueness, and referential
integrity — and get back a small report table, not an exception.

Scale design (this is the point of the compilation step):

- ALL row-local constraints (null / range / set / regex) over one
  table fold into a SINGLE aggregate pass — one scan, map-side
  partial aggregation, a 1-row result per table regardless of how
  many constraints are declared. At 100 TB you pay one read, not one
  read per constraint.
- Uniqueness is one keyed groupBy (the unavoidable shuffle), counting
  keys with multiplicity > 1.
- Referential integrity is a left-anti join against the referenced
  key set — broadcast when the dimension is small, shuffle otherwise
  (left to AQE).
- The report is a union of 1-row aggregates — driver-light, no
  collect.

Report rows: (expectation, target, n_violations, n_rows, ok)
(names chosen to dodge SQL reserved words on the oracle side).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F


@dataclass
class Expectations:
    """Builder: declare constraints, then ``report(df)``."""

    _rowlocal: list[tuple[str, str, Column]] = field(default_factory=list)
    _unique: list[tuple[str, ...]] = field(default_factory=list)
    _fk: list[tuple[str, DataFrame, str]] = field(default_factory=list)

    # -- row-local constraints: each is (name, column, violation predicate)
    def not_null(self, col: str) -> "Expectations":
        self._rowlocal.append(("not_null", col, F.col(col).isNull()))
        return self

    def in_range(self, col: str, lo, hi) -> "Expectations":
        c = F.col(col)
        self._rowlocal.append(
            ("in_range", col, c.isNull() | (c < F.lit(lo)) | (c > F.lit(hi)))
        )
        return self

    def in_set(self, col: str, values) -> "Expectations":
        c = F.col(col)
        self._rowlocal.append(
            ("in_set", col, c.isNull() | ~c.isin(list(values)))
        )
        return self

    def matches(self, col: str, pattern: str) -> "Expectations":
        c = F.col(col)
        self._rowlocal.append(
            ("matches", col, c.isNull() | ~c.rlike(pattern))
        )
        return self

    # -- wide constraints
    def unique(self, *cols: str) -> "Expectations":
        self._unique.append(tuple(cols))
        return self

    def foreign_key(self, col: str, dim: DataFrame, dim_key: str) -> "Expectations":
        self._fk.append((col, dim, dim_key))
        return self

    # -- compile & run
    def report(self, df: DataFrame) -> DataFrame:
        """One scan for all row-local checks + one groupBy per unique
        key + one anti join per FK; returns the constraint report."""
        parts: list[DataFrame] = []

        aggs = [F.count(F.lit(1)).alias("__n")]
        for i, (_, _, viol) in enumerate(self._rowlocal):
            aggs.append(
                F.sum(F.when(viol, 1).otherwise(0)).cast("long").alias(f"__v{i}")
            )
        base = df.agg(*aggs)
        for i, (kind, col, _) in enumerate(self._rowlocal):
            parts.append(
                base.select(
                    F.lit(kind).alias("expectation"),
                    F.lit(col).alias("target"),
                    F.col(f"__v{i}").alias("n_violations"),
                    F.col("__n").cast("long").alias("n_rows"),
                )
            )

        for cols in self._unique:
            dup = (
                df.groupBy(*cols)
                .count()
                .filter(F.col("count") > 1)
                .agg(
                    F.coalesce(F.sum("count"), F.lit(0)).cast("long").alias("nv"),
                )
            )
            n = df.agg(F.count(F.lit(1)).cast("long").alias("n"))
            parts.append(
                dup.crossJoin(n).select(
                    F.lit("unique").alias("expectation"),
                    F.lit(",".join(cols)).alias("target"),
                    F.col("nv").alias("n_violations"),
                    F.col("n").alias("n_rows"),
                )
            )

        for col, dim, dim_key in self._fk:
            orphans = (
                df.select(F.col(col))
                .filter(F.col(col).isNotNull())
                .join(dim.select(F.col(dim_key).alias(col)), col, "left_anti")
                .agg(F.count(F.lit(1)).cast("long").alias("nv"))
            )
            n = df.agg(F.count(F.lit(1)).cast("long").alias("n"))
            parts.append(
                orphans.crossJoin(n).select(
                    F.lit("foreign_key").alias("expectation"),
                    F.lit(col).alias("target"),
                    F.col("nv").alias("n_violations"),
                    F.col("n").alias("n_rows"),
                )
            )

        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.withColumn("ok", F.col("n_violations") == 0)
