"""Local differential checker mirroring the driver's t2 gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB at
the given sf dir, compares row count, column names/ordering, and
order-insensitive values (exact where possible; floats compared
bit-exact first, then with tolerance reporting so mismatches are
diagnosable).

Usage: python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def duckdb_con(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    from frontpage_spark.schemas import TESTDATA_TABLES

    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t + '.parquet')}'"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical string form per cell → order-insensitive multiset compare
    out = df.copy()
    for c in out.columns:
        out[c] = out[c].map(lambda v: repr(v))
    return out.sort_values(by=list(out.columns), ignore_index=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return problems
    if len(sdf) != len(odf):
        problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
    ns, no = normalize(sdf), normalize(odf)
    if len(ns) == len(no):
        neq = ns.ne(no)
        if neq.any().any():
            bad_cols = [c for c in ns.columns if neq[c].any()]
            for c in bad_cols:
                idx = neq[c].idxmax()
                problems.append(
                    f"value col={c} row{idx}: spark={ns[c][idx][:80]} oracle={no[c][idx][:80]} "
                    f"({int(neq[c].sum())} diffs)"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from frontpage_spark.queries import ORACLES, QUERIES
    from frontpage_spark.session import get_spark

    spark = get_spark("check")
    con = duckdb_con(sf_dir)

    n_pass = n_fail = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: SPARK ERROR {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        finally:
            # queries persist loop invariants / shared subplans scoped to
            # their own execution; a 123-query session must not accumulate
            # those cached blocks (ADVICE r2)
            spark.catalog.clearCache()
        t_spark = time.time() - t0
        if name not in ORACLES:
            print(f"ok   {name}: rows-only, {len(sdf)} rows ({t_spark:.1f}s)")
            n_pass += 1
            continue
        t0 = time.time()
        try:
            odf = con.execute(ORACLES[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: ORACLE ERROR {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        t_duck = time.time() - t0
        problems = compare(name, sdf, odf)
        if problems:
            print(f"FAIL {name}: " + " | ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(sdf)} rows (spark {t_spark:.1f}s, duckdb {t_duck:.2f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
