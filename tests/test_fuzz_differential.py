"""Differential query fuzzing (mini-SQLancer): hypothesis generates
random filter/group/aggregate query ASTs; each AST is rendered BOTH as
a PySpark DataFrame chain and as ANSI SQL for DuckDB, and the result
multisets must match exactly.

This catches the class of bugs hand-written oracle pairs cannot: the
pairing itself is machine-generated, so a systematic divergence in
filter semantics, null handling, group-by, or integer aggregation
surfaces on whatever query shape triggers it rather than on the shapes
we happened to write. Floats never cross the boundary — every numeric
is integer cents (round(x*100) as BIGINT) on both sides.

Determinism: a fixed hypothesis derandomize profile, so CI failures
reproduce.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

# (table, [(col, kind)]) — kind: "int" (exact integer), "cents"
# (double, compared as round(x*100) BIGINT), "str", "date"
TABLES = {
    "orders": [
        ("o_orderkey", "int"),
        ("o_custkey", "int"),
        ("o_orderstatus", "str"),
        ("o_totalprice", "cents"),
        ("o_orderpriority", "str"),
    ],
    "customer": [
        ("c_custkey", "int"),
        ("c_nationkey", "int"),
        ("c_acctbal", "cents"),
        ("c_mktsegment", "str"),
    ],
    "lineitem": [
        ("l_orderkey", "int"),
        ("l_partkey", "int"),
        ("l_suppkey", "int"),
        ("l_quantity", "cents"),
        ("l_extendedprice", "cents"),
        ("l_discount", "cents"),
        ("l_returnflag", "str"),
        ("l_linestatus", "str"),
    ],
}

STR_LITERALS = {
    "o_orderstatus": ["O", "F", "P"],
    "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW"],
    "c_mktsegment": ["BUILDING", "AUTOMOBILE", "MACHINERY"],
    "l_returnflag": ["A", "N", "R"],
    "l_linestatus": ["O", "F"],
}

INT_BOUNDS = {
    "o_orderkey": (0, 60000),
    "o_custkey": (0, 1500),
    "c_custkey": (0, 1500),
    "c_nationkey": (0, 24),
    "l_orderkey": (0, 60000),
    "l_partkey": (0, 2000),
    "l_suppkey": (0, 120),
}

CMP_OPS = ["<", "<=", ">", ">=", "=", "<>"]


JOINS = {
    # (left, right, left_key, right_key)
    "orders_customer": ("orders", "customer", "o_custkey", "c_custkey"),
    "lineitem_orders": ("lineitem", "orders", "l_orderkey", "o_orderkey"),
}


@st.composite
def join_ast(draw):
    jname = draw(st.sampled_from(sorted(JOINS)))
    lt, rt, lk, rk = JOINS[jname]
    cols = TABLES[lt] + TABLES[rt]
    str_cols = [c for c, k in cols if k == "str"]
    cents_cols = [c for c, k in cols if k == "cents"]
    filters = []
    for _ in range(draw(st.integers(0, 2))):
        c = draw(st.sampled_from(str_cols))
        filters.append(("str", c, draw(st.sampled_from(["=", "<>"])), draw(st.sampled_from(STR_LITERALS[c]))))
    group = draw(st.sampled_from(str_cols))
    agg_c = draw(st.sampled_from(cents_cols))
    having_n = draw(st.sampled_from([None, 1, 10, 100]))
    return jname, filters, group, agg_c, having_n


def render_join_sql(ast) -> str:
    jname, filters, group, agg_c, having_n = ast
    lt, rt, lk, rk = JOINS[jname]
    where = " AND ".join(
        f"{c} {op} '{lit}'" for _, c, op, lit in filters
    )
    sql = (
        f"SELECT {group}, CAST(COUNT(*) AS BIGINT) AS a0, "
        f"CAST(SUM({cents_sql(agg_c)}) AS BIGINT) AS a1 "
        f"FROM {lt} JOIN {rt} ON {lk} = {rk}"
    )
    if where:
        sql += f" WHERE {where}"
    sql += f" GROUP BY {group}"
    if having_n is not None:
        sql += f" HAVING COUNT(*) > {having_n}"
    return sql


def render_join_spark(spark, ast):
    jname, filters, group, agg_c, having_n = ast
    lt, rt, lk, rk = JOINS[jname]
    l = spark.read.parquet(os.path.join(SF_DIR, lt + ".parquet"))
    r = spark.read.parquet(os.path.join(SF_DIR, rt + ".parquet"))
    df = l.join(r, F.col(lk) == F.col(rk))
    ops = {"=": "__eq__", "<>": "__ne__"}
    for _, c, op, lit in filters:
        df = df.filter(getattr(F.col(c), ops[op])(F.lit(lit)))
    cents = F.round(F.col(agg_c) * 100).cast("long")
    out = df.groupBy(group).agg(
        F.count(F.lit(1)).alias("a0"), F.sum(cents).alias("a1")
    )
    if having_n is not None:
        out = out.filter(F.col("a0") > having_n)
    return out


@st.composite
def query_ast(draw):
    table = draw(st.sampled_from(sorted(TABLES)))
    cols = TABLES[table]
    int_cols = [c for c, k in cols if k == "int"]
    cents_cols = [c for c, k in cols if k == "cents"]
    str_cols = [c for c, k in cols if k == "str"]

    filters = []
    for _ in range(draw(st.integers(0, 2))):
        kind = draw(st.sampled_from(["int", "str", "cents"]))
        if kind == "int":
            c = draw(st.sampled_from(int_cols))
            lo, hi = INT_BOUNDS[c]
            filters.append(("int", c, draw(st.sampled_from(CMP_OPS)), draw(st.integers(lo, hi))))
        elif kind == "str":
            c = draw(st.sampled_from(str_cols))
            filters.append(("str", c, draw(st.sampled_from(["=", "<>"])), draw(st.sampled_from(STR_LITERALS[c]))))
        else:
            c = draw(st.sampled_from(cents_cols))
            # compare in exact cents on both sides
            filters.append(("cents", c, draw(st.sampled_from(CMP_OPS)), draw(st.integers(0, 2_000_000))))

    group = draw(st.sampled_from([None] + str_cols + int_cols))
    aggs = draw(
        st.lists(
            st.sampled_from(
                [("count", None)]
                + [("sumc", c) for c in cents_cols]
                + [("minc", c) for c in cents_cols]
                + [("maxi", c) for c in int_cols]
            ),
            min_size=1,
            max_size=3,
            unique=True,
        )
    )
    return table, filters, group, aggs


def cents_sql(c: str) -> str:
    return f"CAST(round({c} * 100) AS BIGINT)"


def render_sql(ast) -> str:
    table, filters, group, aggs = ast
    where = []
    for kind, c, op, lit in filters:
        if kind == "str":
            where.append(f"{c} {op} '{lit}'")
        elif kind == "int":
            where.append(f"{c} {op} {lit}")
        else:
            where.append(f"{cents_sql(c)} {op} {lit}")
    sel, names = [], []
    if group is not None:
        sel.append(group)
        names.append(group)
    for i, (fn, c) in enumerate(aggs):
        a = f"a{i}"
        names.append(a)
        if fn == "count":
            sel.append(f"CAST(COUNT(*) AS BIGINT) AS {a}")
        elif fn == "sumc":
            sel.append(f"CAST(SUM({cents_sql(c)}) AS BIGINT) AS {a}")
        elif fn == "minc":
            sel.append(f"CAST(MIN({cents_sql(c)}) AS BIGINT) AS {a}")
        else:
            sel.append(f"CAST(MAX({c}) AS BIGINT) AS {a}")
    sql = f"SELECT {', '.join(sel)} FROM {table}"
    if where:
        sql += " WHERE " + " AND ".join(where)
    if group is not None:
        sql += f" GROUP BY {group}"
    return sql


def render_spark(spark, ast):
    table, filters, group, aggs = ast
    df = spark.read.parquet(os.path.join(SF_DIR, table + ".parquet"))
    cents = lambda c: F.round(F.col(c) * 100).cast("long")  # noqa: E731
    ops = {
        "<": "__lt__", "<=": "__le__", ">": "__gt__",
        ">=": "__ge__", "=": "__eq__", "<>": "__ne__",
    }
    for kind, c, op, lit in filters:
        lhs = cents(c) if kind == "cents" else F.col(c)
        df = df.filter(getattr(lhs, ops[op])(F.lit(lit)))
    exprs = []
    for i, (fn, c) in enumerate(aggs):
        a = f"a{i}"
        if fn == "count":
            exprs.append(F.count(F.lit(1)).alias(a))
        elif fn == "sumc":
            exprs.append(F.sum(cents(c)).alias(a))
        elif fn == "minc":
            exprs.append(F.min(cents(c)).alias(a))
        else:
            exprs.append(F.max(F.col(c)).cast("long").alias(a))
    if group is not None:
        return df.groupBy(group).agg(*exprs)
    return df.agg(*exprs)


def norm_rows(df):
    """Order-insensitive row multiset with NULL-safe floats: pandas
    renders SQL NULL as NaN and NaN != NaN, so aggregate-over-empty
    results (MAX of zero rows) would false-positive without this."""
    import math

    key = sorted(df.columns)
    rows = []
    for t in df.reindex(key, axis=1).itertuples(index=False):
        rows.append(
            tuple(
                None if (isinstance(v, float) and math.isnan(v)) else v for v in t
            )
        )
    return sorted(rows, key=repr)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(SF_DIR, t + '.parquet')}'"
        )
    return con


@settings(
    max_examples=30,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(ast=query_ast())
def test_random_query_matches_duckdb(spark, duck, ast):
    sdf = render_spark(spark, ast).toPandas()
    odf = duck.execute(render_sql(ast)).df()
    s, o = norm_rows(sdf), norm_rows(odf)
    assert s == o, f"AST {ast}\nSQL {render_sql(ast)}\nspark={s[:5]} oracle={o[:5]}"


@settings(
    max_examples=20,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(ast=join_ast())
def test_random_join_query_matches_duckdb(spark, duck, ast):
    sdf = render_join_spark(spark, ast).toPandas()
    odf = duck.execute(render_join_sql(ast)).df()
    s, o = norm_rows(sdf), norm_rows(odf)
    assert s == o, f"AST {ast}\nSQL {render_join_sql(ast)}"


@st.composite
def window_ast(draw):
    """Window functions over orders: fn OVER (PARTITION BY part ORDER BY
    o_orderkey) — the unique orderkey makes every ranking
    deterministic."""
    fn = draw(st.sampled_from(["row_number", "rank", "sum", "min", "lag"]))
    part = draw(st.sampled_from(["o_orderstatus", "o_orderpriority", "o_custkey"]))
    filt = draw(st.sampled_from([None] + STR_LITERALS["o_orderstatus"]))
    return fn, part, filt


def render_window_sql(ast) -> str:
    fn, part, filt = ast
    target = cents_sql("o_totalprice")
    expr = {
        "row_number": "row_number() OVER w",
        "rank": "rank() OVER w",
        "sum": f"SUM({target}) OVER w",
        "min": f"MIN({target}) OVER w",
        "lag": f"lag({target}, 1) OVER w",
    }[fn]
    sql = (
        f"SELECT o_orderkey, CAST({expr} AS BIGINT) AS a0 FROM orders"
    )
    if filt:
        sql += f" WHERE o_orderstatus = '{filt}'"
    sql += f" WINDOW w AS (PARTITION BY {part} ORDER BY o_orderkey)"
    return sql


def render_window_spark(spark, ast):
    from pyspark.sql.window import Window

    fn, part, filt = ast
    df = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    if filt:
        df = df.filter(F.col("o_orderstatus") == filt)
    w = Window.partitionBy(part).orderBy("o_orderkey")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    col = {
        "row_number": F.row_number().over(w),
        "rank": F.rank().over(w),
        "sum": F.sum(cents).over(w),
        "min": F.min(cents).over(w),
        "lag": F.lag(cents, 1).over(w),
    }[fn]
    return df.select("o_orderkey", col.cast("long").alias("a0"))


@settings(
    max_examples=20,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(ast=window_ast())
def test_random_window_query_matches_duckdb(spark, duck, ast):
    s = norm_rows(render_window_spark(spark, ast).toPandas())
    o = norm_rows(duck.execute(render_window_sql(ast)).df())
    assert s == o, f"AST {ast}\nSQL {render_window_sql(ast)}"
