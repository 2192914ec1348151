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

# FUZZ_EXAMPLES_MULT=k multiplies every generator's case count
# (eight generators; the periodic deep sweep runs k=3)
_MULT = max(1, int(os.environ.get("FUZZ_EXAMPLES_MULT", "1")))


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
    max_examples=30 * _MULT,
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
    max_examples=20 * _MULT,
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
    max_examples=20 * _MULT,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(ast=window_ast())
def test_random_window_query_matches_duckdb(spark, duck, ast):
    s = norm_rows(render_window_spark(spark, ast).toPandas())
    o = norm_rows(duck.execute(render_window_sql(ast)).df())
    assert s == o, f"AST {ast}\nSQL {render_window_sql(ast)}"


# ---- generator 4: outer joins, NULL keys, aggregate coalescing -------------
# The weak spots VERDICT r3 item 8 names: NULL join keys never match (in
# BOTH engines), outer joins materialize NULLs on the unmatched side, and
# aggregates over those NULLs (COUNT(col) vs COUNT(*), COALESCE(SUM)) are
# where engines classically diverge.

OUTER_JOINS = ["LEFT", "RIGHT", "FULL"]


@st.composite
def outer_join_ast(draw):
    jtype = draw(st.sampled_from(OUTER_JOINS))
    # o_custkey % k == 0 keys become NULL on the left side -> guaranteed
    # unmatched rows plus genuine NULL-key semantics in the join itself
    null_mod = draw(st.sampled_from([None, 2, 3, 7]))
    group = draw(st.sampled_from(["o_orderstatus", "c_mktsegment", None]))
    count_col = draw(st.sampled_from(["c_custkey", "o_orderkey"]))
    filt = draw(st.sampled_from([None, "BUILDING", "MACHINERY"]))
    return jtype, null_mod, group, count_col, filt


def _oj_key_sql(null_mod):
    if null_mod is None:
        return "o_custkey"
    return f"(CASE WHEN o_custkey % {null_mod} = 0 THEN NULL ELSE o_custkey END)"


def render_outer_join_sql(ast) -> str:
    jtype, null_mod, group, count_col, filt = ast
    sel, names = [], []
    if group is not None:
        sel.append(group)
    sel += [
        "CAST(COUNT(*) AS BIGINT) AS a0",
        f"CAST(COUNT({count_col}) AS BIGINT) AS a1",
        f"CAST(COALESCE(SUM({cents_sql('o_totalprice')}), -1) AS BIGINT) AS a2",
        "CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS a3",
    ]
    sql = (
        f"SELECT {', '.join(sel)} FROM orders {jtype} JOIN customer "
        f"ON {_oj_key_sql(null_mod)} = c_custkey"
    )
    if filt is not None:
        # post-join filter on the nullable side: NULL <> 'X' is UNKNOWN ->
        # dropped, which silently turns LEFT into INNER — exactly the
        # coalescing trap this generator exists to cross-check
        sql += f" WHERE c_mktsegment IS NULL OR c_mktsegment <> '{filt}'"
    if group is not None:
        sql += f" GROUP BY {group}"
    return sql


def render_outer_join_spark(spark, ast):
    jtype, null_mod, group, count_col, filt = ast
    o = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    c = spark.read.parquet(os.path.join(SF_DIR, "customer.parquet"))
    if null_mod is None:
        key = F.col("o_custkey")
    else:
        key = F.when(F.col("o_custkey") % null_mod == 0, F.lit(None)).otherwise(
            F.col("o_custkey")
        )
    df = o.join(c, key == F.col("c_custkey"), jtype.lower())
    if filt is not None:
        df = df.filter(
            F.col("c_mktsegment").isNull() | (F.col("c_mktsegment") != filt)
        )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    aggs = [
        F.count(F.lit(1)).alias("a0"),
        F.count(count_col).alias("a1"),
        F.coalesce(F.sum(cents), F.lit(-1)).alias("a2"),
        F.sum(F.col("c_custkey").isNull().cast("long")).alias("a3"),
    ]
    return df.groupBy(group).agg(*aggs) if group is not None else df.agg(*aggs)


@settings(
    max_examples=60 * _MULT,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(ast=outer_join_ast())
def test_random_outer_join_matches_duckdb(spark, duck, ast):
    s = norm_rows(render_outer_join_spark(spark, ast).toPandas())
    o = norm_rows(duck.execute(render_outer_join_sql(ast)).df())
    assert s == o, f"AST {ast}\nSQL {render_outer_join_sql(ast)}"


# ---- generator 5: window FRAMES — ROWS vs RANGE ----------------------------
# ROWS frames are only deterministic under a UNIQUE ordering (tie order
# decides membership), so ROWS orders by o_orderkey; RANGE frames include
# ALL peers of the boundary value, so RANGE deliberately orders by the
# non-unique o_custkey — the case where ROWS and RANGE genuinely differ
# and where an engine that conflates them gets caught.

FRAME_FNS = ["sum", "min", "max", "count"]


@st.composite
def frame_ast(draw):
    fn = draw(st.sampled_from(FRAME_FNS))
    mode = draw(st.sampled_from(["ROWS", "RANGE"]))
    lo = draw(st.sampled_from(["UNBOUNDED", 0, 1, 3, 10]))
    hi = draw(st.sampled_from(["CURRENT", 1, 5]))
    part = draw(st.sampled_from(["o_orderstatus", "o_orderpriority"]))
    return fn, mode, lo, hi, part


def _frame_bounds_sql(lo, hi) -> str:
    lo_s = "UNBOUNDED PRECEDING" if lo == "UNBOUNDED" else f"{lo} PRECEDING"
    if lo == 0:
        lo_s = "CURRENT ROW"
    hi_s = "CURRENT ROW" if hi == "CURRENT" else f"{hi} FOLLOWING"
    return f"BETWEEN {lo_s} AND {hi_s}"


def render_frame_sql(ast) -> str:
    fn, mode, lo, hi, part = ast
    order = "o_orderkey" if mode == "ROWS" else "o_custkey"
    target = cents_sql("o_totalprice")
    expr = {
        "sum": f"SUM({target})",
        "min": f"MIN({target})",
        "max": f"MAX({target})",
        "count": "COUNT(*)",
    }[fn]
    return (
        f"SELECT o_orderkey, CAST({expr} OVER w AS BIGINT) AS a0 FROM orders "
        f"WINDOW w AS (PARTITION BY {part} ORDER BY {order} "
        f"{mode} {_frame_bounds_sql(lo, hi)})"
    )


def render_frame_spark(spark, ast):
    from pyspark.sql.window import Window

    fn, mode, lo, hi, part = ast
    order = "o_orderkey" if mode == "ROWS" else "o_custkey"
    df = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    lo_v = Window.unboundedPreceding if lo == "UNBOUNDED" else -int(lo)
    hi_v = Window.currentRow if hi == "CURRENT" else int(hi)
    w = Window.partitionBy(part).orderBy(order)
    w = w.rowsBetween(lo_v, hi_v) if mode == "ROWS" else w.rangeBetween(lo_v, hi_v)
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    col = {
        "sum": F.sum(cents),
        "min": F.min(cents),
        "max": F.max(cents),
        "count": F.count(F.lit(1)),
    }[fn]
    return df.select("o_orderkey", col.over(w).cast("long").alias("a0"))


@settings(
    max_examples=60 * _MULT,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(ast=frame_ast())
def test_random_window_frame_matches_duckdb(spark, duck, ast):
    s = norm_rows(render_frame_spark(spark, ast).toPandas())
    o = norm_rows(duck.execute(render_frame_sql(ast)).df())
    assert s == o, f"AST {ast}\nSQL {render_frame_sql(ast)}"


# ---- generator 6: decimal/double boundary casts ----------------------------
# Exercises the repo's cross-engine numeric CONVENTIONS (cents-bigint,
# decimal(38,x) accumulators, round-then-compare) over random expression
# chains — the layer every hand-written oracle pair depends on. Raw
# double->int casts are deliberately excluded: Spark truncates where
# DuckDB rounds, which is why the conventions exist.

CAST_EXPRS = [
    # (name, duckdb SQL over col c, spark Column fn)
    ("cents", lambda c: f"CAST(round({c} * 100) AS BIGINT)",
     lambda c: F.round(F.col(c) * 100).cast("long")),
    ("floor_units", lambda c: f"CAST(floor({c}) AS BIGINT)",
     lambda c: F.floor(F.col(c)).cast("long")),
    ("ceil_units", lambda c: f"CAST(ceil({c}) AS BIGINT)",
     lambda c: F.ceil(F.col(c)).cast("long")),
    ("dec38_sq", lambda c: f"CAST(round({c} * 100) AS HUGEINT) * CAST(round({c} * 100) AS BIGINT)",
     lambda c: F.round(F.col(c) * 100).cast("decimal(38,0)") * F.round(F.col(c) * 100).cast("long")),
    ("neg_abs", lambda c: f"-abs(CAST(round({c} * 100) AS BIGINT))",
     lambda c: -F.abs(F.round(F.col(c) * 100).cast("long"))),
]

CAST_AGGS = ["sum", "min", "max"]


@st.composite
def cast_ast(draw):
    table = draw(st.sampled_from(["orders", "customer", "lineitem"]))
    cents_cols = [c for c, k in TABLES[table] if k == "cents"]
    col = draw(st.sampled_from(cents_cols))
    expr_i = draw(st.integers(0, len(CAST_EXPRS) - 1))
    agg = draw(st.sampled_from(CAST_AGGS))
    group = draw(st.sampled_from([c for c, k in TABLES[table] if k == "str"] + [None]))
    return table, col, expr_i, agg, group


def render_cast_sql(ast) -> str:
    table, col, expr_i, agg, group = ast
    _, sql_fn, _ = CAST_EXPRS[expr_i]
    inner = sql_fn(col)
    sel, tail = [], ""
    if group is not None:
        sel.append(group)
        tail = f" GROUP BY {group}"
    # HUGEINT sums need the final BIGINT cast (fits: cents^2 sums at
    # sf0.001 stay under 2^63) — same convention as the real oracles
    sel.append(f"CAST({agg.upper()}({inner}) AS BIGINT) AS a0")
    return f"SELECT {', '.join(sel)} FROM {table}{tail}"


def render_cast_spark(spark, ast):
    table, col, expr_i, agg, group = ast
    _, _, col_fn = CAST_EXPRS[expr_i]
    df = spark.read.parquet(os.path.join(SF_DIR, table + ".parquet"))
    inner = col_fn(col)
    a = {"sum": F.sum, "min": F.min, "max": F.max}[agg](inner).cast("long").alias("a0")
    return df.groupBy(group).agg(a) if group is not None else df.agg(a)


@settings(
    max_examples=60 * _MULT,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(ast=cast_ast())
def test_random_cast_chain_matches_duckdb(spark, duck, ast):
    s = norm_rows(render_cast_spark(spark, ast).toPandas())
    o = norm_rows(duck.execute(render_cast_sql(ast)).df())
    assert s == o, f"AST {ast}\nSQL {render_cast_sql(ast)}"


# --------------------------------------------------------------------------
# generator 7: global_prefix_stats vs SQL window functions
# --------------------------------------------------------------------------
# The range-partitioned two-pass rank/prefix-sum helper (round 6) is
# core infrastructure — five registry queries ride it. Fuzz it directly:
# random total orders (1-2 columns, random asc/desc, unique key
# tiebreak), a random running-sum column (ints exact; cents as
# round(x*100) BIGINT), random partition widths, and optionally the
# arithmetic ntile — all compared against DuckDB's window functions.

_PREFIX_KEYS = {"orders": "o_orderkey", "customer": "c_custkey"}


@st.composite
def prefix_ast(draw):
    table = draw(st.sampled_from(["orders", "customer"]))
    key = _PREFIX_KEYS[table]
    cand = [c for c, k in TABLES[table] if c != key]
    n_order = draw(st.integers(1, 2))
    order = draw(
        st.lists(st.sampled_from(cand), min_size=n_order, max_size=n_order, unique=True)
    )
    dirs = [draw(st.booleans()) for _ in order]  # True = DESC
    sum_col, sum_kind = draw(
        st.sampled_from([(c, k) for c, k in TABLES[table] if k in ("int", "cents")])
    )
    nt = draw(st.sampled_from([None, 2, 5, 7]))
    n_parts = draw(st.sampled_from([None, 3, 13]))
    # optionally lead the order with a synthetic double key mixing NaN,
    # NULL, and heavy duplicates — pins the driver comparator's Spark
    # float total order (NaN == NaN, NaN above all doubles; ADVICE r7)
    nan_dir = draw(st.sampled_from([None, "asc", "desc"]))
    return table, key, order, dirs, sum_col, sum_kind, nt, n_parts, nan_dir


def _nan_case_sql(key: str) -> str:
    return (
        f"CASE WHEN {key} % 11 = 0 THEN CAST('NaN' AS DOUBLE) "
        f"WHEN {key} % 7 = 0 THEN NULL "
        f"ELSE CAST({key} % 5 AS DOUBLE) END"
    )


def render_prefix_sql(ast) -> str:
    table, key, order, dirs, sum_col, sum_kind, nt, _, nan_dir = ast
    order_sql = ", ".join(
        f"{c} {'DESC' if d else 'ASC'}" for c, d in zip(order, dirs)
    ) + f", {key} ASC"
    src = table
    if nan_dir is not None:
        # DuckDB defaults to NULLS LAST on ASC; Spark to NULLS FIRST —
        # spell Spark's placement explicitly (DuckDB agrees on NaN:
        # greater than every other double, equal to itself)
        lead = "__nk DESC NULLS LAST" if nan_dir == "desc" else "__nk ASC NULLS FIRST"
        order_sql = f"{lead}, {order_sql}"
        src = f"(SELECT *, {_nan_case_sql(key)} AS __nk FROM {table})"
    sval = cents_sql(sum_col) if sum_kind == "cents" else sum_col
    sel = [
        f"{key} AS k",
        f"CAST(row_number() OVER (ORDER BY {order_sql}) AS BIGINT) AS rn",
        f"CAST(SUM({sval}) OVER (ORDER BY {order_sql}"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum",
    ]
    if nt is not None:
        sel.append(f"CAST(ntile({nt}) OVER (ORDER BY {order_sql}) AS BIGINT) AS t")
    return f"SELECT {', '.join(sel)} FROM {src}"


def render_prefix_spark(spark, ast):
    from frontpage_spark.plans import global_prefix_stats, ntile_from_rn

    table, key, order, dirs, sum_col, sum_kind, nt, n_parts, nan_dir = ast
    df = spark.read.parquet(os.path.join(SF_DIR, table + ".parquet"))
    sval = (
        F.round(F.col(sum_col) * 100).cast("long")
        if sum_kind == "cents"
        else F.col(sum_col)
    )
    base = df.select(F.col(key), *[F.col(c) for c in order], sval.alias("__s"))
    order_exprs = [
        (F.col(c), "desc") if d else F.col(c) for c, d in zip(order, dirs)
    ] + [F.col(key)]
    if nan_dir is not None:
        base = base.withColumn("__nk", F.expr(_nan_case_sql(key)))
        lead = (F.col("__nk"), "desc") if nan_dir == "desc" else F.col("__nk")
        order_exprs = [lead] + order_exprs
    t: dict = {}
    out = global_prefix_stats(
        base, order_exprs, sums={"__s": "cum"}, rn_col="rn", n_parts=n_parts, totals=t
    )
    sel = [
        F.col(key).alias("k"),
        F.col("rn"),
        F.col("cum").cast("long").alias("cum"),
    ]
    if nt is not None:
        sel.append(ntile_from_rn(F.col("rn"), nt, t["rn"]).alias("t"))
    return out.select(*sel)


@settings(
    max_examples=20 * _MULT,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(ast=prefix_ast())
def test_random_prefix_stats_matches_duckdb(spark, duck, ast):
    s = norm_rows(render_prefix_spark(spark, ast).toPandas())
    o = norm_rows(duck.execute(render_prefix_sql(ast)).df())
    assert s == o, f"AST {ast}\nSQL {render_prefix_sql(ast)}\nspark={s[:3]} oracle={o[:3]}"


# --------------------------------------------------------------------------
# generator 8: chunk_documents vs DuckDB list_slice windows
# --------------------------------------------------------------------------
# Overlapping word-window chunking across RANDOM (size, stride) configs,
# with NULL and empty text injected — pins the start-offset arithmetic,
# the ragged tail, and the NULL→empty-doc contract (ADVICE r7) far
# beyond the single default-config oracle.

_DOCS_PARQUET = os.path.join(SF_DIR, "documents.parquet")


@st.composite
def chunk_ast(draw):
    size = draw(st.integers(1, 80))
    stride = draw(st.integers(1, size))
    return size, stride


def render_chunk_sql(ast) -> str:
    size, stride = ast
    return f"""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN doc_id % 13 = 0 THEN NULL ELSE text END AS text
      FROM '{_DOCS_PARQUET}' WHERE doc_id % 7 = 0
    ),
    w AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS t FROM d),
    idx AS (
      SELECT doc_id, t,
             unnest(generate_series(1, greatest(len(t) - 1, 0) + 1, {stride})) AS s
      FROM w
    )
    SELECT doc_id,
           CAST((s - 1) / {stride} AS BIGINT) AS chunk_idx,
           array_to_string(list_slice(t, s, s + {size} - 1), ' ') AS chunk_text,
           CAST(least({size}, len(t) - s + 1) AS BIGINT) AS n_words
    FROM idx
    """


def render_chunk_spark(spark, ast):
    from frontpage_spark.ext.prep import chunk_documents

    size, stride = ast
    docs = (
        spark.read.parquet(_DOCS_PARQUET)
        .filter(F.col("doc_id") % 7 == 0)
        .withColumn(
            "text",
            F.when(F.col("doc_id") % 13 == 0, F.lit(None).cast("string")).otherwise(
                F.col("text")
            ),
        )
    )
    out = chunk_documents(docs, size=size, stride=stride)
    return out.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        "chunk_text",
        F.col("n_words").cast("long").alias("n_words"),
    )


@settings(
    max_examples=15 * _MULT,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(ast=chunk_ast())
def test_random_chunking_matches_duckdb(spark, duck, ast):
    s = norm_rows(render_chunk_spark(spark, ast).toPandas())
    o = norm_rows(duck.execute(render_chunk_sql(ast)).df())
    assert s == o, f"AST {ast}\nspark={s[:2]} oracle={o[:2]}"
