"""Source adapter tests (SURVEY.md §2.1): parquet tables, CSV dims,
text params, bounded pagination."""

from pyspark.sql import functions as F

from frontpage_spark.sources import (
    csv_dimension,
    load_table,
    paginated_scan,
    text_params,
)

SF = "/root/testdata/sf0.001"


def test_load_table_nano_ts(spark):
    ev = load_table(spark, SF, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"  # nanos column converted
    assert ev.count() > 0


def test_csv_dimension(spark, tmp_path):
    p = tmp_path / "dim.csv"
    p.write_text("site_id,city,state\nnyc,New York,NY\nsfo,San Francisco,CA\n")
    df = csv_dimension(spark, str(p))
    assert sorted(r["site_id"] for r in df.collect()) == ["nyc", "sfo"]
    mapped = csv_dimension(spark, str(p), {"site_id": "id", "city": "town"})
    assert mapped.columns == ["id", "town"]


def test_text_params_normalize(spark, tmp_path):
    p = tmp_path / "cities.txt"
    p.write_text("  New York \nnew york\r\nBoston\n\n  \n")
    got = sorted(r["value"] for r in text_params(spark, str(p)).collect())
    assert got == ["boston", "new york"]  # lowered, stripped, deduped, blanks dropped


def test_paginated_scan_stops_on_empty(spark):
    fetched = []

    def fetch(n):
        fetched.append(n)
        if n > 3:  # page 4 is empty → terminate
            return spark.range(0)
        return spark.range(10).select((F.col("id") + n * 100).alias("id"))

    out = paginated_scan(fetch, max_pages=49)
    assert out.count() == 30
    assert fetched == [1, 2, 3, 4]  # stopped at the first empty page


def test_paginated_scan_respects_bound(spark):
    out = paginated_scan(lambda n: spark.range(1), max_pages=5)
    assert out.count() == 5


def test_paginated_scan_all_empty(spark):
    assert paginated_scan(lambda n: spark.range(0), max_pages=5) is None
