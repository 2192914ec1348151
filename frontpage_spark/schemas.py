"""Schemas for the engine's data model (SURVEY.md §1).

Reference mapping (citations are to /root/reference):
- RAW_AD_SCHEMA   mirrors the JSON ad record built in scraper.py:94-102
                  and the backpage_raw table scraper.py:153-156.
- CLEAN_SCHEMA    mirrors the 17-column typed table etl_process.py:271-289
                  (columns listed alphabetically — the reference binds
                  INSERT values by sorted key, etl_process.py:329; we bind
                  by *name*, the order here is documentation).
- SITE_MAP_SCHEMA mirrors params/URLs.csv (etl_process.py:185-200).

The clean layer keeps Spark-native types internally: multi-valued fields
(`phone`, `other_ads`) are ArrayType(String) and are flattened with
``array_join(x, ';')`` only at the reference-compatibility boundary
(SURVEY.md §1.2); failure values are NULL internally and become '' only
through ``functions.empty_on_null`` (SURVEY.md §1.4).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Raw ad record: {scrape_date, code, url, read, uniq_id}  (scraper.py:97-100,205)
AD_STRUCT = T.StructType(
    [
        T.StructField("scrape_date", T.StringType()),  # 'yyyy-MM-dd HH:mm:ss'
        T.StructField("code", T.IntegerType()),
        T.StructField("url", T.StringType()),
        T.StructField("read", T.StringType()),  # raw HTML
        T.StructField("uniq_id", T.StringType()),
    ]
)

# backpage_raw(id SERIAL, uniq_id VARCHAR UNIQUE, ad JSONB)  (scraper.py:153-156)
RAW_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("uniq_id", T.StringType(), nullable=False),
        T.StructField("ad", AD_STRUCT),
    ]
)

# Native (internal) clean schema: arrays stay arrays, dates stay timestamps.
CLEAN_NATIVE_SCHEMA = T.StructType(
    [
        T.StructField("ad_id", T.StringType()),
        T.StructField("ad_url", T.StringType()),
        T.StructField("category", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("division", T.StringType()),
        T.StructField("locations", T.StringType()),
        T.StructField("other_ads", T.ArrayType(T.StringType())),
        T.StructField("phone", T.ArrayType(T.StringType())),
        T.StructField("post_body", T.StringType()),
        T.StructField("post_date", T.TimestampType()),
        T.StructField("post_title", T.StringType()),
        T.StructField("poster_age", T.StringType()),
        T.StructField("region", T.StringType()),
        T.StructField("scrape_date", T.TimestampType()),
        T.StructField("site_id", T.StringType()),
        T.StructField("state", T.StringType()),
        T.StructField("uniq_id", T.StringType(), nullable=False),
    ]
)

# Reference-compatible export schema: everything VARCHAR except the two
# timestamps, ';'-joined arrays, '' instead of NULL  (etl_process.py:271-289).
CLEAN_COMPAT_COLUMNS = [f.name for f in CLEAN_NATIVE_SCHEMA.fields]

SITE_MAP_SCHEMA = T.StructType(
    [
        T.StructField("site_id", T.StringType(), nullable=False),
        T.StructField("city", T.StringType()),
        T.StructField("state", T.StringType()),
        T.StructField("region", T.StringType()),
        T.StructField("division", T.StringType()),
        T.StructField("url", T.StringType()),
    ]
)

# Driver testdata tables (TESTDATA.md / FIXTURES.md §B).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
