"""Physical-plan assertions: salting correctness, bucketed joins run
shuffle-free."""

import pytest
from pyspark.sql import functions as F

from frontpage_spark.plans import bucketed_table, count_exchanges, salted_join, write_bucketed


def test_salted_join_matches_plain_join(spark):
    # one monster key (0) + a uniform tail
    left = spark.range(0, 2000).select(
        F.when(F.col("id") < 1000, 0).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.createDataFrame([(0, "hot"), (1500, "cold")], ["k", "tag"])
    plain = left.join(right, "k").select("k", "v", "tag")
    salted = salted_join(left, right, "k", n_salt=4).select("k", "v", "tag")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_spreads_hot_key(spark):
    left = spark.range(0, 1000).select(F.lit(0).alias("k"), F.col("id").alias("v"))
    right = spark.createDataFrame([(0, "x")], ["k", "tag"])
    out = salted_join(left, right, "k", n_salt=8)
    # the single hot key now occupies several distinct salt partitions
    from frontpage_spark.plans import SALT_COL

    salt = F.pmod(F.xxhash64(*[F.col(c) for c in ["k", "v"]]), F.lit(8))
    n_salts = left.withColumn(SALT_COL, salt).select(SALT_COL).distinct().count()
    assert n_salts >= 4
    assert out.count() == 1000


def test_bucketed_join_no_shuffle(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        a = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("a"))
        b = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("b"))
        write_bucketed(a, "bkt_a", "k", n_buckets=4)
        write_bucketed(b, "bkt_b", "k", n_buckets=4)
        joined = bucketed_table(spark, "bkt_a").join(bucketed_table(spark, "bkt_b"), "k")
        assert joined.count() == 1000
        assert count_exchanges(joined) == 0  # bucketing replaced the shuffle
        # same key aggregation is also exchange-free
        agg = bucketed_table(spark, "bkt_a").groupBy("k").agg(F.sum("a").alias("s"))
        agg.collect()
        assert count_exchanges(agg) == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_write_partitioned_prunes(spark, tmp_path):
    """Partition-column filters prune directories in the scan
    (PartitionFilters), the first-line pruning for date-partitioned
    fact tables."""
    from frontpage_spark.plans import write_partitioned

    df = spark.createDataFrame(
        [(i, f"2024-01-{(i % 3) + 1:02d}", i * 1.0) for i in range(30)],
        ["id", "day", "v"],
    )
    path = str(tmp_path / "part")
    write_partitioned(df, path, "day")
    back = spark.read.parquet(path).filter(F.col("day") == "2024-01-02")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # the day predicate lands in PartitionFilters (directory pruning),
    # NOT in PushedFilters (row-group pruning after the read starts)
    pf = next(line for line in plan.splitlines() if "PartitionFilters" in line)
    assert "2024-01-02" in pf
    assert back.count() == 10


def test_compact_small_files(spark, tmp_path):
    """Compaction rewrites a many-file sink into few files with identical
    data (the streaming-sink maintenance op)."""
    import glob

    from frontpage_spark.plans import compact

    path = str(tmp_path / "sink")
    # simulate 5 micro-batch appends of 8 partitions each -> 40 files
    for i in range(5):
        spark.range(i * 100, (i + 1) * 100).repartition(8).write.mode("append").parquet(path)
    before = len(glob.glob(path + "/*.parquet"))
    assert before >= 40
    total_before = spark.read.parquet(path).agg(F.sum("id")).collect()[0][0]
    n_after = compact(spark, path)
    assert n_after < before and n_after >= 1
    assert spark.read.parquet(path).agg(F.sum("id")).collect()[0][0] == total_before
    assert spark.read.parquet(path).count() == 500
