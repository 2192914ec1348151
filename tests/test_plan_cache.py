"""Prepared-plan cache (round-5, extended r11): pure builds are reused
per (application, sf_dir, name); builds that execute Spark jobs
self-exclude, so their per-call work stays real. Builds that register
plans.keep() frames ARE cached (r11): the kept frames are remembered
with the plan and re-persist()ed on every hit, restoring the
CacheManager registration a clearCache() dropped — the data is still
recomputed per action. Also covers the round-5 session/jdbc hardening:
BLAS pinning conf and SQL identifier validation."""

import pytest

from frontpage_spark import plans
from frontpage_spark.queries import QUERIES, _QPLAN_CACHE
from .conftest import SF_DIR


def _cache_names():
    return {k[2] for k in _QPLAN_CACHE}


def test_pure_query_is_cached_and_reused(spark):
    # second build is pure (first may pay table first-touch jobs)
    QUERIES["group_counts_q1"](spark, SF_DIR)
    df1 = QUERIES["group_counts_q1"](spark, SF_DIR)
    assert "group_counts_q1" in _cache_names()
    df2 = QUERIES["group_counts_q1"](spark, SF_DIR)
    assert df2 is df1  # the exact prepared plan is handed back
    # and it still executes correctly on reuse
    assert df2.count() == df1.count() > 0


def test_driver_loop_query_never_cached(spark):
    # bpe_train_merges runs its training loop (argmax collects) at
    # build time — caching it would skip real execution on repeat
    # calls. (pagerank used to be the probe here, but its build became
    # pure — metadata-gated single-job plan — so it is now cacheable.)
    QUERIES["bpe_train_merges"](spark, SF_DIR)
    QUERIES["bpe_train_merges"](spark, SF_DIR)
    assert "bpe_train_merges" not in _cache_names()
    # pagerank's build is job-free and therefore cached
    QUERIES["pagerank_part_supplier"](spark, SF_DIR)
    QUERIES["pagerank_part_supplier"](spark, SF_DIR)
    assert "pagerank_part_supplier" in _cache_names()


def test_keep_using_query_cached_with_relink(spark):
    # near_dup_verified registers keep() frames; its build runs zero
    # jobs, so the plan is cached (r11) and every hit re-persist()s the
    # kept frames — without the re-link, a clearCache() between calls
    # would silently drop the shared-stage sharing
    n1 = QUERIES["near_dup_verified"](spark, SF_DIR).count()
    df1 = QUERIES["near_dup_verified"](spark, SF_DIR)
    assert "near_dup_verified" in _cache_names()
    spark.catalog.clearCache()  # kills the persist registration
    df2 = QUERIES["near_dup_verified"](spark, SF_DIR)
    assert df2 is df1  # the exact prepared plan is handed back
    key = next(k for k in _QPLAN_CACHE if k[2] == "near_dup_verified")
    kept = _QPLAN_CACHE[key][1]
    # the hit re-registered every kept frame in the live FIFO
    assert kept
    assert all(any(k is f for f in plans._KEPT) for k in kept)
    # and the reused plan still computes the same result from parquet
    assert df2.count() == n1 > 0
    plans.release_kept()


def test_cache_keyed_by_sf_dir(spark):
    a = QUERIES["global_minmax"](spark, SF_DIR)
    a = QUERIES["global_minmax"](spark, SF_DIR)  # cached build
    b = QUERIES["global_minmax"](spark, "/root/testdata/sf0.01")
    b = QUERIES["global_minmax"](spark, "/root/testdata/sf0.01")
    assert a is not b


def test_keep_lru_touch():
    # re-keep()ing the same frame must move it to the young end, not
    # double-register it (ADVICE r4)
    class FakeDF:
        def __init__(self):
            self.persists = 0
            self.unpersists = 0

        def persist(self):
            self.persists += 1
            return self

        def unpersist(self):
            self.unpersists += 1
            return self

    old_kept, old_max = plans._KEPT[:], plans._KEPT_MAX
    plans._KEPT.clear()
    try:
        plans._KEPT_MAX = 3
        hot = FakeDF()
        plans.keep(hot)
        fillers = [FakeDF() for _ in range(2)]
        for f in fillers:
            plans.keep(f)
        plans.keep(hot)  # LRU touch — must NOT evict anything
        assert hot.unpersists == 0
        assert len(plans._KEPT) == 3
        assert plans._KEPT[-1] is hot
        # one more registration now evicts the OLDEST filler, not hot
        plans.keep(FakeDF())
        assert hot.unpersists == 0
        assert fillers[0].unpersists == 1
    finally:
        plans._KEPT[:] = old_kept
        plans._KEPT_MAX = old_max


def test_blas_pin_exported_to_executors(spark):
    assert spark.conf.get("spark.executorEnv.OPENBLAS_NUM_THREADS") == "1"
    assert spark.conf.get("spark.executorEnv.OMP_NUM_THREADS") == "1"


def test_jdbc_identifier_validation():
    from frontpage_spark.jdbc import _check_ident, _pg_quote, pg_insert_on_conflict_sql

    assert _check_ident("ads_raw") == "ads_raw"
    assert _check_ident("app.ads_raw") == "app.ads_raw"
    for bad in ('ads"; DROP TABLE x; --', "a b", 'x"y', "1tab", ""):
        with pytest.raises(ValueError):
            _check_ident(bad)
    assert _pg_quote('we"ird') == '"we""ird"'
    sql = pg_insert_on_conflict_sql("t", ["a", 'b"c'], key="k")
    assert '"b""c"' in sql and 'ON CONFLICT ("k") DO NOTHING' in sql
