"""Driver-contract smoke tests: entry() returns rows; every oracle key
has a query; queries run at sf0.001."""

import __spark_entry__ as entry_mod


def test_contract_shape():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 25
    assert set(oracles) <= set(qs)
    # the rows-only set is intentional and small
    # r5 graduated kcore/pq/cms to full oracles; r6 graduated the
    # approx family (approx_distinct_users, approx_percentiles_price,
    # hll_sketch_union_users) to within-tolerance bound-check oracles;
    # r7 graduated ann_recall_eval (above_floor booleans) and gave the
    # HTML UDF a golden-fixture hash signal (html_extraction_golden);
    # r8 graduated html_clean_projection (golden-corpus 17-col composed
    # oracle) and finally both approximate kNN rankings — their
    # "approximation" is recall vs brute force, not nondeterminism, so
    # DuckDB replays the md5-parity LSH planes / sampled-centroid IVF
    # retrieval exactly. EVERY registry entry now has a full oracle.
    rows_only = set(qs) - set(oracles)
    assert rows_only == set()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"c_mktsegment", "n_phones", "n_distinct_phones", "min_phone"} == set(df.columns)
