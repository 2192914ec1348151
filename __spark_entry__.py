"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query (F6 phone-mining pipeline) on sf0.001.
queries()     — one callable per implemented operator (SURVEY.md §2 +
                training-data extensions), from frontpage_spark.queries.
oracle_sql()  — matching DuckDB SQL for every SQL-expressible query;
                rows-only operators (HTML UDFs, approximate ANN/sketch
                estimates) intentionally have no oracle entry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from frontpage_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["phone_mine_segments"](spark, "/root/testdata/sf0.001")


# Round-5 sample rotation (VERDICT r4 item 2): the driver's
# CORRECTNESS file samples the first 50 registry entries. The r4
# rotation gave 50 never-sampled queries a driver-side hard signal
# (ledger: CORRECTNESS_SAMPLE_r04.md → 101/202 sampled). This round
# leads with the two queries repaired for the driver-canonicalizer
# array-cell trap (VERDICT r4 item 1 — must be green in r5's file),
# then the prepared list of still-unsampled queries. Pure reordering —
# same keys, same callables, full matrix still in
# CORRECTNESS_full_r{N}.json via tools/check.py.
_R5_SAMPLE_ROTATION = [
    # repaired this round — flat schemas, must show green driver-side
    "sources_by_lang", "approx_percentiles_price",
    # prepared round-5 list (CORRECTNESS_SAMPLE_r04.md); the driver
    # takes 50, so the tail past position 50 retires in round 6
    "pq_compression_stats", "dq_orders_report", "pagerank_part_supplier",
    "embedding_centroids", "snapshot_diff_orders", "bigram_xentropy_by_source",
    "bloom_prune_join", "encode_token_ids", "nfc_normalization_stats",
    "ivm_merge_revenue", "regression_price_qty", "iqr_outliers_by_status",
    "cms_heavy_hitters", "balance_bands_by_nation", "nullsafe_join_groups",
    "variant_props_stats", "recursive_ancestor_depths", "small_qty_revenue_q17ish",
    "scd2_user_state", "key_skew_profile", "mad_price_by_status",
    "cohort_retention", "cdc_substring_dups", "kmeans_lloyd_counts",
    "semantic_dedup_report", "unpivot_order_metrics",
    "triangle_count_copurchase", "hashed_ngram_quality_score",
    "try_cast_safety_audit", "bpe_encode_stats", "url_canonicalize_dedup",
    "ntile_analytics_orders", "cube_order_stats",
    "matryoshka_truncation_audit", "minhash_jaccard_estimate",
    "late_supplier_q21ish", "interval_coverage_users", "hard_negative_mining",
    "shingle_containment_pairs", "bm25_keyword_search", "quality_score_auc",
    "cross_source_ngram_overlap", "label_propagation_knn",
    "copurchase_lift_pairs", "order_price_higher_moments",
    "sliding_distinct_users", "rolling_zscore_anomalies", "audio_rms_profile",
    "image_dhash_profile", "order_count_distribution_q13ish",
]


def _rotated(mapping: dict) -> dict:
    head = {n: mapping[n] for n in _R5_SAMPLE_ROTATION if n in mapping}
    return head | {n: v for n, v in mapping.items() if n not in head}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _rotated(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    return _rotated(dict(ORACLES))
