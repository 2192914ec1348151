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


# Round-4 sample rotation (VERDICT r3 item 5): the driver's
# CORRECTNESS file samples the first 50 registry entries, so rounds
# 1-3 always sampled the same head and 148 queries never got a
# driver-side hard signal. This round the dict leads with 50 queries
# NO driver file has sampled yet (judge-priority round-3 additions
# first); the rest follow in registration order. Pure reordering —
# same keys, same callables, full matrix still in
# CORRECTNESS_full_r{N}.json via tools/check.py.
_R4_SAMPLE_ROTATION = [
    "bpe_train_merges", "prefix_filtered_jaccard", "image_dhash_near_dup",
    "split_leakage_audit", "kcenter_diverse_seeds", "embedding_near_dup_lsh",
    "semantic_decontamination", "incremental_corpus_dedup",
    "near_dup_verified", "revenue_topn_q3ish", "regional_revenue_q5ish",
    "quality_filter_funnel", "gap_fill_daily_events", "mom_revenue_change",
    "levenshtein_block_pairs", "kmeans_assign_counts", "tfidf_top_terms",
    "multimodal_frames", "sliding_window_counts", "locf_daily_value",
    "order_price_histogram", "ann_recall_eval", "pii_scrub_stats",
    "token_frequency_spectrum", "repetition_ratio_by_source", "dup_clusters",
    "dedup_keep_best", "session_window_stats", "order_price_moments",
    "latest_order_per_customer", "sources_by_lang", "grouping_sets_revenue",
    "unpivot_status_counts", "chunk_documents", "pack_sequences",
    "oov_rate_topk_vocab", "source_mixture_weights", "benchmark_contamination",
    "rolling_7d_revenue", "conversion_funnel", "boilerplate_token_prune",
    "zorder_bucket_stats", "merge_upsert_counts", "approx_percentiles_price",
    "weighted_sample_docs", "event_transition_counts", "profile_orders_columns",
    "peak_concurrent_sessions", "price_qty_correlation",
    "equidepth_price_deciles",
]


def _rotated(mapping: dict) -> dict:
    head = {n: mapping[n] for n in _R4_SAMPLE_ROTATION if n in mapping}
    return head | {n: v for n, v in mapping.items() if n not in head}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _rotated(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    return _rotated(dict(ORACLES))
