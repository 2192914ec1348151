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


# Round-7 sample rotation (VERDICT r6 item 2 — retire the ledger): the
# driver's CORRECTNESS file samples the first 50 registry entries.
# Rounds 1-6 sampled 200 distinct queries; exactly 13 oracle-checked
# entries have never had a driver-side hard signal — the 5 spilled from
# the r6 rotation plus the 8 queries registered new in round 6
# (CORRECTNESS_SAMPLE_r06.md). They lead this head, so after this round
# EVERY registry entry has been driver-sampled at least once. The rest
# of the head re-verifies the queries whose PLANS changed this round
# (the global_prefix_stats family re-engineered off the eager
# localCheckpoint — VERDICT r6 item 1) plus a cross-section of heavies.
# Pure reordering — same keys, same callables, full matrix still in
# CORRECTNESS_full_r{N}.json via tools/check.py.
_R7_SAMPLE_ROTATION = [
    # --- the 13 never-sampled (5 spilled from r6 + 8 new in r6)
    "ship_delay_priority_q12ish", "supplier_variety_q16ish",
    "top_supplier_q15ish", "weekday_seasonality", "winsorize_prices",
    "stream_near_dup_batch_core", "stateful_type_counts_batch",
    "gopher_quality_flags", "token_budget_selection",
    "shingle_novelty_by_source", "sequence_packing_stats",
    "vocab_growth_by_decile", "video_scene_changes",
    # --- registered new in round 7 (oracle-bearing from birth)
    "html_extraction_golden", "ann_recall_eval",
    "stream_near_dup_tiebreak_core", "chunking_stats",
    "blocklist_filter_stats",
    # --- plans changed this round: global_prefix_stats consumers
    # (deterministic sampled-boundary buckets, no localCheckpoint)
    "rfm_segments", "ntile_analytics_orders", "pareto_8020_customers",
    "peak_concurrent_sessions", "dense_ids_documents",
    # --- re-verification cross-section: heavies + core paths
    "minhash_lsh_candidates", "near_dup_verified", "dup_clusters",
    "embedding_near_dup", "embedding_near_dup_lsh",
    "semantic_dedup_report", "pagerank_part_supplier",
    "prefix_filtered_jaccard", "bpe_train_merges", "kmeans_lloyd_counts",
    "phone_mine_segments", "url_parse_tokens", "group_counts_q1",
    "incremental_delta_scan", "conform_temporal", "conform_referential",
    "sessionize_users", "session_window_stats", "tumbling_window_counts",
    "dedup_exact", "simhash_buckets", "cdc_substring_dups",
    "benchmark_contamination", "split_leakage_audit",
    "tfidf_top_terms", "bm25_keyword_search", "quality_filter_funnel",
]


def _rotated(mapping: dict) -> dict:
    head = {n: mapping[n] for n in _R7_SAMPLE_ROTATION if n in mapping}
    return head | {n: v for n, v in mapping.items() if n not in head}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _rotated(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    return _rotated(dict(ORACLES))
