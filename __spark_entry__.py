"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query (F6 phone-mining pipeline) on sf0.001.
queries()     — one callable per implemented operator (SURVEY.md §2 +
                training-data extensions), from frontpage_spark.queries.
oracle_sql()  — matching DuckDB SQL for EVERY query (since round 8 the
                registry has zero rows-only entries: the approximate
                retrievals are deterministic given their seeded
                planes/codebooks, so the oracle replays them exactly).
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


# Round-10 sample rotation: the driver's CORRECTNESS file samples the
# first 50 registry entries. The ledger closed in round 7 (every
# registry entry has carried a driver-side hard signal at least once),
# so the head leads with every query whose PLAN or SEMANTICS changed
# this round, then a cross-section of heavies. Pure reordering — same
# keys, same callables, full matrix still in CORRECTNESS_full_r{N}.json
# via tools/check.py.
_R10_SAMPLE_ROTATION = [
    # --- NEW r10: the forced over-gate branch of the size-gated
    # sessionize (bounded-partition stitch; the default entry now takes
    # the classic single-window path at every local SF)
    "sessionize_users_stitch",
    # --- plan/semantics changed r10: size-gated sessionize (classic
    # below the gate), null-ts branch added to the stitch; dup_clusters
    # pair discovery re-fanned after the organic-sf1 8-thread collapse;
    # jsonl feed oracle's UBIGINT range guard + new overflow fixture line
    "sessionize_users", "dup_clusters", "dedup_keep_best",
    "jsonl_feed_channels",
    # --- re-verification cross-section: heavies + core paths
    "html_extraction_golden", "html_clean_projection",
    "clean_derivation_layer", "clean_projection_urls",
    "rfm_segments", "peak_concurrent_sessions", "kcenter_diverse_seeds",
    "embedding_knn_lsh", "embedding_knn_ivf", "token_budget_selection",
    "minhash_lsh_candidates", "near_dup_verified",
    "embedding_near_dup", "embedding_near_dup_lsh",
    "semantic_dedup_report", "pagerank_part_supplier",
    "prefix_filtered_jaccard", "bpe_train_merges", "kmeans_lloyd_counts",
    "phone_mine_segments", "url_parse_tokens", "group_counts_q1",
    "incremental_delta_scan", "conform_temporal", "conform_referential",
    "session_window_stats", "tumbling_window_counts",
    "dedup_exact", "simhash_buckets", "cdc_substring_dups",
    "benchmark_contamination", "split_leakage_audit",
    "tfidf_top_terms", "bm25_keyword_search", "quality_filter_funnel",
    "stream_near_dup_batch_core", "stream_near_dup_tiebreak_core",
    "stateful_type_counts_batch", "ann_recall_eval",
    "semantic_decontamination", "image_dhash_near_dup",
    "video_scene_changes", "multimodal_decode",
]


def _rotated(mapping: dict) -> dict:
    head = {n: mapping[n] for n in _R10_SAMPLE_ROTATION if n in mapping}
    return head | {n: v for n, v in mapping.items() if n not in head}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _rotated(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    return _rotated(dict(ORACLES))
