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


# Round-6 sample rotation (VERDICT r5 item 2): the driver's
# CORRECTNESS file samples the first 50 registry entries. Ledger:
# rounds 1-5 sampled 150 distinct queries; 55 oracle-checked entries
# have never had a driver-side hard signal. This head is 50 of them —
# all with full DuckDB oracles (the r5 'rows-only in the head' slot
# waste cannot recur: the approx family graduated to bound-check
# oracles this round) — leading with the queries this round repaired
# (global-window family routed through plans.global_prefix_stats) or
# graduated (hll_sketch_union_users). The 5 spilled + any new r6
# queries lead the round-7 rotation (CORRECTNESS_SAMPLE_r06.md).
# Pure reordering — same keys, same callables, full matrix still in
# CORRECTNESS_full_r{N}.json via tools/check.py.
_R6_SAMPLE_ROTATION = [
    # repaired this round (single-partition window fix) — must be green
    "rfm_segments", "pareto_8020_customers",
    # graduated this round (bound-check oracle)
    "hll_sketch_union_users",
    # never-sampled remainder
    "ab_test_conversion", "attribution_last_touch", "audio_silence_runs",
    "benford_price_audit", "bfs_distances_copurchase",
    "big_order_customers_q18ish", "bination_volume_q7ish",
    "bootstrap_revenue_ci", "char_shingle_lsh_zh", "clean_derivation_layer",
    "cusum_revenue_alarms", "dense_ids_documents",
    "disjunctive_revenue_q19ish", "domain_cap_sample",
    "dsir_importance_by_source", "embedding_dim_variance",
    "embedding_outlier_audit", "excess_suppliers_q20ish",
    "exp_smoothing_forecast", "forecast_revenue_q6ish",
    "frontier_politeness_schedule", "hybrid_search_rrf",
    "idle_rich_customers_q22ish", "image_dhash_profile",
    "image_dup_clusters", "join_size_estimate",
    "kaplan_meier_signup_to_purchase", "kcore_copurchase",
    "label_centroid_similarity", "late_order_priority_q4ish",
    "luhn_cc_audit", "market_share_q8ish", "mean_shift_changepoint",
    "min_cost_supplier_q2ish", "mojibake_repair_stats",
    "neyman_allocation_orders", "order_count_distribution_q13ish",
    "pareto_front_parts", "part_value_fraction_q11ish",
    "phrase_search_positional", "pmi_collocations", "product_profit_q9ish",
    "promo_revenue_q14ish", "returned_revenue_q10ish",
    "segment_dedup_prune", "token_drift_chi2", "top_event_trigram_paths",
]


def _rotated(mapping: dict) -> dict:
    head = {n: mapping[n] for n in _R6_SAMPLE_ROTATION if n in mapping}
    return head | {n: v for n, v in mapping.items() if n not in head}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _rotated(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    return _rotated(dict(ORACLES))
