"""Interleaved A/B: old count-probe + executor union-find vs r12 fused
collect-probe + driver union-find, for the _component_fixpoint callers.

Alternates the two implementations inside ONE session so box weather
hits both arms equally. Prints per-arm medians of build/exec/total.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or ["dup_clusters", "semantic_dedup_report"]
    rounds = int(os.environ.get("AB_ROUNDS", "5"))

    import frontpage_spark.queries as Q
    from frontpage_spark import plans
    from frontpage_spark.session import get_spark

    spark = get_spark("ab_fixpoint")
    spark.sparkContext.setLogLevel("ERROR")
    Q.QUERIES["global_minmax"](spark, sf_dir).collect()

    new_fixpoint = Q._component_fixpoint

    def old_fixpoint(pairs, small_rows=Q._SMALL_PAIR_GRAPH_ROWS, pair_count_out=None):
        # the r11 shape: count probe, executor-side union-find
        pairs = plans.keep(pairs)
        probe = pairs.limit(small_rows + 1).count()
        if pair_count_out is not None:
            pair_count_out["n_pairs"] = probe if probe <= small_rows else None
        if 0 < probe <= small_rows:
            return Q._components_local(pairs)
        raise RuntimeError("A/B harness only covers the under-gate path")

    def run(name):
        t0 = time.time()
        df = Q.QUERIES[name].__wrapped__(spark, sf_dir)
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        spark.catalog.clearCache()
        return t1 - t0, t2 - t1, t2 - t0

    for name in names:
        run(name)  # warm codegen on current (new) impl
        res = {"old": [], "new": []}
        for _ in range(rounds):
            for arm, impl in (("old", old_fixpoint), ("new", new_fixpoint)):
                Q._component_fixpoint = impl
                res[arm].append(run(name))
        Q._component_fixpoint = new_fixpoint
        for arm in ("old", "new"):
            b = statistics.median(r[0] for r in res[arm])
            e = statistics.median(r[1] for r in res[arm])
            t = statistics.median(r[2] for r in res[arm])
            samp = "/".join(f"{r[2]:.2f}" for r in res[arm])
            print(f"{name:28s} {arm}: build {b:.3f} exec {e:.3f} total {t:.3f}  ({samp})")
    spark.stop()


if __name__ == "__main__":
    main()
