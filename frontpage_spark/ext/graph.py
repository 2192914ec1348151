"""Iterative graph algorithms as DataFrame loops.

``dup_clusters`` (queries.py) covers min-label connected components;
this module adds PageRank — the canonical "does your engine do
iterative dataflow" operator — in a deliberately deterministic
fixed-point form.

Why fixed-point: float PageRank sums thousands of double
contributions per node, so partition order changes low bits and no
two engines (or two runs) agree bit-for-bit. Here ranks live in
integer mass units (SCALE = 1e12 total mass) and every edge
contributes ``(85 * r) div (100 * outdeg)`` — exact bigint
truncating division, identical in any evaluation order and in any
engine. The small mass lost to truncation is deterministic too (it
plays the role of the dangling-mass leak; ranks remain a strict
partial order of the true PageRank for the graphs this serves).

Scale design: one iteration = one shuffle of the edge list keyed on
src (join ranks in) + one keyed aggregation on dst — the same two
exchanges GraphX/Pregel pays. Ranks and degrees are node-sized
(small side) and broadcast when they fit; the edge list, the 100 TB
side, is never re-partitioned between iterations when it is already
bucketed by src. ``localCheckpoint`` every few rounds truncates the
growing lineage (same pattern as the component fixpoint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PR_SCALE = 10**12


def pagerank_fixedpoint(
    edges: DataFrame,
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    checkpoint_every: int = 4,
    broadcast_state: bool = True,
) -> DataFrame:
    """PageRank over a directed edge list ``(src, dst)`` in exact
    integer arithmetic. Returns ``(node, r)`` with Σr ≤ PR_SCALE.

    Every node present as src or dst participates; nodes with no
    out-edges contribute nothing (their mass leaks — standard
    simplified treatment; feed a bidirected edge list if the graph
    should be leak-free).

    ``broadcast_state=True`` hints the node-sized sides (ranks,
    out-degrees, contributions) into broadcast joins so each iteration
    costs ONE shuffle (the dst aggregation) and the edge list never
    moves — required when AQE is off, since rank tables sit behind
    shuffles where static planning can't see their (small) size. Set
    False for billion-node graphs where ranks exceed broadcast limits;
    the joins then shuffle on src/node and AQE handles skew."""
    # The edge list, node set, and out-degrees are loop INVARIANTS —
    # without a persist every iteration's join replays their whole
    # upstream plan (scan + distinct per round). Caching invariants is
    # the standard Pregel contract; callers drop them with clearCache.
    edges = edges.select("src", "dst").persist()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n_df = nodes.agg(F.count(F.lit(1)).alias("__N"))
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")).persist()

    # r0 = SCALE div N; jump = (100-damping)·SCALE div (den·N)
    r = (
        nodes.crossJoin(F.broadcast(n_df))
        .select("node", F.expr(f"CAST({PR_SCALE} AS BIGINT) div __N").alias("r"))
    )
    jump = F.expr(
        f"CAST({(damping_den - damping_num) * PR_SCALE} AS BIGINT) div "
        f"(CAST({damping_den} AS BIGINT) * __N)"
    )
    maybe_b = F.broadcast if broadcast_state else (lambda df: df)
    for i in range(iterations):
        contrib = (
            edges.join(maybe_b(r.withColumnRenamed("node", "src")), "src")
            .join(maybe_b(outdeg), "src")
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    f"(CAST({damping_num} AS BIGINT) * r) div "
                    f"(CAST({damping_den} AS BIGINT) * outdeg)"
                ).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        r = (
            nodes.join(maybe_b(contrib), "node", "left")
            .crossJoin(F.broadcast(n_df))
            .select(
                "node",
                (jump + F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("r"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            r = r.localCheckpoint()
    # eager checkpoint materializes the final ranks so the loop
    # invariants can be RELEASED here instead of leaking cached blocks
    # into long multi-query sessions (ADVICE r2)
    out = r.localCheckpoint()
    for inv in (edges, nodes, outdeg):
        inv.unpersist()
    return out


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
    checkpoint_every: int = 4,
) -> DataFrame:
    """k-core decomposition by iterative peeling: repeatedly delete
    nodes with degree < k (in the CURRENT subgraph) until none remain;
    returns the surviving (node, degree) frame — the densest-region
    primitive behind community seeding, spam-cluster mining, and
    visualization layering.

    Each round is two keyed aggregations + one semi join pair on the
    node id — no broadcast of anything graph-sized, no driver-side
    node sets; the only driver scalar is the convergence count. The
    edge list SHRINKS monotonically, so round cost decays; peeling
    converges in ≤ diameter-ish rounds on real graphs (bounded here by
    ``max_rounds``, asserted converged). ``localCheckpoint`` every few
    rounds truncates lineage exactly like the component fixpoint.

    Edges are treated as undirected; pass a symmetrized list or rely
    on the internal symmetrization (dedup'd (a,b)+(b,a))."""
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    cur = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    cur = cur.localCheckpoint(eager=True)
    # one count() per round: the previous round's surviving-edge count
    # is this round's n_cur (recounting cur re-ran the whole
    # uncheckpointed lineage a second time per round — ADVICE r3)
    n_cur = cur.count()
    for rnd in range(max_rounds):
        deg = cur.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select("a")
        nxt = (
            cur.join(keep, "a", "left_semi")
            .join(keep.select(F.col("a").alias("b")), "b", "left_semi")
        )
        if rnd % checkpoint_every == checkpoint_every - 1:
            nxt = nxt.localCheckpoint(eager=True)
        # converged when no node fell below k this round
        n_nxt = nxt.count()
        cur = nxt
        if n_cur == n_nxt:
            break
        n_cur = n_nxt
    else:
        raise RuntimeError(f"kcore did not converge in {max_rounds} rounds")
    return cur.groupBy(F.col("a").alias("node")).agg(F.count(F.lit(1)).alias("degree"))
