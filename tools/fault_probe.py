"""Fault-injection probe (VERDICT r8 item 2): SIGKILL one executor JVM
mid-flight under ``local-cluster`` and assert the job still completes
with output identical to an undisturbed run.

Why this matters: every lineage/fault-tolerance claim in the engine
docstrings (e.g. kcenter's "a lost executor recomputes from the
parquet scan") had only ever executed inside one JVM, where executors
cannot die. ``local-cluster[2,2,2048]`` runs two REAL executor JVMs
under a standalone-style worker: killing one exercises the actual
recovery machinery — task retry (spark.task.maxFailures), stage
re-execution on FetchFailed (shuffle files die with the executor),
persisted-block recompute (persist keeps lineage), and reliable-
checkpoint re-read (plans.pin writes to a shared dir precisely so a
dead executor does NOT take fixpoint state with it, the way a
localCheckpoint block would).

Targets (one per recovery mechanism the engine relies on):

- ``kcenter_diverse_seeds`` — stateless K-pass design (r8): constant-
  depth lineage, recovery = recompute from the parquet scan.
- ``token_budget_selection`` — a ``plans.global_prefix_stats``
  consumer: keep()-persisted boundary relation; lost cached blocks
  recompute from lineage.
- ``pagerank_part_supplier`` FORCED onto the over-gate distributed
  branch (small_edges=1): per-round lineage cuts via ``plans.pin`` —
  reliable checkpoint, re-readable by the replacement executor.

Method: run the target in a thread; once executor JVMs
(CoarseGrainedExecutorBackend) are up and the query is mid-flight,
SIGKILL one; join; compare the resulting frame against an undisturbed
run of the same plan in the same session (canonical sort, exact
values).

Usage: python tools/fault_probe.py [sf_dir] [--out FILE.md]
(defaults: /root/testdata/sf0.01, stdout only)
"""

from __future__ import annotations

import json
import os
import signal
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd


def executor_pids() -> list[int]:
    """PIDs of live CoarseGrainedExecutorBackend JVMs (the per-executor
    processes local-cluster forks; absent in plain local mode)."""
    pids = []
    for p in os.listdir("/proc"):
        if not p.isdigit():
            continue
        try:
            with open(f"/proc/{p}/cmdline", "rb") as f:
                cmd = f.read().decode("utf-8", "replace")
        except OSError:
            continue
        if "CoarseGrainedExecutorBackend" in cmd:
            pids.append(int(p))
    return pids


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        df[c] = df[c].map(repr)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def run_with_kill(build, label: str, kill_after_s: float = 2.0) -> dict:
    """Execute ``build()`` (returns a pandas frame) twice: undisturbed,
    then with one executor SIGKILLed ``kill_after_s`` into the run.
    Returns a result record; raises nothing (errors land in the record
    so every target reports)."""
    rec: dict = {"target": label}
    t0 = time.time()
    expected = build()
    rec["clean_s"] = round(time.time() - t0, 2)

    result: dict = {}

    def victim():
        try:
            t = time.time()
            result["df"] = build()
            result["s"] = round(time.time() - t, 2)
        except Exception as e:  # surfaced in the probe record
            result["err"] = f"{type(e).__name__}: {str(e)[:400]}"

    th = threading.Thread(target=victim, daemon=True)
    th.start()
    time.sleep(kill_after_s)
    pids = executor_pids()
    if not pids:
        rec["killed_pid"] = None
        rec["note"] = "no executor JVMs found (not local-cluster?)"
    else:
        pid = sorted(pids)[0]
        os.kill(pid, signal.SIGKILL)
        rec["killed_pid"] = pid
        rec["n_executors_seen"] = len(pids)
    th.join(timeout=600)
    if th.is_alive():
        rec["status"] = "hang"
        return rec
    if "err" in result:
        rec["status"] = "job_failed"
        rec["error"] = result["err"]
        return rec
    got, want = canon(result["df"]), canon(expected)
    same = got.shape == want.shape and bool(got.eq(want).all().all())
    rec["status"] = "recovered_correct" if same else "recovered_WRONG"
    rec["rows"] = len(got)
    rec["killed_run_s"] = result["s"]
    return rec


def main() -> int:
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    out = None
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]

    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    from frontpage_spark.session import get_spark

    spark = get_spark(
        "fault-probe",
        master=os.environ.get("SPARK_GRAFT_MASTER", "local-cluster[2,2,2048]"),
    )

    from pyspark.sql import functions as F

    from frontpage_spark.ext.graph import pagerank_fixedpoint
    from frontpage_spark.queries import QUERIES
    from frontpage_spark.sources import load_table

    def q(name):
        return lambda: QUERIES[name](spark, sf_dir).toPandas()

    def pagerank_distributed():
        li = load_table(spark, sf_dir, "lineitem")
        e0 = li.select(
            F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        ).distinct()
        r = pagerank_fixedpoint(e0, iterations=3, bidirected=True, small_edges=1)
        return (
            r.filter(F.col("node").startswith("s"))
            .orderBy(F.desc("r"), "node")
            .limit(10)
            .toPandas()
        )

    def components_distributed():
        # the star-contraction loop forced over its size gate: per-round
        # pin() cuts must be re-readable by the replacement executor
        from frontpage_spark.queries import _component_fixpoint

        li = load_table(spark, sf_dir, "lineitem")
        pairs = (
            li.select(
                F.least("l_partkey", "l_suppkey").alias("a"),
                F.greatest("l_partkey", "l_suppkey").alias("b"),
            )
            .filter(F.col("a") < F.col("b"))
            .distinct()
        )
        labels = _component_fixpoint(pairs, small_rows=1)
        return (
            labels.groupBy("comp")
            .agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), "comp")
            .limit(20)
            .toPandas()
        )

    targets = [
        ("kcenter_diverse_seeds [stateless K-pass]", q("kcenter_diverse_seeds")),
        ("token_budget_selection [keep()-persisted prefix stats]", q("token_budget_selection")),
        ("pagerank_part_supplier [FORCED distributed, pin()-checkpointed]", pagerank_distributed),
        ("connected_components [FORCED star-contraction, per-round pin()]", components_distributed),
    ]
    recs = []
    for label, build in targets:
        print(f"== {label}", flush=True)
        rec = run_with_kill(build, label)
        print(json.dumps(rec), flush=True)
        recs.append(rec)
        # let the worker re-register the replacement executor
        time.sleep(3)

    spark.stop()
    ok = all(r.get("status") == "recovered_correct" for r in recs)
    if out:
        lines = [
            "# FAULT PROBE — executor SIGKILL mid-query under local-cluster",
            "",
            f"master: `{os.environ.get('SPARK_GRAFT_MASTER', 'local-cluster[2,2,2048]')}`, "
            f"sf_dir: `{sf_dir}`. One CoarseGrainedExecutorBackend JVM is",
            "SIGKILLed ~2s into each run; the job must complete with output",
            "identical to an undisturbed run (tools/fault_probe.py).",
            "",
            "| target | status | rows | clean s | killed-run s | killed pid |",
            "|---|---|---|---|---|---|",
        ]
        for r in recs:
            lines.append(
                f"| {r['target']} | {r.get('status')} | {r.get('rows', '-')} "
                f"| {r.get('clean_s', '-')} | {r.get('killed_run_s', '-')} "
                f"| {r.get('killed_pid', '-')} |"
            )
            if r.get("error"):
                lines.append(f"| ⮑ error | {r['error'][:160]} | | | | |")
        lines.append("")
        with open(out, "w") as f:
            f.write("\n".join(lines))
        print(f"wrote {out}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
