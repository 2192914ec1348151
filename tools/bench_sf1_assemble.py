"""Assemble BENCH_sf1_r07.json — the organic-sf1 bench artifact
(VERDICT r6 item 7).

The Spark side ran the standard bench.py protocol (cold pass + 3
interleaved warm passes, median per query) at SPARK_GRAFT_SF_DIR=
testdata_sf1; its per-query stderr log is the input here (bench.py's
own DuckDB pass was killed at sf1: the oracle's quadratic embedding
heavies — list-fold all-pairs cosine over 20k vectors — did not finish
inside 35 minutes, which is exactly the scaling gap the Spark
size-gated LSH/GEMM paths exist to close; see the per-query notes).

The DuckDB side therefore runs here with a per-query interrupt cap
(DUCK_TIMEOUT_S): one timed pass per oracle-covered headline query,
`timeout: true` recorded when interrupted. The suite ratio is computed
over the queries DuckDB finished, and the timed-out set is listed —
no silent truncation.

Drift calibration (VERDICT r10 item 2): the sf1/zipf protocol times
the two engines in DIFFERENT windows (Spark via bench.py, DuckDB
here), so each window carries its own run of the bench's pinned
calibration probes. The Spark-window calibration comes from bench.py's
stdout JSON (pass it via --bench-json); the DuckDB window is measured
here, with a throwaway Spark session so BOTH probes run and an episode
inside either window is detectable. ratio_drift_corrected =
ratio * duck_window_duck_drift / spark_window_spark_drift — each
engine's time deflated by its own window's drift — suppressed when
either window's probes disagree >2x (episode, not uniform weather).

Run AFTER the Spark log exists:
  SPARK_GRAFT_SF_DIR=... python bench.py --no-oracle \
      > .bench_sf1_spark.json 2> .bench_sf1_spark.log
  python tools/bench_sf1_assemble.py .bench_sf1_spark.log BENCH_sf1_r11.json \
      --bench-json .bench_sf1_spark.json
"""

from __future__ import annotations

import json
import os
import re
import sys
import threading
import time

DUCK_TIMEOUT_S = 180.0


def parse_spark_log(path: str) -> tuple[dict, dict]:
    pat = re.compile(
        r"^# (\w+): ([0-9.]+)s \(samples ([0-9./]+), cold ([0-9.]+)s\)"
    )
    warm, cold = {}, {}
    for line in open(path):
        m = pat.match(line.strip())
        if m:
            warm[m.group(1)] = float(m.group(2))
            cold[m.group(1)] = float(m.group(4))
    return warm, cold


def main() -> int:
    argv = sys.argv[1:]
    bench_json = None
    if "--bench-json" in argv:
        i = argv.index("--bench-json")
        bench_json = argv[i + 1]
        del argv[i : i + 2]
    log = argv[0] if argv else ".bench_sf1_spark.log"
    out_path = argv[1] if len(argv) > 1 else "BENCH_sf1_r07.json"
    sf_dir = os.environ.get("SF1_DIR", os.path.abspath("testdata_sf1"))

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import CALIBRATION_REF, HEADLINE, _calibrate, _loadavg
    from frontpage_spark.queries import ORACLES
    from frontpage_spark.schemas import TESTDATA_TABLES

    warm, cold = parse_spark_log(log)
    missing = [n for n in HEADLINE if n not in warm]
    assert not missing, f"spark log incomplete: {missing}"

    import duckdb

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = os.path.join(sf_dir, t + ".parquet")
        if os.path.isdir(p):  # Spark-written table: a dir of part files
            p = os.path.join(p, "*.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle_q: dict[str, float] = {}
    timed_out: list[str] = []
    for name in [n for n in HEADLINE if n in ORACLES]:
        timer = threading.Timer(DUCK_TIMEOUT_S, con.interrupt)
        timer.start()
        t0 = time.time()
        try:
            con.execute(ORACLES[name]).fetchall()
            oracle_q[name] = round(time.time() - t0, 3)
        except Exception:
            timed_out.append(name)
            print(f"# {name}: DuckDB interrupted at {DUCK_TIMEOUT_S}s", file=sys.stderr)
        finally:
            timer.cancel()
        print(f"# duck {name}: {oracle_q.get(name, 'TIMEOUT')}", file=sys.stderr)

    finished = {n: v for n, v in oracle_q.items()}
    spark_covered = sum(warm[n] for n in finished)
    oracle_total = sum(finished.values())

    # --- drift calibration (VERDICT r10 item 2) --------------------------
    # DuckDB-window probes run HERE (right after the oracle pass, same
    # end-of-suite placement bench.py uses); the Spark-window probes come
    # from bench.py's stdout JSON. A throwaway Spark session runs the
    # spark_synth probe too, so an episode inside this window is
    # detectable by probe disagreement, exactly like bench.py's rule.
    spark_window = None
    if bench_json:
        with open(bench_json) as f:
            bj = json.loads(f.read().strip().splitlines()[-1])
        spark_window = {
            "calibration": bj.get("calibration"),
            "box_drift": bj.get("box_drift"),
            "loadavg_passes": bj.get("loadavg_passes"),
        }
    from frontpage_spark.session import get_spark

    spark = get_spark("sf1-assemble-calibration")
    spark.sparkContext.setLogLevel("ERROR")
    duck_window = _calibrate(spark)
    spark.stop()
    duck_window["loadavg"] = _loadavg()

    ratio = round(spark_covered / oracle_total, 3) if oracle_total else None
    corrected = None
    cal_note = None
    if ratio is None:
        cal_note = "no finished oracles — nothing to correct"
    elif spark_window is None or not spark_window.get("box_drift"):
        cal_note = "no --bench-json: spark-window calibration missing, correction unpublishable"
    else:
        s_drift = spark_window["box_drift"]  # measured in the Spark window
        d_drift = duck_window["box_drift"]  # measured in this window
        s_agree = s_drift["duckdb_synth"] / s_drift["spark_synth"]
        d_agree = d_drift["duckdb_synth"] / d_drift["spark_synth"]
        if not (0.5 <= s_agree <= 2.0) or not (0.5 <= d_agree <= 2.0):
            cal_note = (
                "probes disagree within a window (spark-window {:.2f}, "
                "duck-window {:.2f}) — episode during calibration, "
                "correction suppressed".format(s_agree, d_agree)
            )
        else:
            # each engine's suite time deflated by ITS OWN window's drift:
            # corrected = (spark/s_drift) / (duck/d_drift)
            corrected = round(
                ratio * d_drift["duckdb_synth"] / s_drift["spark_synth"], 3
            )
    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(warm.values()), 3),
        "unit": "sec",
        "queries": warm,
        "cold_value": round(sum(cold.values()), 3),
        "cold_queries": cold,
        "sf": sf_dir,
        "sf_note": os.environ.get(
            "SF_NOTE",
            "organic sf1 (tools/gen_sf1.py seed 777 — fresh draws, not sf0.1 replicas)",
        ),
        "cpus": os.cpu_count(),
        "spark_protocol": os.environ.get(
            "SPARK_PROTOCOL_NOTE",
            "bench.py cold + 3 interleaved warm passes, median (stderr log)",
        ),
        "oracle_protocol": f"one timed DuckDB pass, {DUCK_TIMEOUT_S:.0f}s interrupt cap per query",
        "oracle_queries": finished,
        "oracle_timeouts": timed_out,
        "oracle_value": round(oracle_total, 3),
        "ratio_over_finished": ratio,
        "spark_total_over_finished": round(spark_covered, 3),
        "calibration_ref": CALIBRATION_REF,
        "spark_window": spark_window,
        "duck_window": {
            "calibration": duck_window["calibration"],
            "box_drift": duck_window["box_drift"],
            "loadavg": duck_window["loadavg"],
        },
        "ratio_drift_corrected": corrected,
    }
    if cal_note:
        out["calibration_note"] = cal_note
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({k: out[k] for k in (
        "value", "oracle_value", "ratio_over_finished",
        "ratio_drift_corrected", "oracle_timeouts",
    )}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
