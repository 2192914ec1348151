"""Sessionize A/B: the skew-proof two-level stitch vs the classic
single-window form, timed on the same events table (VERDICT r9 item 4).

The r9 zipf probe showed the classic ``lag + running-sum OVER
(PARTITION BY user_id)`` puts a hot key's entire history into ONE
window task — the stitch bounds every task by per-(user, day) volume.
The open question was its small-scale price: is the extra rollup +
join worth carrying at well-distributed SFs, or does it need a
metadata gate? This times both forms (noop sink, median of N) at any
sf dirs given.

Usage: python tools/sessionize_ab.py [sf_dir ...] [--passes N]
Prints one JSON line per sf_dir.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def classic_sessionize(events, gap_seconds: int = 1800):
    """The pre-r9 single-window form (one window task per user — the
    zipf-collapse shape; kept here ONLY as the A/B reference)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(F.unix_timestamp("ts")).over(w)
    new = F.when(
        prev.isNull() | ((F.unix_timestamp("ts") - prev) > gap_seconds), 1
    ).otherwise(0)
    return events.withColumn("__n", new).withColumn(
        "session_idx",
        F.sum("__n").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    ).drop("__n")


def main() -> int:
    argv = sys.argv[1:]
    passes = 3
    if "--passes" in argv:
        i = argv.index("--passes")
        passes = int(argv[i + 1])
        del argv[i : i + 2]
    sf_dirs = argv or ["/root/testdata/sf0.1"]

    from frontpage_spark.incremental import sessionize
    from frontpage_spark.session import get_spark
    from frontpage_spark.sources import load_table

    spark = get_spark("sessionize-ab")
    spark.sparkContext.setLogLevel("ERROR")

    def timed(df) -> float:
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    for sf_dir in sf_dirs:
        ev = load_table(spark, sf_dir, "events")
        forms = {
            "stitch": lambda: sessionize(ev),
            "classic": lambda: classic_sessionize(ev),
        }
        rec: dict = {"sf_dir": sf_dir, "rows": ev.count(), "passes": passes}
        for name, build in forms.items():
            timed(build())  # warm
            rec[name] = round(
                statistics.median(timed(build()) for _ in range(passes)), 3
            )
        rec["stitch_over_classic"] = round(rec["stitch"] / rec["classic"], 3)
        print(json.dumps(rec), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
