"""Sessionize A/B: the skew-proof two-level stitch vs the classic
single-window form, timed on the same events table (VERDICT r9 item 4).

The r9 zipf probe showed the classic ``lag + running-sum OVER
(PARTITION BY user_id)`` puts a hot key's entire history into ONE
window task — the stitch bounds every task by per-(user, day) volume.
Measured r10: classic wins at sf0.1 (3.0x), organic sf1 (1.7x) and
even x10-zipf (1.6x) - hence sessionize's size gate
(incremental._SESSIONIZE_STITCH_BYTES): classic below, stitch above.
This times both FORCED forms (noop sink, median of N) at any sf dirs
given, so the gate threshold stays re-checkable.

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
            "stitch": lambda: sessionize(ev, plan="stitch"),
            "classic": lambda: sessionize(ev, plan="classic"),
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
