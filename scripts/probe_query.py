#!/usr/bin/env python
"""Fresh-session N-rep probe for one registered query at one scale —
the committed form of the ad-hoc host-variance probes SCALING.md rounds
7-8 describe (memory: disjoint bench_sf1 violation sets on untouched
code are host noise; the arbiter is a FRESH session's median-of-N).

Prints per-rep seconds and the median as one JSON line. Run it once per
(query, sf_dir) from a NEW process so JIT/codegen state from other
queries cannot flatter or inflate the number; the first rep is included
in the median deliberately (the per-round sweeps also pay it).

Usage: python scripts/probe_query.py QUERY [sf_dir] [reps=5] [sf_dir2]

With a second scale directory the SAME fresh session measures both
scales and emits the growth ratio — the band re-base form (the growth
arm is only meaningful within one session; two separate probe processes
would each be fresh but pay independent host draws).
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ecommerce_etl_pipeline_spark.plans import all_queries  # noqa: E402
from ecommerce_etl_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    name = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    sf2 = sys.argv[4] if len(sys.argv) > 4 else None
    spark = get_spark(app_name=f"probe_{name}")
    spark.sparkContext.setLogLevel("ERROR")
    fn = all_queries()[name]

    def run(d: str) -> list[float]:
        ts = []
        for _ in range(reps):
            # Per-rep GC hygiene (round-10, mirroring bench_sf1's gate
            # arm): collect accumulated driver/JVM garbage OUTSIDE the
            # timed window so collector scheduling doesn't land pauses
            # inside whichever rep allocates next. Guarded because _jvm
            # is py4j-private and absent under Spark Connect (ADVICE r9
            # #2); Python-side gc.collect() pairs with it so the
            # hygiene degrades gracefully rather than silently.
            gc.collect()
            try:
                # under Spark Connect the sparkContext ACCESS itself
                # raises (ADVICE r10 #2) — not just the _jvm attribute
                jvm = getattr(spark.sparkContext, "_jvm", None)
            except Exception:
                jvm = None
            if jvm is not None:
                jvm.System.gc()
            t0 = time.perf_counter()
            fn(spark, d).write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        return ts

    ts = run(sf)
    out = {
        "query": name,
        "sf_dir": sf,
        "gc_hygiene": True,
        "reps": ts,
        # true median (ADVICE r8 #3: sorted()[n//2] is the UPPER-middle
        # element for even rep counts, which would bias the absolute
        # bands these medians seed slightly high)
        "median": round(statistics.median(ts), 3),
    }
    if sf2 is not None:
        ts2 = run(sf2)
        out["sf_dir2"] = sf2
        out["reps2"] = ts2
        out["median2"] = round(statistics.median(ts2), 3)
        out["growth"] = round(out["median2"] / max(out["median"], 1e-9), 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
