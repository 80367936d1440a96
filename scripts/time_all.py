#!/usr/bin/env python
"""Per-query timing baseline: run EVERY registered query once at the given
scale (default sf0.01, the driver's correctness scale) and write a sorted
JSON timing map. Not a benchmark — a regression tripwire: diff two rounds'
outputs to spot operators whose cost direction changed before the headline
bench ever notices.

Usage: python scripts/time_all.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ecommerce_etl_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "TIMINGS.json"
    spark = get_spark(app_name="time-all")
    spark.sparkContext.setLogLevel("ERROR")
    import ecommerce_etl_pipeline_spark.plans  # noqa: F401
    from ecommerce_etl_pipeline_spark.plans.registry import _REGISTRY

    # warmup
    _REGISTRY["a1_daily_sales"].fn(spark, sf).write.format("noop").mode(
        "overwrite"
    ).save()
    # spawn the Python worker pool before timing: the first mapInPandas
    # task per core pays worker fork + pandas/pyarrow import (~10s across
    # 32 cores), a per-SESSION constant that would otherwise land on
    # whichever mm_/arrow query runs first and read as that query's cost
    spark.range(0, 32, 1, 32).mapInPandas(
        lambda it: it, "id LONG"
    ).write.format("noop").mode("overwrite").save()

    # median-of-3 per query: host co-tenancy swings single runs +/-2x on
    # collect/worker-heavy queries, which made the tripwire itself noisy.
    # Rep 0 still carries each query's one-time codegen, so the median
    # reflects steady-state while the file stays a fair cross-round diff.
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    samples: dict[str, list[float]] = {name: [] for name in _REGISTRY}
    for rep in range(reps):
        # deterministically shuffle the order PER REP: the host's co-tenant
        # load arrives in bursts comparable to one rep's length, so a fixed
        # order lets the same burst phase hit the same queries every rep
        # and the median inherits the bias instead of rejecting it
        order = list(_REGISTRY)
        random.Random(rep).shuffle(order)
        for name in order:
            t0 = time.perf_counter()
            _REGISTRY[name].fn(spark, sf).write.format("noop").mode(
                "overwrite"
            ).save()
            samples[name].append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        print(f"rep {rep} total {sum(v[-1] for v in samples.values()):.1f}s",
              flush=True)
    times = {n: sorted(v)[len(v) // 2] for n, v in samples.items()}

    ranked = dict(sorted(times.items(), key=lambda kv: -kv[1]))
    with open(out, "w") as f:
        json.dump({"sf_dir": sf, "total": round(sum(times.values()), 2),
                   "reps": reps, "stat": "median",
                   "queries": ranked}, f, indent=1)
        f.write("\n")  # json.dump ends mid-line; artifacts end with \n
    print(f"\nwrote {out}: {len(times)} queries, total {sum(times.values()):.1f}s")


if __name__ == "__main__":
    main()
