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

    times: dict[str, float] = {}
    for name, spec in _REGISTRY.items():
        t0 = time.perf_counter()
        spec.fn(spark, sf).write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
        print(f"{times[name]:7.2f}s  {name}", flush=True)

    ranked = dict(sorted(times.items(), key=lambda kv: -kv[1]))
    with open(out, "w") as f:
        json.dump({"sf_dir": sf, "total": round(sum(times.values()), 2),
                   "queries": ranked}, f, indent=1)
    print(f"\nwrote {out}: {len(times)} queries, total {sum(times.values()):.1f}s")


if __name__ == "__main__":
    main()
