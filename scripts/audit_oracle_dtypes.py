#!/usr/bin/env python
"""One-shot dtype audit across every oracle-backed query (r13 VERDICT
brief #3): run each registered Spark query AND its DuckDB oracle at one
scale, pull both through pandas exactly the way the compare layer does,
and report every per-column dtype-CLASS divergence on the numeric/bool
axis (int vs float vs bool vs anything) — the axis the driver's hash is
sensitive to. The first run of this audit (r14, pre-scoping) also
surfaced the DATE class (Spark object-of-date vs DuckDB datetime64) on
seven queries, all of which hold green driver certs — proving that class
benign; tests/oracle.py::dtype_mismatches documents the excusal.

This is the audit that would have caught the pl_product_warehouse red
two rounds early: DuckDB ``SUM(BIGINT)`` returns HUGEINT, which pandas
surfaces as float64 while Spark emits int64 — numerically equal, hashed
red by the type-sensitive driver compare. The old local canon collapsed
``910.0 -> "910"`` and hid the class entirely; tests/oracle.py is now
strict (hex-float canon + dtype-class assertion), and this script is the
registry-wide sweep of just the typing axis, cheap enough to run at
sf0.01 (the driver's scale).

Usage: python scripts/audit_oracle_dtypes.py [sf_dir] [n_threads]
Exit 1 if any oracle-backed query shows a dtype-class mismatch.
"""

from __future__ import annotations

import os
import sys
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

import ecommerce_etl_pipeline_spark.plans  # noqa: F401,E402
from ecommerce_etl_pipeline_spark.plans.registry import _REGISTRY  # noqa: E402
from tests.oracle import dtype_mismatches, run_oracle  # noqa: E402


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_threads = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = (
        SparkSession.builder.master("local[16]")
        .appName("dtype_audit")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )

    def check(item):
        name, spec = item
        try:
            got = spec.fn(spark, sf).toPandas()
            want = run_oracle(spec.oracle, sf)
            return name, dtype_mismatches(got, want), None
        except Exception as e:  # noqa: BLE001
            return name, [], str(e)[:300]

    items = [(n, s) for n, s in sorted(_REGISTRY.items()) if s.oracle]
    bad: list[str] = []
    with ThreadPoolExecutor(max_workers=n_threads) as pool:
        for name, mismatches, err in pool.map(check, items):
            if err:
                bad.append(name)
                print(f"ERR  {name}: {err}")
            elif mismatches:
                bad.append(name)
                print(f"TYPE {name}: {mismatches}")
            else:
                print(f"OK   {name}")
    print(f"\n{len(items) - len(bad)}/{len(items)} dtype-clean; flagged: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
