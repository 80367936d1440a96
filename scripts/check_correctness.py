#!/usr/bin/env python
"""Local mirror of the driver's correctness gate: run every registered query
at sf0.01 (or $1) with a VANILLA SparkSession and compare to its DuckDB
oracle. Usage: python scripts/check_correctness.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

import ecommerce_etl_pipeline_spark.plans  # noqa: F401,E402
from ecommerce_etl_pipeline_spark.plans.registry import _REGISTRY  # noqa: E402
from tests.oracle import assert_oracle_match  # noqa: E402


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = SparkSession.builder.master("local[16]").appName("correctness").getOrCreate()
    fails: list[str] = []
    for name, spec in sorted(_REGISTRY.items()):
        try:
            if spec.oracle:
                assert_oracle_match(spec.fn(spark, sf), spec.oracle, sf, name=name)
                print(f"OK   {name}")
            else:
                n = spec.fn(spark, sf).count()
                print(f"ROWS {name}: {n}")
        except Exception as e:  # noqa: BLE001
            fails.append(name)
            print(f"FAIL {name}: {str(e)[:300]}")
    print(f"\n{len(_REGISTRY) - len(fails)}/{len(_REGISTRY)} ok; fails: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
