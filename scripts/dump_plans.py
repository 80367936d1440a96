#!/usr/bin/env python
"""Regenerate PLANS.md: the optimized physical plan of every headline
benchmark query at sf0.01, so plan quality is reviewable without a cluster.
Usage: python scripts/dump_plans.py
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

import ecommerce_etl_pipeline_spark.plans  # noqa: F401,E402
from bench import HEADLINE  # noqa: E402
from ecommerce_etl_pipeline_spark.plans.registry import get  # noqa: E402

SF = "/root/testdata/sf0.01"


def main() -> None:
    spark = SparkSession.builder.master("local[8]").appName("plans").getOrCreate()
    out = [
        "# PLANS — optimized physical plans of the headline queries",
        "",
        "Regenerate with `python scripts/dump_plans.py` (vanilla session, "
        "sf0.01). What to look for: `PushedFilters`/`ReadSchema` at scans, "
        "`BroadcastHashJoin` on dim/small sides, partial+final "
        "`HashAggregate` pairs, no `CartesianProduct`, Python nodes only in "
        "the sanctioned multimodal queries.",
        "",
    ]
    for name in HEADLINE:
        df = get(name).fn(spark, SF)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="simple")
        out += [f"## {name}", "", "```", buf.getvalue().strip(), "```", ""]
    with open(os.path.join(os.path.dirname(os.path.dirname(__file__)), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md with {len(HEADLINE)} plans")


if __name__ == "__main__":
    main()
