"""One-off probe: time dd_minhash_pairs / dd_curation_pipeline / dd_jaccard_pairs
under the current join pins. Run after editing dedup.py to compare variants.

Usage: python scripts/join_variant_probe.py [label]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ecommerce_etl_pipeline_spark.session import get_spark
from ecommerce_etl_pipeline_spark.plans.registry import get

SF_DIR = "/root/testdata/sf0.1"
QUERIES = ["dd_minhash_pairs", "dd_jaccard_pairs", "dd_winnow_overlap_pairs", "dd_curation_pipeline"]


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "current"
    spark = get_spark()
    # warm up the JVM + parquet footers once
    spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    for name in QUERIES:
        times = []
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            get(name).fn(spark, SF_DIR).count()
            times.append(time.monotonic() - t0)
        print(f"{label} {name}: min={min(times):.2f}s runs={[round(t, 2) for t in times]}",
              flush=True)


if __name__ == "__main__":
    main()
