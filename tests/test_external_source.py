"""External-row source adapter (S10) with a deterministic fake fetcher
standing in for the reference's Selenium scrape."""

from __future__ import annotations

from ecommerce_etl_pipeline_spark.sources.external import fetch_external_rows
from ecommerce_etl_pipeline_spark.sources.io import load_table

SF = "/root/testdata/sf0.001"


def test_external_fetch(spark):
    # closure (serialized by value): deterministic stand-in for the
    # reference's Selenium scrape, top-3 competitor quotes per product
    def fake_price_fetch(rows):
        for r in rows:
            for rank in range(1, 4):
                yield {
                    "our_product_id": r.p_partkey,
                    "competitor_rank": rank,
                    "competitor_price": float(r.p_partkey * 10 + rank),
                }

    seeds = load_table(spark, SF, "part").select("p_partkey").limit(20)
    out = fetch_external_rows(
        seeds,
        fake_price_fetch,
        "our_product_id bigint, competitor_rank int, competitor_price double",
        max_concurrency=4,
    )
    rows = out.collect()
    assert len(rows) == 60  # 20 seeds x top-3
    by_product = {}
    for r in rows:
        by_product.setdefault(r.our_product_id, []).append(r.competitor_rank)
    assert all(sorted(v) == [1, 2, 3] for v in by_product.values())
