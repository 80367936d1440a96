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


def test_with_retries_recovers_and_backs_off(spark):
    from ecommerce_etl_pipeline_spark.sources.external import (
        fetch_external_rows,
        with_retries,
    )

    fail_file = "/tmp/_retry_test_marker"
    import os

    if os.path.exists(fail_file):
        os.remove(fail_file)

    def flaky_fetch(rows):
        # fails on the first attempt per partition, succeeds after
        marker = f"{fail_file}.{os.getpid()}"
        if not os.path.exists(marker):
            open(marker, "w").close()
            raise RuntimeError("transient remote error")
        for r in rows:
            yield {"pid": r["id"], "price": int(r["id"]) * 10}

    seeds = spark.range(6).select("id")
    out = fetch_external_rows(
        seeds,
        with_retries(flaky_fetch, max_attempts=3, base_delay_s=0.0),
        "pid LONG, price LONG",
        max_concurrency=1,
    )
    got = {(r["pid"], r["price"]) for r in out.collect()}
    assert got == {(i, i * 10) for i in range(6)}


def test_with_retries_exhausts_and_raises():
    from ecommerce_etl_pipeline_spark.sources.external import with_retries

    delays = []

    def always_fails(rows):
        raise RuntimeError("down")
        yield  # pragma: no cover

    wrapped = with_retries(
        always_fails, max_attempts=3, base_delay_s=1.0, sleep=delays.append
    )
    import pytest

    with pytest.raises(RuntimeError, match="down"):
        list(wrapped(iter([])))
    assert delays == [1.0, 2.0]  # exponential schedule, no sleep after last


def test_with_retries_no_duplicates_on_midstream_failure():
    """A fetch that yields some rows then dies must not leave those rows
    behind — the retry re-runs the whole partition exactly once."""
    from ecommerce_etl_pipeline_spark.sources.external import with_retries

    state = {"attempt": 0}

    def midstream_flaky(rows):
        state["attempt"] += 1
        rows = list(rows)
        yield {"v": 1}
        if state["attempt"] == 1:
            raise RuntimeError("died after first row")
        yield {"v": 2}

    wrapped = with_retries(midstream_flaky, max_attempts=2, base_delay_s=0.0)
    out = list(wrapped(iter([])))
    assert out == [{"v": 1}, {"v": 2}]  # no duplicated first row
