"""IO & catalog surface (SURVEY.md §2.1): medallion databases, overwrite
tables, CSV/JSON sinks + malformed-row-tolerant scans, upsert-lite,
bucketed co-located joins, skew salting, pandas UDFs."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ecommerce_etl_pipeline_spark.operators.bucketing import write_bucketed
from ecommerce_etl_pipeline_spark.operators.skew import salted_aggregate, salted_broadcast_join
from ecommerce_etl_pipeline_spark.sources.io import (
    read_csv,
    upsert_append,
    write_csv,
    write_json,
    write_table,
)
from ecommerce_etl_pipeline_spark.sources.io import load_table

SF = "/root/testdata/sf0.001"


def test_medallion_catalog_and_overwrite_table(spark, tmp_path):
    # S11: raw/staging/warehouse databases (reference init_db.py:35-37)
    for db in ("raw", "staging", "warehouse"):
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    nation = load_table(spark, SF, "nation")
    write_table(nation, "warehouse.dim_nation")  # S6 overwrite semantics
    assert spark.table("warehouse.dim_nation").count() == nation.count()
    write_table(nation.limit(5), "warehouse.dim_nation")  # replace, like to_sql
    assert spark.table("warehouse.dim_nation").count() == 5
    spark.sql("DROP TABLE warehouse.dim_nation")


def test_csv_sink_and_tolerant_scan(spark, tmp_path):
    out = str(tmp_path / "nation_csv")
    write_csv(load_table(spark, SF, "nation"), out, quote_all=True)  # S7
    schema = StructType(
        [
            StructField("n_nationkey", IntegerType()),
            StructField("n_name", StringType()),
            StructField("n_regionkey", IntegerType()),
        ]
    )
    back = read_csv(spark, out, schema)
    assert back.count() == 25

    # S3: malformed rows -> DROPMALFORMED skips, PERMISSIVE keeps + corrupt col
    bad = str(tmp_path / "bad.csv")
    with open(bad, "w") as f:
        f.write("n_nationkey,n_name,n_regionkey\n1,GOOD,10\nnot_an_int,BAD,xx\n2,ALSO,20\n")
    kept = read_csv(spark, bad, schema, mode="PERMISSIVE", keep_corrupt=True)
    rows = kept.collect()
    assert len(rows) == 3
    assert sum(r._corrupt_record is not None for r in rows) == 1
    # row-limited scan (S4)
    assert read_csv(spark, bad, schema, limit=1).count() == 1


def test_json_sink_roundtrip(spark, tmp_path):
    out = str(tmp_path / "events_json")
    ev = load_table(spark, SF, "events").limit(50)
    write_json(ev, out)  # S8
    back = spark.read.json(out)
    assert back.count() == 50


def test_upsert_append(spark):
    nation = load_table(spark, SF, "nation")
    target = nation.filter("n_nationkey < 20")
    incoming = nation.filter("n_nationkey >= 15")  # overlap 15-19
    to_add = upsert_append(target, incoming, ["n_nationkey"])  # S9
    assert to_add.count() == 5  # only 20-24
    assert to_add.filter("n_nationkey < 20").count() == 0


def test_bucketed_join_has_no_shuffle(spark):
    import contextlib
    import io

    orders = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    write_bucketed(orders, "b_orders", bucket_by="o_orderkey", buckets=8)
    write_bucketed(li, "b_lineitem", bucket_by="l_orderkey", buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the sort-merge path (a broadcast would bypass bucketing here
        # because the test tables are tiny; at scale SMJ is the real plan)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bo, bl = spark.table("b_orders"), spark.table("b_lineitem")
        joined = bl.join(bo, bl.l_orderkey == bo.o_orderkey)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain(mode="formatted")
        plan = buf.getvalue()
        # co-located bucketed join: sort-merge with no exchange on either side
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salted_aggregate_matches_plain(spark):
    li = load_table(spark, SF, "lineitem")
    plain = {
        (r.l_returnflag): (r.cnt, r.qty)
        for r in li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum(F.col("l_quantity").cast("bigint")).alias("qty"))
        .collect()
    }
    salted = {
        (r.l_returnflag): (r.cnt, r.qty)
        for r in salted_aggregate(
            li,
            ["l_returnflag"],
            {"cnt": F.count(F.lit(1)), "qty": F.sum(F.col("l_quantity").cast("bigint"))},
            buckets=8,
        ).collect()
    }
    assert plain == salted


def test_salted_broadcast_join_matches_plain(spark):
    li = load_table(spark, SF, "lineitem").withColumnRenamed("l_partkey", "p_partkey")
    part = load_table(spark, SF, "part").select("p_partkey", "p_brand")
    plain = li.join(part, "p_partkey").groupBy("p_brand").count()
    salted = salted_broadcast_join(li, part, "p_partkey", buckets=4).groupBy("p_brand").count()
    assert {(r.p_brand, r["count"]) for r in plain.collect()} == {
        (r.p_brand, r["count"]) for r in salted.collect()
    }


def test_pandas_udfs(spark):
    from ecommerce_etl_pipeline_spark.functions.udfs import scaled_price, weighted_avg

    li = load_table(spark, SF, "lineitem")
    scaled = li.select(scaled_price(F.col("l_extendedprice"), F.col("l_discount")).alias("s"))
    assert scaled.count() == li.count()
    wavg = li.groupBy("l_returnflag").agg(
        weighted_avg(F.col("l_extendedprice"), F.col("l_quantity")).alias("wavg")
    )
    rows = wavg.collect()
    assert len(rows) == 3 and all(r.wavg > 0 for r in rows)


def test_orc_sink_roundtrip(spark, tmp_path):
    from ecommerce_etl_pipeline_spark.sources.io import read_orc, write_orc
    from tests.oracle import canon_rows

    out = str(tmp_path / "orders_orc")
    orders = load_table(spark, SF, "orders").limit(100)
    write_orc(orders, out)
    back = read_orc(spark, out)
    # exact round-trip: same rows, same values, schema preserved
    assert canon_rows(back.toPandas()) == canon_rows(orders.toPandas())
    assert dict(back.dtypes) == dict(orders.dtypes)


def test_binary_asset_source_decodes(spark, tmp_path):
    """binaryFile ingestion -> existing PPM decoder: the REAL multimodal
    asset path (files on disk -> opaque binary column -> decode UDF),
    replacing the synthesized fixtures when actual assets exist."""
    from ecommerce_etl_pipeline_spark.llmops import multimodal as mm
    from ecommerce_etl_pipeline_spark.sources.io import read_binary_assets

    assets = tmp_path / "assets"
    assets.mkdir()
    fixtures = {}
    for i in range(4):
        w, h = 2 + i, 3
        px = bytes((i * 7 + j) % 256 for j in range(3 * w * h))
        (assets / f"img_{i}.ppm").write_bytes(mm.encode_ppm(w, h, px))
        fixtures[f"img_{i}.ppm"] = (w, h, px)
    (assets / "notes.txt").write_bytes(b"not an image")  # pruned by glob

    df = read_binary_assets(spark, str(assets), glob="*.ppm")
    rows = df.select("path", "length", "content").collect()
    assert len(rows) == 4  # the .txt never reached the scan
    for r in rows:
        name = r["path"].rsplit("/", 1)[-1]
        w, h, px = fixtures[name]
        assert r["length"] == len(mm.encode_ppm(w, h, px))
        assert mm.decode_ppm(bytes(r["content"])) == (w, h, px)
