"""S5/S6 live JDBC round-trip against embedded Derby (shipped in Spark's
jars for the Hive metastore — no network, same JVM).

Exercises sources/io.py::read_jdbc both in plain pushed-query form and in
partitioned-range form, against a table written through the JDBC sink, and
checks the pushed query returns exactly what the in-engine equivalent
computes. Derby folds unquoted identifiers to uppercase, so pushed SQL
quotes the (lowercase) column names Spark's JDBC writer created.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecommerce_etl_pipeline_spark.sources.io import load_table, read_jdbc

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby(spark, sf_dir, tmp_path_factory):
    """A Derby database holding the orders table, written via the JDBC sink."""
    db = str(tmp_path_factory.mktemp("derby") / "ordersdb")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    (
        orders.write.format("jdbc")
        .option("url", f"jdbc:derby:{db};create=true")
        .option("dbtable", "orders")
        .option("driver", DRIVER)
        # Derby's default StringType mapping is CLOB, which cannot compare
        # with character literals in pushed predicates — pin a real type.
        .option("createTableColumnTypes", "o_orderstatus VARCHAR(4)")
        .mode("overwrite")
        .save()
    )
    return db, orders


def test_read_jdbc_pushed_query_matches_engine(spark, derby):
    db, orders = derby
    query = (
        'SELECT "o_custkey", SUM("o_totalprice") AS "revenue" '
        'FROM orders WHERE "o_orderstatus" = \'F\' GROUP BY "o_custkey"'
    )
    via_jdbc = read_jdbc(
        spark, f"jdbc:derby:{db}", query, properties={"driver": DRIVER}
    )
    engine = (
        orders.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("revenue"))
    )
    got = {(r["o_custkey"], round(r["revenue"], 2)) for r in via_jdbc.collect()}
    want = {(r["o_custkey"], round(r["revenue"], 2)) for r in engine.collect()}
    assert got == want and len(got) > 0


def test_read_jdbc_partitioned_range_scan(spark, derby):
    db, orders = derby
    bounds = orders.agg(
        F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi")
    ).first()
    query = 'SELECT "o_orderkey", "o_totalprice" FROM orders'
    via_jdbc = read_jdbc(
        spark,
        f"jdbc:derby:{db}",
        query,
        properties={"driver": DRIVER},
        partition_column='"o_orderkey"',
        lower_bound=int(bounds["lo"]),
        upper_bound=int(bounds["hi"]),
        num_partitions=4,
    )
    # the partitioned read splits into parallel range scans but must not
    # lose or duplicate rows
    assert via_jdbc.rdd.getNumPartitions() == 4
    assert via_jdbc.count() == orders.count()
    assert via_jdbc.agg(F.sum("o_orderkey")).first()[0] == (
        orders.agg(F.sum("o_orderkey")).first()[0]
    )
