"""Every registered query with an oracle must match DuckDB on sf0.001 —
the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from ecommerce_etl_pipeline_spark.plans.registry import _REGISTRY
from tests.oracle import assert_oracle_match

import ecommerce_etl_pipeline_spark.plans  # noqa: F401  (registers queries)


def _oracle_specs():
    return [(name, spec) for name, spec in sorted(_REGISTRY.items()) if spec.oracle]


@pytest.mark.parametrize("name,spec", _oracle_specs(), ids=[n for n, _ in _oracle_specs()])
def test_oracle_parity(spark, sf_dir, name, spec):
    df = spec.fn(spark, sf_dir)
    assert_oracle_match(df, spec.oracle, sf_dir, name=name)


def test_rows_only_queries_run(spark, sf_dir):
    for name, spec in sorted(_REGISTRY.items()):
        if spec.oracle is None:
            assert spec.fn(spark, sf_dir).count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_j4_wide_domain_struct_venue(spark, tmp_path):
    """j4's venue pick: partkeys past 2^31 route to the struct-pair
    encoding (packing two >31-bit keys into one long is impossible) and
    still match the oracle — the venue statistic must never change
    results, only the exchange's key width."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    big = 3_000_000_000  # > 2^31
    orders = [1, 1, 1, 2, 2, 3, 3, 4]
    parts = [big + k for k in (1, 7, 3, 7, 1, 1, 7, 5)]
    pq.write_table(
        pa.table({"l_orderkey": pa.array(orders, pa.int64()),
                  "l_partkey": pa.array(parts, pa.int64())}),
        str(tmp_path / "lineitem.parquet"),
    )
    pq.write_table(
        pa.table({"p_partkey": pa.array([big + k for k in (1, 3, 5, 7)], pa.int64()),
                  "p_name": pa.array([f"part-{k}" for k in (1, 3, 5, 7)], pa.string())}),
        str(tmp_path / "part.parquet"),
    )
    # the oracle harness registers a view per testdata table: give the
    # unused ones an empty single-column placeholder
    from ecommerce_etl_pipeline_spark.sources.io import TESTDATA_TABLES

    for t in TESTDATA_TABLES:
        f = tmp_path / f"{t}.parquet"
        if not f.exists():
            pq.write_table(pa.table({"x": pa.array([], pa.int64())}), str(f))
    spec = _REGISTRY["j4_pair_names_lookup"]
    assert_oracle_match(
        spec.fn(spark, str(tmp_path)), spec.oracle, str(tmp_path), name="j4-wide"
    )
