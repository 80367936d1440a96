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
