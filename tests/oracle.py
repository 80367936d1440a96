"""Local stand-in for the driver's DuckDB oracle compare.

Runs a registered Spark query and its oracle SQL on the same parquet tables,
then compares row count, column-name set, and order-insensitive values
(numeric tolerance for floats).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from ecommerce_etl_pipeline_spark.sources.io import TESTDATA_TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.sql(sql).df()


def _canon_cell(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if pd.isna(v):
        return "<null>"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, pd.Timestamp):
        # DuckDB DATE -> midnight Timestamp; Spark DATE -> datetime.date.
        return v.date().isoformat() if v == v.normalize() else v.isoformat()
    return str(v)


def canon_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows)


def assert_oracle_match(spark_df, oracle_sql: str, sf_dir: str, name: str = "") -> None:
    got = spark_df.toPandas()
    want = run_oracle(oracle_sql, sf_dir)
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch {sorted(got.columns)} != {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    g, w = canon_rows(got), canon_rows(want)
    mismatches = [(a, b) for a, b in zip(g, w) if a != b]
    assert not mismatches, f"{name}: value mismatch, first diffs: {mismatches[:5]}"
