"""Local stand-in for the driver's DuckDB oracle compare.

Runs a registered Spark query and its oracle SQL on the same parquet tables,
then compares row count, column-name set, per-column dtype CLASS, and
order-insensitive bit-exact values.

Strictness doctrine (r13 post-mortem): the grading driver's value hash is
TYPE-SENSITIVE — DuckDB ``SUM(BIGINT)`` returns HUGEINT, which surfaces as
float64 at the driver's compare layer and hashes ``910.0`` red against
Spark's bigint ``910`` even though the values are numerically equal. The
previous local canon collapsed ``float 910.0 -> "910"`` and so was strictly
WEAKER than the driver; the pl_product_warehouse oracle-typing bug survived
two rounds of green local sweeps because of it (VERDICT r13 "What's wrong"
#2, ADVICE r13 #3). The canon below is at least as strict as the driver:

* floats render as ``float.hex()`` — bit-exact, no int collapse, and
  ``-0.0`` stays distinct from ``0.0``;
* an integer-vs-float divergence between the engines fails BOTH the value
  compare and the dtype-class assertion (``i`` vs ``f`` pandas kind);
* NULL-bearing integer columns degrade to float64 on BOTH engines under
  pandas, so the dtype-class check stays symmetric there.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import numpy as np
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
    if isinstance(v, (float, np.floating)):
        # Bit-exact hex — the driver's hash distinguishes 910.0 from
        # bigint 910, so the local canon must too (no int collapse).
        return float(v).hex()
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, pd.Timestamp):
        # DuckDB DATE -> midnight Timestamp; Spark DATE -> datetime.date.
        return v.date().isoformat() if v == v.normalize() else v.isoformat()
    if isinstance(v, datetime.datetime):
        # Spark TIMESTAMP -> datetime.datetime under pandas object dtype;
        # str() would render "YYYY-MM-DD HH:MM:SS" while the DuckDB side's
        # Timestamp branch above renders ISO "T" — normalize to isoformat
        # so a future timestamp-returning oracle compares by value, not by
        # separator. (Midnight datetimes canon as dates, mirroring the
        # Timestamp branch.)
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return v.date().isoformat()
        return v.isoformat()
    return str(v)


def _dtype_class(dtype) -> str:
    """Collapse a pandas dtype to the class the driver's hash is sensitive
    to: integer / float / bool / datetime / other(object, string, decimal).
    """
    kind = getattr(dtype, "kind", "O")
    if kind in ("i", "u"):
        return "int"
    if kind == "f":
        return "float"
    if kind == "b":
        return "bool"
    if kind in ("M", "m"):
        return "datetime"
    return "other"


def canon_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows)


def dtype_mismatches(got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    """Per-column dtype-class divergences between the Spark and oracle
    frames (both already through pandas), on the axis the DRIVER's hash
    is sensitive to: a column is flagged when the two engines disagree
    AND at least one side is numeric/bool — the HUGEINT-style class
    (910.0 vs 910) that certifies red at the driver.

    Divergences where NEITHER side is numeric are deliberately excused:
    the one such class in the registry is DATE columns (Spark DATE ->
    pandas object of datetime.date, DuckDB DATE -> datetime64[us]), and
    the r14 one-shot audit proved the driver does NOT distinguish it —
    all seven queries showing it (a1_daily_sales, sc_date_arithmetic,
    sql_top_revenue_orders, w13_retention_cohorts, w5/w7/w8) hold green
    driver hash certs. The value canon still compares both as ISO date
    strings, so an actual date-VALUE divergence fails regardless.
    """
    out = []
    numericish = {"int", "float", "bool"}
    for c in sorted(set(got.columns) & set(want.columns)):
        g, w = _dtype_class(got[c].dtype), _dtype_class(want[c].dtype)
        if g != w and (g in numericish or w in numericish):
            out.append(f"{c}: spark={got[c].dtype}({g}) oracle={want[c].dtype}({w})")
    return out


def assert_oracle_match(spark_df, oracle_sql: str, sf_dir: str, name: str = "") -> None:
    got = spark_df.toPandas()
    want = run_oracle(oracle_sql, sf_dir)
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch {sorted(got.columns)} != {sorted(want.columns)}"
    )
    bad_types = dtype_mismatches(got, want)
    assert not bad_types, f"{name}: dtype-class mismatch {bad_types}"
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    g, w = canon_rows(got), canon_rows(want)
    mismatches = [(a, b) for a, b in zip(g, w) if a != b]
    assert not mismatches, f"{name}: value mismatch, first diffs: {mismatches[:5]}"
