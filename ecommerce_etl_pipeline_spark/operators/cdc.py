"""Change-data-capture apply: MERGE semantics (insert/update/delete with
sequence ordering) as a pure DataFrame program — the Delta/Iceberg
``MERGE INTO``/``APPLY CHANGES`` shape without a table format.

The reference's closest surface is upsert-lite (``ON CONFLICT DO
NOTHING``, sources/io.py::upsert_append); this is the full form a CDC
feed needs: per-key LATEST-WINS resolution across a base snapshot and an
ordered change stream, with deletes that actually remove rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    *,
    seq_col: str = "_seq",
    op_col: str = "_op",
) -> DataFrame:
    """Apply an ordered change set to a base snapshot: the resulting table
    contains, per key, the payload of the highest-``seq_col`` row — unless
    that row is a delete (``op_col = 'D'``), in which case the key is gone.
    Base rows participate as sequence-0 upserts, so a key absent from the
    changes passes through untouched and an insert for a new key lands.

    ``changes`` must carry the same payload columns as ``base`` plus
    (seq_col, op_col); ties on (key, seq) break deterministically by op
    ('D' < 'I' < 'U' lexicographically — a tie between a delete and an
    upsert at the SAME sequence number resolves to the upsert, matching
    "deletes happen first within a transaction" CDC semantics).

    Scale shape: ONE shuffle on the key (window rank), no join at all —
    at 100 TB the change feed is a fraction of the base, and AQE skew
    handling applies to hot keys. The output is the new snapshot; writing
    it back with sources.io.write_table completes the medallion hop.
    """
    payload = [c for c in base.columns]
    base_up = base.select(
        *payload, F.lit(0).cast("long").alias(seq_col), F.lit("I").alias(op_col)
    )
    ch = changes.select(
        *payload,
        F.col(seq_col).cast("long").alias(seq_col),
        F.col(op_col).alias(op_col),
    )
    ranked = base_up.unionByName(ch).withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy(*key_cols).orderBy(
                F.desc(seq_col), F.desc(op_col)
            )
        ),
    )
    return (
        ranked.filter((F.col("_rn") == 1) & (F.col(op_col) != "D"))
        .drop("_rn", seq_col, op_col)
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Row-level diff of two table snapshots — the data-ops companion to
    :func:`apply_changes` (MERGE applies a change feed; this RECOVERS the
    change feed from two snapshots when no CDC stream exists, the
    standard reconciliation / backfill-audit primitive).

    Returns one row per key present in either snapshot with ``status`` in
    {added, removed, changed, unchanged} plus both sides' compare
    columns (old\\_/new\\_ prefixed). One co-partitioned full outer join
    on the key — at scale, bucket both snapshots on the key (S11) and
    the exchange disappears. Comparison is null-safe (``<=>``), so a
    NULL→value transition counts as changed, not unchanged. Keys
    themselves must be non-null: a NULL key never equi-joins, so such a
    row would surface as one removed + one added (standard join
    semantics — pre-filter if NULL keys are possible).
    """
    # explicit presence markers: compare columns may legitimately be NULL
    # on a matched side, so side-presence needs its own always-non-null
    # sentinel, never a data column
    o = old.select(
        *key_cols,
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
        F.lit(1).alias("_old_present"),
    )
    n = new.select(
        *key_cols,
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
        F.lit(1).alias("_new_present"),
    )
    joined = o.join(n, key_cols, "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    status = (
        F.when(F.col("_old_present").isNull(), F.lit("added"))
        .when(F.col("_new_present").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        *key_cols,
        status.alias("status"),
        *[F.col(f"old_{c}") for c in compare_cols],
        *[F.col(f"new_{c}") for c in compare_cols],
    )
