"""MERGE/CDC apply semantics (operators/cdc.py)."""

from __future__ import annotations


def test_apply_changes_semantics(spark):
    from ecommerce_etl_pipeline_spark.operators.cdc import apply_changes

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (6, "f")], "k LONG, v STRING"
    )
    changes = spark.createDataFrame(
        [
            (1, "a2", 1, "U"),   # update...
            (1, "x", 2, "D"),    # ...then delete at a later seq: gone
            (2, "x", 1, "D"),    # delete...
            (2, "b2", 2, "I"),   # ...then re-insert: back with new payload
            (4, "d", 1, "I"),    # brand-new key
            (5, "x", 1, "D"),    # delete of a nonexistent key: no row
            (6, "x", 1, "D"),    # same-seq tie with an upsert:
            (6, "f2", 1, "U"),   # the upsert wins (deletes-first semantics)
        ],
        "k LONG, v STRING, _seq LONG, _op STRING",
    )
    got = {r.k: r.v for r in apply_changes(base, changes, ["k"]).collect()}
    assert got == {2: "b2", 3: "c", 4: "d", 6: "f2"}


def test_apply_changes_empty_feed_is_identity(spark):
    from ecommerce_etl_pipeline_spark.operators.cdc import apply_changes

    base = spark.createDataFrame([(1, "a"), (2, "b")], "k LONG, v STRING")
    empty = spark.createDataFrame([], "k LONG, v STRING, _seq LONG, _op STRING")
    got = {r.k: r.v for r in apply_changes(base, empty, ["k"]).collect()}
    assert got == {1: "a", 2: "b"}
