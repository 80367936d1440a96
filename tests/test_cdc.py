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


def test_cdc_apply_stream_matches_batch_even_out_of_order(spark, tmp_path):
    """Streaming MERGE materialization == batch apply_changes on the same
    feed, even when micro-batches arrive OUT OF SEQUENCE order: the
    persisted tombstones and per-key sequence numbers make the fold
    commutative across batches."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ecommerce_etl_pipeline_spark.operators.cdc import apply_changes
    from ecommerce_etl_pipeline_spark.streaming import cdc_apply_stream, cdc_snapshot

    # the snapshot persists across sessions/runs — and a PREVIOUS
    # session's managed-table directory can survive as an orphan the
    # current catalog doesn't know about (LOCATION_ALREADY_EXISTS on
    # create). Clean both the catalog entry and the location.
    import shutil

    spark.sql("DROP TABLE IF EXISTS t_cdc_snapshot")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{wh}/t_cdc_snapshot", ignore_errors=True)

    schema = pa.schema(
        [("k", pa.int64()), ("v", pa.string()), ("_seq", pa.int64()), ("_op", pa.string())]
    )

    def write(name, rows):
        cols = list(zip(*rows)) if rows else [[], [], [], []]
        pq.write_table(
            pa.table({f.name: list(c) for f, c in zip(schema, cols)}, schema=schema),
            str(tmp_path / name),
        )

    # f0: the base snapshot rides as seq-0 inserts
    write("f0.parquet", [(k, f"v{k}", 0, "I") for k in range(1, 8)])
    # f1: a LATER-sequence delete arrives in an EARLIER batch than...
    write("f1.parquet", [(5, "x", 3, "D"), (6, "mid", 2, "U"), (8, "new", 1, "I")])
    # f2: ...these lower-sequence stragglers, which must NOT win
    write("f2.parquet", [(5, "late", 2, "U"), (6, "stale", 1, "U"), (7, "x", 1, "D")])

    changes = (
        spark.readStream.schema(
            "k LONG, v STRING, _seq LONG, _op STRING"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(tmp_path))
    )
    cdc_apply_stream(changes, "t_cdc_snapshot", ["k"])
    got = {r.k: r.v for r in cdc_snapshot(spark, "t_cdc_snapshot").collect()}

    base = spark.createDataFrame([(k, f"v{k}") for k in range(1, 8)], "k LONG, v STRING")
    all_changes = spark.createDataFrame(
        [
            (5, "x", 3, "D"), (6, "mid", 2, "U"), (8, "new", 1, "I"),
            (5, "late", 2, "U"), (6, "stale", 1, "U"), (7, "x", 1, "D"),
        ],
        "k LONG, v STRING, _seq LONG, _op STRING",
    )
    want = {r.k: r.v for r in apply_changes(base, all_changes, ["k"]).collect()}
    assert got == want
    assert got[6] == "mid" and 5 not in got and 7 not in got and got[8] == "new"


def test_apply_changes_matches_reference_model(spark):
    """Model-based check: on randomized feeds (small key/seq spaces to
    force collisions), apply_changes must agree with a dictionary model
    of latest-wins-with-tombstones. Payloads are a pure function of
    (key, seq, op) so duplicate change rows stay deterministic."""
    import random

    from ecommerce_etl_pipeline_spark.operators.cdc import apply_changes

    # op rank under the same (key, seq): 'U' > 'I' > 'D' (desc op order)
    rank = {"U": 2, "I": 1, "D": 0}

    for trial in range(6):
        rng = random.Random(trial)
        base_keys = rng.sample(range(20), rng.randint(3, 10))
        base_rows = [(k, f"base-{k}") for k in base_keys]
        changes_rows = []
        for _ in range(rng.randint(5, 30)):
            k = rng.randrange(20)
            seq = rng.randint(1, 4)
            op = rng.choice("UID")
            changes_rows.append((k, f"{k}-{seq}-{op}", seq, op))

        # reference model: per key, the (seq, op-rank)-max row decides
        state = {}
        for k, v in base_rows:
            state[k] = (0, rank["I"], v, "I")
        for k, v, seq, op in changes_rows:
            cur = state.get(k)
            cand = (seq, rank[op], v, op)
            if cur is None or cand[:2] > cur[:2]:
                state[k] = cand
        want = {k: t[2] for k, t in state.items() if t[3] != "D"}

        base = spark.createDataFrame(base_rows, "k LONG, v STRING")
        changes = spark.createDataFrame(
            changes_rows, "k LONG, v STRING, _seq LONG, _op STRING"
        )
        got = {r.k: r.v for r in apply_changes(base, changes, ["k"]).collect()}
        assert got == want, (trial, got, want)
