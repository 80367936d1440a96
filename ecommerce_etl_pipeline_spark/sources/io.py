"""Typed, dirty-data-tolerant scans and star-schema sinks.

Re-expresses the reference's I/O surface (SURVEY.md §2.1):

- S1 full CSV scan            -> spark.read.csv with an authoritative schema
- S2 chunked out-of-core scan -> free (partitioned reads; nothing to write)
- S3 malformed-row tolerance  -> mode=DROPMALFORMED / PERMISSIVE + corrupt col
  (reference: src/utils/data_sampling.py:110-135, clean_product_v2.py:24)
- S4 row-limited scan         -> .limit(n)  (reference: complete_analyzer.py:114)
- S6 overwrite table sink     -> write.mode("overwrite").saveAsTable
  (reference: airflow/dags/sales_analytics_dag.py:132-154 `to_sql if_exists=replace`)
- S7 CSV sink (quoteAll)      -> write.option("quoteAll")
- S8 JSON sink                -> write.json
- S9 upsert-lite              -> left-anti join + append
  (reference: test_db.py:53-64 `ON CONFLICT DO NOTHING`)

At 100 TB the scan layer is where efficiency is decided: always pass an
explicit schema (no inference pass over the data), read parquet so filters
and projected columns push into the scan (check ``PushedFilters`` /
``ReadSchema`` in .explain), and partition facts by date at write time so
date predicates prune whole directories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

#: Driver-provided testdata tables (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _parquet_ts_unit(path: str, col: str = "ts") -> str | None:
    """Footer-only peek at a parquet column's timestamp unit ('ns'/'us'),
    or None if the file/column can't be inspected (directory datasets,
    non-timestamp columns). Driver-side metadata read — no data scanned."""
    try:
        import pyarrow.parquet as pq

        return getattr(pq.read_schema(path).field(col).type, "unit", None)
    except Exception:
        return None


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata parquet table (S1). Lazy; columns prune at the scan.

    ``events.parquet`` has shipped with either TIMESTAMP(NANOS) — which
    Spark's vectorized parquet reader rejects — or plain TIMESTAMP(MICROS),
    depending on the generator version. The footer is sniffed first and the
    session-wide ``nanosAsLong`` legacy conf is enabled ONLY when the file
    is a genuine nanos file — or when the sniff cannot tell (directory
    datasets, filesystems pyarrow can't open by bare path): an unknown file
    might be nanos, and failing to set the conf would crash that read, so
    only a POSITIVE micros identification skips the conf. Spark has no
    per-read switch for it — the unavoidable case. The long column converts
    with exact integer division (matching how DuckDB truncates TIMESTAMP_NS
    to TIMESTAMP); a micros file passes through.
    """
    if name == "events":
        path = f"{sf_dir}/{name}.parquet"
        if _parquet_ts_unit(path) != "us":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        else:
            # Micros files read as TIMESTAMP_NTZ; normalize to the same LTZ
            # type the nanos path (and the streaming reader) produce so the
            # output schema is generator-version independent. Value-
            # preserving under the UTC-pinned session.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Scan every testdata table, keyed by name."""
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    *,
    mode: str = "PERMISSIVE",
    header: bool = True,
    keep_corrupt: bool = False,
    escape: str = '"',
    limit: int | None = None,
) -> DataFrame:
    """Malformed-row-tolerant CSV scan (S1-S4).

    ``mode``: PERMISSIVE (bad fields -> null), DROPMALFORMED (skip bad rows —
    the reference's ``on_bad_lines='skip'``), or FAILFAST. With
    ``keep_corrupt`` the raw bad line lands in ``_corrupt_record`` for
    quarantine instead of silent loss. ``limit`` mirrors the reference's
    ``nrows`` profiling cap (S4) — it pushes down as a LocalLimit.
    """
    reader = (
        spark.read.option("header", str(header).lower())
        .option("mode", mode)
        .option("escape", escape)
        .option("multiLine", "false")
    )
    if keep_corrupt and schema is not None:
        schema = schema.add("_corrupt_record", "string")
        reader = reader.option("columnNameOfCorruptRecord", "_corrupt_record")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        # Inference costs an extra pass; acceptable only for ad-hoc profiling.
        reader = reader.option("inferSchema", "true")
    df = reader.csv(path)
    return df.limit(limit) if limit is not None else df


def read_json(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """JSON-lines scan (read side of S8)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_table(
    df: DataFrame,
    table: str,
    *,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Star-schema sink with overwrite semantics (S6).

    ``partition_by`` a low-cardinality column (e.g. order date) on big facts
    so downstream date filters prune at the directory level — the Spark
    answer to the reference's Postgres indexes (init_db.py:113-116).
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.saveAsTable(table)


def write_csv(df: DataFrame, path: str, *, quote_all: bool = False, mode: str = "overwrite") -> None:
    """CSV sink (S7); ``quote_all`` mirrors ``csv.QUOTE_ALL`` (data_sampling.py:46-49)."""
    (
        df.write.mode(mode)
        .option("header", "true")
        .option("quoteAll", str(quote_all).lower())
        .csv(path)
    )


def write_json(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """JSON-lines sink (S8; reference data_generator.py:121-125)."""
    df.write.mode(mode).json(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    query: str,
    *,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
) -> DataFrame:
    """JDBC source (S5) — the reference's one Postgres-delegated query
    (customer_analytics_dag.py:177-188 ``pd.read_sql``) as a Spark JDBC
    read. With ``partition_column`` + bounds the read is split into
    ``num_partitions`` parallel range scans instead of one connection
    pulling everything — mandatory at scale. Simple predicates on the
    result push down into the remote database.

    Exercised live against embedded Derby (tests/test_jdbc.py): pushed
    aggregate query + partitioned range scan, matching the in-engine
    equivalent. The engine-native path for the reference's one
    Postgres-delegated query is a plain join — see j1_order_lineitem_join.
    """
    reader = spark.read.format("jdbc").option("url", url)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        # partitioned reads require dbtable (a subquery alias), not query
        reader = (
            reader.option("dbtable", f"({query}) q")
            .option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    else:
        reader = reader.option("query", query)
    return reader.load()


def upsert_append(target: DataFrame, incoming: DataFrame, keys: list[str]) -> DataFrame:
    """Idempotent insert: rows of ``incoming`` whose key is absent from
    ``target`` (S9, ``ON CONFLICT DO NOTHING`` — reference test_db.py:53-64).

    Returns the rows to append; caller writes them with mode="append". The
    anti-join broadcasts when the key projection is small; at scale prefer a
    storage format with real MERGE (Delta/Iceberg).
    """
    return incoming.join(target.select(*keys).distinct(), on=keys, how="left_anti")


def write_orc(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """ORC sink (Spark-native columnar alternative to parquet; same
    predicate-pushdown / column-pruning story via ORC stripe statistics).
    Exists so a warehouse standardized on ORC can consume this engine's
    outputs without a conversion hop."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source — schema from the file footer, filters/pruning pushed
    the same way the parquet scans are (tests assert round-trip parity)."""
    return spark.read.orc(path)


def read_binary_assets(spark: SparkSession, path: str, *, glob: str | None = None) -> DataFrame:
    """Opaque-binary asset source for the multimodal pipeline: Spark's
    ``binaryFile`` format yields (path, modificationTime, length, content)
    with ``content`` as the raw bytes column the decode UDFs
    (llmops/multimodal.py) consume — the REAL ingestion path for
    image/audio payloads sitting in an object store, replacing the
    synthesized fixtures when actual assets exist.

    Scale shape: file listing is distributed, each file is one row; large
    asset collections should set ``spark.sql.files.maxPartitionBytes`` /
    use a compacted manifest rather than millions of tiny files (the
    small-files problem is the same as any scan). ``glob`` filters by
    pathGlobFilter (e.g. ``*.ppm``) at listing time — pruned before any
    byte is read.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
