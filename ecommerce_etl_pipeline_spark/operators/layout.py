"""Data-layout operators: Z-order clustering and small-file compaction.

The 100 TB levers that live OUTSIDE the query plan: how rows are arranged
into files decides how much a scan can skip before any predicate runs.

- **Z-order write**: interleave the bits of two-or-more scaled key columns
  into one Morton code, range-partition + sort the write by it. Each output
  file then covers a tight hyper-rectangle of the key space, so parquet
  footer min/max stats prune row groups for predicates on ANY of the keys —
  the engine-side stand-in for the reference's multi-column Postgres indexes
  (init_db.py:113-116) that a linear sort can only provide for its leading
  column.
- **Compaction**: rewrite a directory of many small files into few
  well-sized ones. Streaming sinks and fine-grained partitions accrete
  kilobyte files; at scale, scan cost is dominated by per-file open/seek
  overhead long before bytes matter.

Both are one-time write-path passes (one extra shuffle each); no query code
changes — pruning happens inside the parquet reader via row-group stats.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: Bits per dimension in the Morton code. 2 dims x 16 bits fits a long.
ZORDER_BITS = 16


def _scale_to_bits(c: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Min-max scale an arbitrary numeric column onto [0, 2^bits - 1].

    Two scalar aggregates (broadcast) instead of a rank window: a global
    ntile would funnel the whole table through one partition; min-max
    scaling is one cheap pre-pass and keeps the write fully parallel.
    Skewed key distributions cost resolution, not correctness.
    """
    span = (cmax - cmin).cast("double")
    unit = F.when(span > 0, (c.cast("double") - cmin.cast("double")) / span).otherwise(
        F.lit(0.0)
    )
    top = (1 << bits) - 1
    return F.least(F.floor(unit * (1 << bits)).cast("long"), F.lit(top))


def morton_interleave(scaled: list[Column], bits: int = ZORDER_BITS) -> Column:
    """Bit-interleave ``scaled`` non-negative <2^bits ints into one Z-value.

    Pure JVM bitwise arithmetic (shift/and/or), codegen-friendly; for d
    dimensions the result uses d*bits bits — keep <= 63.
    """
    d = len(scaled)
    assert d * bits <= 63, "Z-value must fit a signed long"
    terms: list[Column] = []
    for j, c in enumerate(scaled):
        for i in range(bits):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, i * d + j))
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def write_zordered(
    df: DataFrame,
    path: str,
    by: list[str],
    *,
    n_files: int = 8,
    bits: int = ZORDER_BITS,
) -> None:
    """Write ``df`` as parquet clustered by the Z-order of ``by`` columns.

    One pass for global min/max of each key, one range-exchange on the
    Morton code, a per-partition sort, then a plain parquet write. Every
    file covers a compact region of the key space in ALL ``by`` dimensions.
    """
    stats = df.agg(
        *[F.min(c).alias(f"_min_{c}") for c in by],
        *[F.max(c).alias(f"_max_{c}") for c in by],
    )
    with_stats = df.crossJoin(F.broadcast(stats))
    scaled = [
        _scale_to_bits(F.col(c), F.col(f"_min_{c}"), F.col(f"_max_{c}"), bits)
        for c in by
    ]
    z = with_stats.withColumn("_zvalue", morton_interleave(scaled, bits)).drop(
        *[f"_min_{c}" for c in by], *[f"_max_{c}" for c in by]
    )
    (
        z.repartitionByRange(n_files, "_zvalue")
        .sortWithinPartitions("_zvalue")
        .drop("_zvalue")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    *,
    target_rows_per_file: int = 1_000_000,
) -> int:
    """Rewrite ``src_path`` into ``dst_path`` with ~``target_rows_per_file``
    rows per file. Returns the number of output files requested.

    The row count is a zero-column scan (cheap, not a pure metadata read);
    the rewrite is one round-robin exchange. For layout-preserving
    compaction of Z-ordered data, re-run :func:`write_zordered` instead.
    ``dst_path`` must differ from ``src_path``: mode('overwrite') deletes
    the destination before the lazy source read completes.
    """
    import os

    if os.path.abspath(src_path) == os.path.abspath(dst_path):
        raise ValueError(f"compact() src and dst must differ: {src_path}")
    df = spark.read.parquet(src_path)
    n_rows = df.count()  # zero-column scan
    n_files = max(1, -(-n_rows // target_rows_per_file))
    df.repartition(n_files).write.mode("overwrite").parquet(dst_path)
    return n_files
