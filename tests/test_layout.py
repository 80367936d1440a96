"""Z-order layout and compaction: the written files must actually exhibit
the locality the operators promise (checked against parquet footer stats,
which is exactly what the reader's row-group pruning consumes)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from ecommerce_etl_pipeline_spark.operators.layout import compact, write_zordered
from ecommerce_etl_pipeline_spark.sources.io import load_table

SF = "/root/testdata/sf0.001"


def _file_spans(path: str, col: str) -> list[tuple[float, float]]:
    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.read_metadata(f)
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    lo = c.statistics.min if lo is None else min(lo, c.statistics.min)
                    hi = c.statistics.max if hi is None else max(hi, c.statistics.max)
        if lo is not None:
            spans.append((lo, hi))
    return spans


def test_zorder_write_clusters_both_dims(spark, tmp_path):
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    out = str(tmp_path / "zordered")
    write_zordered(li, out, ["l_orderkey", "l_partkey"], n_files=8)

    back = spark.read.parquet(out)
    assert back.count() == li.count()
    assert "_zvalue" not in back.columns

    n_rows = li.count()
    for col in ["l_orderkey", "l_partkey"]:
        g = li.agg(F.min(col), F.max(col)).collect()[0]
        global_span = g[1] - g[0]
        spans = _file_spans(out, col)
        assert len(spans) >= 4
        avg_span = sum(hi - lo for lo, hi in spans) / len(spans)
        # a random/round-robin layout gives every file ~the full span of
        # BOTH dims; Z-order must confine each file to a fraction of each.
        # sqrt(n_files)=~2.8 regions per dim -> expect well under 60%.
        assert avg_span < 0.6 * global_span, (col, avg_span, global_span)


def test_zorder_beats_linear_sort_on_secondary_dim(spark, tmp_path):
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    write_zordered(li, zpath, ["l_orderkey", "l_partkey"], n_files=8)
    (
        li.repartitionByRange(8, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(spath)
    )
    z_spans = _file_spans(zpath, "l_partkey")
    s_spans = _file_spans(spath, "l_partkey")
    z_avg = sum(hi - lo for lo, hi in z_spans) / len(z_spans)
    s_avg = sum(hi - lo for lo, hi in s_spans) / len(s_spans)
    # linear sort on l_orderkey leaves l_partkey unclustered (~full span
    # per file); Z-order must be meaningfully tighter on the second dim
    assert z_avg < 0.8 * s_avg, (z_avg, s_avg)


def test_compact_reduces_file_count(spark, tmp_path):
    li = load_table(spark, SF, "lineitem")
    frag = str(tmp_path / "fragmented")
    li.repartition(64).write.parquet(frag)
    assert len(glob.glob(f"{frag}/*.parquet")) == 64

    out = str(tmp_path / "compacted")
    n = compact(spark, frag, out, target_rows_per_file=5000)
    files = glob.glob(f"{out}/*.parquet")
    assert len(files) == n < 10
    assert spark.read.parquet(out).count() == li.count()
