#!/usr/bin/env python
"""dd_span_excision growth attribution (VERDICT r5 "Next round" #5).

The r5 decade measured duplicate-span excision at 5-11x wall-clock for
10x data and could not separate data-shape (duplicate density) from
plan-shape (the two window-key shuffles). This experiment decomposes it
with a CONTROLLED sf1 variant:

- sf1        : the committed replicate-with-resalt directory — copies get
               a COPY-specific marker every 4 tokens, so every 8-token
               window in copy i contains marker u{i}: cross-copy window
               matches are impossible, but same-copy cross-doc matches
               reproduce the base corpus's rate in each copy.
- sf1-pinned : same replication, but the marker is DOC-specific
               (d{doc_id} every 4 tokens), so a resalted doc's windows
               match no other document at all. The duplicate-span set is
               then EXACTLY copy-0's = sf0.1's (absolute dup mass pinned),
               while corpus volume still grows 10x.

wall(sf1) - wall(sf1-pinned)  => the duplicate-density term
wall(sf1-pinned) - wall(sf0.1) => the corpus-linear term (scan + first
                                  window shuffle + per-doc HOF mask)

Alongside wall-clock (median of 3) it records the DATA stats that drive
the two shuffles: total windows (shuffle 1) and non-canonical duplicated
occurrences (shuffle 2).

Usage: python scripts/span_attribution.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ecommerce_etl_pipeline_spark.llmops import dedup  # noqa: E402
from ecommerce_etl_pipeline_spark.session import get_spark  # noqa: E402

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(REPO, "localdata", "sf1")
PINNED = os.path.join(REPO, "localdata", "sf1_pinned_docs.parquet")
L = 8


def build_pinned(spark) -> None:
    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    n = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    parts = [docs.select("doc_id", "text")]
    for i in range(1, 10):
        shifted = docs.select(
            (F.col("doc_id") + F.lit(i * n)).alias("doc_id"), "text"
        )
        # DOC-specific marker: the d<doc_id> token lands in every 8-token
        # window of the copy, making its windows globally unique (the
        # marker text must come from the doc_id COLUMN, so the replacement
        # is built with concat, not a literal)
        marked = shifted.withColumn(
            "text",
            F.expr(
                "regexp_replace(text, '((\\\\S+\\\\s+){4})', "
                "concat('$1d', CAST(doc_id AS STRING), ' '))"
            ),
        )
        parts.append(marked)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(PINNED)


def stats(spark, df) -> dict:
    toks = F.split(F.col("text"), " ")
    base = df.select(F.col("doc_id"), toks.alias("t"), F.size(toks).alias("n"))
    occ = base.filter(F.col("n") >= L).select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.col("n") - L),
                lambda i: F.concat_ws(" ", F.slice("t", i + 1, L)),
            )
        ).alias("pos", "win"),
    )
    # one pass: per-window counts, then one aggregate yields total windows
    # AND dup stats (occ's tokenize+posexplode lineage executes once, not
    # once per statistic)
    row = (
        occ.groupBy("win")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.coalesce(F.sum("c"), F.lit(0)).alias("windows"),
            F.coalesce(
                F.sum(F.when(F.col("c") > 1, F.col("c"))), F.lit(0)
            ).alias("dup_occurrences"),
            F.count(F.when(F.col("c") > 1, True)).alias("dup_windows"),
        )
        .collect()[0]
    )
    return {
        "windows": row["windows"],
        "dup_occurrences": row["dup_occurrences"],
        "dup_windows": row["dup_windows"],
    }


def main() -> None:
    spark = get_spark(app_name="span_attribution")
    spark.sparkContext.setLogLevel("ERROR")
    # ALWAYS rebuild: a stale pinned fixture from a previous/different
    # SF01 source would silently corrupt the decomposition (~20s to build)
    build_pinned(spark)
    inputs = {
        "sf0.1": spark.read.parquet(f"{SF01}/documents.parquet"),
        "sf1": spark.read.parquet(f"{SF1}/documents.parquet"),
        "sf1_pinned": spark.read.parquet(PINNED),
    }
    report = {}
    for name, df in inputs.items():
        df.select("doc_id", "text").write.format("noop").mode("overwrite").save()
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            dedup.duplicate_span_stats(df, span_tokens=L).write.format(
                "noop"
            ).mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 2))
            spark.catalog.clearCache()
        report[name] = {"wall_med3": sorted(times)[1], "runs": times, **stats(spark, df)}
        print(name, report[name], flush=True)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
