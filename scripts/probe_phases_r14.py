#!/usr/bin/env python
"""r14 optimization-round phase attribution: time the internal phases of
the heavy iterative queries (guide §1: measure first, label jobs) so the
optimization targets the measured term, not the guessed one.

Usage: python scripts/probe_phases_r14.py {ivfpq|kmeans|logreg5|logreg64} [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ecommerce_etl_pipeline_spark.session import get_spark  # noqa: E402
from ecommerce_etl_pipeline_spark.sources.io import load_table  # noqa: E402

SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = round(time.perf_counter() - t0, 3)
    print(json.dumps({"phase": label, "sec": dt}))
    return out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    which = sys.argv[1]
    spark = get_spark(app_name=f"phase_{which}")
    spark.sparkContext.setLogLevel("ERROR")

    if which == "ivfpq":
        from ecommerce_etl_pipeline_spark.llmops import similarity
        from ecommerce_etl_pipeline_spark.llmops.clustering import (
            assign_to_seeds,
            kmeans_train_portable,
        )

        emb = load_table(spark, SF, "embeddings")
        noop(emb)  # warm scan
        books = t("pq_train", lambda: similarity.pq_train(emb, m=8, k=16, max_iterations=4))
        cents = t("kmeans_train_portable(16,5)", lambda: kmeans_train_portable(
            emb, k=16, iterations=5))
        seeds = spark.createDataFrame(
            [(i, c) for i, c in enumerate(cents)], "cid INT, cvec ARRAY<DOUBLE>")
        assigned = assign_to_seeds(emb, seeds).select(
            F.col("id").alias("neighbor_id"), F.col("cluster").alias("cell"), F.col("vec"))
        t("assign_to_seeds noop", lambda: noop(assigned))
        coded = similarity.pq_encode(assigned, books, vec_col="vec").select(
            "neighbor_id", "cell", *[f"_pq{j}" for j in range(8)])
        t("assign+pq_encode noop", lambda: noop(coded))
        out = similarity.ivfpq_topk(
            emb, emb.filter(F.col("vec_id") < 5), books,
            n_cells=16, n_probe=4, beam=100, k=10)
        t("full ivfpq_topk (incl re-train)", lambda: noop(out))
    elif which == "kmeans":
        from ecommerce_etl_pipeline_spark.llmops.clustering import kmeans_train_portable

        emb = load_table(spark, SF, "embeddings")
        noop(emb)
        for it in (1, 5):
            t(f"kmeans_train_portable(k=4,iter={it})", lambda it=it: kmeans_train_portable(
                emb, k=4, iterations=it))
    elif which in ("logreg5", "logreg64"):
        from ecommerce_etl_pipeline_spark.llmops import classifier

        feats_kind = "quality" if which == "logreg5" else "hashed"
        docs = load_table(spark, SF, "documents")
        noop(docs.select("doc_id"))
        feats = t("featurize", lambda: classifier.featurize(
            docs, "text", features=feats_kind).cache())
        t("feats count (materialize cache)", lambda: feats.count())
        t0 = time.perf_counter()
        w, ff = classifier.train_linear_scorer(
            docs, iterations=12, features=feats_kind)
        print(json.dumps({"phase": "train_linear_scorer(12) total",
                          "sec": round(time.perf_counter() - t0, 3)}))
        for c in getattr(ff, "retained_caches", []):
            c.unpersist()
        feats.unpersist()
    else:
        raise SystemExit(f"unknown probe {which}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
