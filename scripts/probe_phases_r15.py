#!/usr/bin/env python
"""Phase attribution for the r15 optimization targets (guide §1): time the
training stage vs the curation stage of dd_curation_classifier, and the
per-stage cost of dd_curation_pipeline, in one warm session."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ecommerce_etl_pipeline_spark.session import get_spark  # noqa: E402
from ecommerce_etl_pipeline_spark.sources.io import load_table  # noqa: E402
from ecommerce_etl_pipeline_spark.llmops import classifier, curation  # noqa: E402
from ecommerce_etl_pipeline_spark.plans.llmops_queries import (  # noqa: E402
    _CLS_ITER,
    _CLS_LR_DEN,
    _CLS_LR_NUM,
    _CLS_SPLIT_SALT,
    _CLS_SPLIT_THRESHOLD,
)
from ecommerce_etl_pipeline_spark.llmops import splits  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label}: {dt:.3f}s")
    return out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


spark = get_spark(app_name="probe_r15")
spark.sparkContext.setLogLevel("ERROR")

docs = load_table(spark, SF, "documents")
print("docs rows:", docs.count())

# warm (compile + page cache)
h = splits.hash_uint32(F.col("doc_id"), _CLS_SPLIT_SALT)
train = docs.filter(h < F.lit(_CLS_SPLIT_THRESHOLD))

for rep in range(2):
    print(f"--- rep {rep} ---")
    w, feats = t("train d64 (12 rounds)", lambda: classifier.train_linear_scorer(
        train, iterations=_CLS_ITER, lr_num=_CLS_LR_NUM, lr_den=_CLS_LR_DEN,
        features="hashed"))
    spark.catalog.clearCache()
    w5, feats5 = t("train d5 (12 rounds)", lambda: classifier.train_linear_scorer(
        docs, iterations=_CLS_ITER, lr_num=_CLS_LR_NUM, lr_den=_CLS_LR_DEN))
    spark.catalog.clearCache()
    t("curate(classifier gate, exact jaccard)", lambda: noop(
        curation.curate(docs, use_minhash=False, classifier_weights=w)))
    spark.catalog.clearCache()
    t("curate(classifier gate, ppjoin)", lambda: noop(
        curation.curate(docs, use_minhash=False, use_ppjoin=True,
                        classifier_weights=w)))
    spark.catalog.clearCache()
    t("curate(heuristic, exact jaccard) [= dd_curation_pipeline]", lambda: noop(
        curation.curate(docs, use_minhash=False)))
    spark.catalog.clearCache()
    # curation sub-stages (heuristic gate)
    filtered = curation.curate.__wrapped__ if hasattr(curation.curate, "__wrapped__") else None
    tt = F.col("text")
    from ecommerce_etl_pipeline_spark.operators.parallelism import ensure_parallelism
    filt = ensure_parallelism(docs.select("doc_id", "text")).filter(
        curation._lang_and_length_gate(tt, "en", 5)
        & (curation.text.punct_ratio(tt) <= 0.3)
    )
    t("  stage 1+2 filter only", lambda: noop(filt))
    exact = (
        filt.groupBy(F.md5(tt).alias("_h"))
        .agg(F.min_by(F.struct("doc_id", "text"), F.col("doc_id")).alias("_doc"))
        .select("_doc.*")
    )
    t("  + exact dedup", lambda: noop(exact))
    from ecommerce_etl_pipeline_spark.llmops import dedup
    pairs = dedup.jaccard_similarity_join(exact, "doc_id", "text",
                                          threshold=0.5, hashed=False)
    t("  + jaccard join pairs", lambda: noop(pairs))
    spark.catalog.clearCache()
