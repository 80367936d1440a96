"""Deterministic corpus partitioning: hash-based train/val/test splits,
token-budget sequence packing, and exact stratified sampling.

These are the reproducibility primitives of a training-data pipeline: every
assignment below is a pure function of (id, salt) via md5, so re-running the
pipeline on a grown corpus never moves an existing document between splits,
packs re-shuffle only within their shard, and samples are replayable without
storing any state. md5 (not xxhash64/crc32) because it is the one hash every
engine computes identically — the same expressions run in DuckDB for the
oracle gate, and would run in Trino/BigQuery for cross-engine audits.

Scale design (100 TB):
- ``assign_splits`` is a narrow per-row map — zero shuffles, executes inside
  the scan's codegen stage, and is immune to corpus growth (membership of an
  existing doc never changes when new docs arrive — the property that keeps
  eval sets frozen across dataset versions).
- ``pack_sequences`` is ONE hash-partition shuffle into ``n_shards`` +
  a per-shard window sort. Shards are md5-uniform (no skew), and
  ``n_shards`` scales freely with corpus size, so each sort fits one
  executor; the cross-shard pack boundary never needs coordination.
- ``stratified_exact_sample`` sorts per stratum. Strata are few and large,
  so for huge corpora pre-prune with a hash threshold (keep ~2x the target
  by ``bucket < 2 * n * n_buckets / stratum_count``) before the exact rank —
  the same oversample-then-rank trick as distributed top-k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ecommerce_etl_pipeline_spark.llmops import text

#: 2^32 — the bucket space of the 8-hex-char hash prefix.
HASH_SPACE = 1 << 32


def hash_key(id_col: Column, salt: str) -> Column:
    """Portable deterministic hash: md5 hex digest of ``salt || id``.

    Lexicographic order on the hex string is the engine-independent "random"
    order used for shuffling/ranking (hex is ASCII, so binary collation
    agrees everywhere).
    """
    return F.md5(F.concat(F.lit(salt), id_col.cast("string")))


def hash_uint32(id_col: Column, salt: str) -> Column:
    """First 8 hex chars of :func:`hash_key` as a uniform uint32 in a long."""
    return F.conv(F.substring(hash_key(id_col, salt), 1, 8), 16, 10).cast("bigint")


def sql_hash_key(id_expr: str, salt: str) -> str:
    """DuckDB/ANSI rendering of :func:`hash_key` (oracle side)."""
    return f"md5('{salt}' || CAST({id_expr} AS VARCHAR))"


def sql_hash_uint32(id_expr: str, salt: str) -> str:
    """DuckDB rendering of :func:`hash_uint32` (oracle side)."""
    return f"CAST(('0x' || substr({sql_hash_key(id_expr, salt)}, 1, 8)) AS BIGINT)"


def assign_splits(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split:v1",
) -> DataFrame:
    """Add a ``split`` column assigning each row to a named split with the
    given weights (dict order = threshold order), deterministically by
    ``md5(salt || id)``.

    The standard reproducible split at corpus scale: no sampling state, no
    global count, no shuffle — and changing ``salt`` is a full re-split
    while changing weights only migrates rows across the moved thresholds.
    """
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(weights.values())
    h = hash_uint32(F.col(id_col), salt)
    expr: Column | None = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        threshold = int(cum * HASH_SPACE)
        clause = h < F.lit(threshold)
        expr = F.when(clause, F.lit(name)) if expr is None else expr.when(clause, F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn("split", expr)


def split_thresholds_sql(
    id_expr: str,
    weights: dict[str, float],
    salt: str = "split:v1",
) -> str:
    """Oracle-side CASE expression matching :func:`assign_splits` exactly."""
    total = sum(weights.values())
    h = sql_hash_uint32(id_expr, salt)
    cases = []
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        cases.append(f"WHEN {h} < {int(cum * HASH_SPACE)} THEN '{name}'")
    return "CASE " + " ".join(cases) + f" ELSE '{names[-1]}' END"


def pack_sequences(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    budget: int = 2048,
    n_shards: int = 8,
    salt: str = "pack:v1",
) -> DataFrame:
    """Concat-and-chunk sequence packing: deterministically shuffle the
    corpus into ``n_shards``, lay documents end-to-end per shard in hash
    order, and cut the token stream every ``budget`` tokens.

    Returns (doc_id, shard, pack_id, pack_offset, n_tokens): the document's
    shard, the pack (context window) its first token lands in, and the
    offset within that pack. Documents span pack boundaries — exactly the
    GPT-style pretraining batch prep, where packs are dense and a document
    may be cut. Downstream, ``(shard, pack_id)`` is the batch key.

    One shuffle (hash partition on shard) + one per-shard window sort; the
    hash order IS the global shuffle, so no separate randomize pass.
    """
    n_tok = text.token_count(F.col(text_col)).cast("bigint")
    h = hash_key(F.col(id_col), salt)
    sharded = docs.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        h.alias("_h"),
        F.pmod(hash_uint32(F.col(id_col), salt), F.lit(n_shards)).alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        sharded.withColumn("_start", start)
        .select(
            id_col,
            F.col("shard").cast("int").alias("shard"),
            F.floor(F.col("_start") / budget).cast("int").alias("pack_id"),
            (F.col("_start") % budget).cast("int").alias("pack_offset"),
            F.col("n_tokens").cast("int").alias("n_tokens"),
        )
    )


def pack_sequences_sql(
    table: str = "documents",
    id_expr: str = "doc_id",
    text_expr: str = "text",
    *,
    budget: int = 2048,
    n_shards: int = 8,
    salt: str = "pack:v1",
) -> str:
    """DuckDB oracle for :func:`pack_sequences` (same window, same hash)."""
    h = sql_hash_key(id_expr, salt)
    u32 = sql_hash_uint32(id_expr, salt)
    return f"""
    WITH sharded AS (
        SELECT {id_expr} AS doc_id,
               CAST(len(string_split({text_expr}, ' ')) AS BIGINT) AS n_tokens,
               {h} AS h,
               {u32} % {n_shards} AS shard
        FROM {table}
    ), laid AS (
        SELECT doc_id, shard, n_tokens,
               COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY shard ORDER BY h, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
        FROM sharded
    )
    SELECT doc_id,
           CAST(shard AS INTEGER) AS shard,
           CAST(FLOOR(start / {budget}) AS INTEGER) AS pack_id,
           CAST(start % {budget} AS INTEGER) AS pack_offset,
           CAST(n_tokens AS INTEGER) AS n_tokens
    FROM laid
    """


def stratified_exact_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    id_col: str = "doc_id",
    salt: str = "strat:v1",
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum, chosen deterministically
    by hash rank — the data-mixing primitive (equalize languages/sources)
    where `sampleBy` gives only approximate counts and no replayability.

    Adds ``stratum_rank`` (1-based hash rank within the stratum).
    """
    w = Window.partitionBy(strata_col).orderBy(hash_key(F.col(id_col), salt), id_col)
    return (
        df.withColumn("stratum_rank", F.row_number().over(w))
        .filter(F.col("stratum_rank") <= n_per_stratum)
    )


def mixture_quotas(weights: dict[str, float], total_n: int) -> dict[str, int]:
    """Largest-remainder apportionment of ``total_n`` across sources:
    floor(w*N) each, remainders to the largest fractional parts (ties by
    source name). Exact, deterministic, sums to ``total_n``."""
    if any(w < 0 for w in weights.values()):
        raise ValueError(f"mixture weights must be non-negative: {weights}")
    wsum = sum(weights.values())
    if abs(wsum - 1.0) > 1e-9:
        raise ValueError(f"mixture weights must sum to 1 (got {wsum}): {weights}")
    raw = {s: w * total_n for s, w in weights.items()}
    quotas = {s: int(raw[s]) for s in raw}
    short = total_n - sum(quotas.values())
    by_frac = sorted(raw, key=lambda s: (-(raw[s] - quotas[s]), s))
    for s in by_frac[:max(0, short)]:
        quotas[s] += 1
    return quotas


def temperature_weights(counts: dict[str, int], alpha: float = 0.5) -> dict[str, float]:
    """Temperature-scaled mixture weights: w_s ∝ count_s^alpha — the
    multilingual/multi-source rebalancing rule (alpha < 1 up-samples small
    sources, alpha = 1 is natural proportions). Used with
    :func:`mixture_quotas` / :func:`mixture_sample` to draw the corpus mix.

    The normalizer is a LEFT FOLD over name-sorted sources — the same
    sequential association a SQL running-window cumsum produces — so an
    oracle reproduces bit-identical weights (a different summation order
    could flip a largest-remainder tie).
    """
    if alpha < 0:
        raise ValueError(f"alpha must be non-negative: {alpha}")
    powed = {s: float(counts[s]) ** alpha for s in sorted(counts)}
    total = 0.0
    for s in sorted(powed):
        total += powed[s]
    return {s: powed[s] / total for s in powed}


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    total_n: int,
    *,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix:v1",
) -> DataFrame:
    """Deterministic data-mixing sample: draw hash-ranked rows per source to
    hit exact target proportions — the corpus-mixing step of a training
    run (e.g. 50% web / 30% code / 20% books), replayable because rank
    order is a pure function of (id, salt).

    Scale shape: one window sort per source partition over only the listed
    sources (others are filtered before the exchange). For quotas ≪ source
    size, pre-prune with a hash threshold ~2x the target rate first so the
    rank sees a sliver of each source (same trick as
    :func:`stratified_exact_sample`).
    """
    quotas = mixture_quotas(weights, total_n)
    quota_col = F.create_map(
        *[x for s, q in sorted(quotas.items()) for x in (F.lit(s), F.lit(q))]
    )[F.col(source_col)]
    w = Window.partitionBy(source_col).orderBy(hash_key(F.col(id_col), salt), id_col)
    return (
        df.filter(F.col(source_col).isin(*quotas))
        .withColumn("source_rank", F.row_number().over(w))
        .filter(F.col("source_rank") <= quota_col)
    )


def importance_logweights(
    docs: DataFrame,
    target_pred: Column,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    salt: str = "dsir:v1",
) -> DataFrame:
    """DSIR-style importance log-weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): model the target and
    raw corpora as add-one-smoothed distributions over HASHED unigram
    buckets, and score every document by sum_tokens ln(p_target[bucket] /
    p_raw[bucket]) — high weight = looks like the target distribution.
    ``target_pred`` is any boolean per-document predicate selecting the
    target subset (e.g. ``F.col("lang") == "en"``).

    Determinism across engines: each bucket's two ln terms are half-up
    quantized to nano precision as exact BIGINTs (the txt_unigram_logprob
    trick), so a document's weight is an INTEGER sum — independent of
    partitioning and token summation order, and rankable with zero FP
    ties beyond genuinely identical texts (which tie-break by id).

    Scale shape: one token-bucket count aggregate whose result is
    ``n_buckets`` rows (a bounded, broadcast-statistic-class collect —
    the whole model is B integers, the point of DSIR's hashing), then one
    NARROW per-document fold against the literal log-ratio table: no
    shuffle at all in the scoring pass. Returns (id_col, n_tokens,
    nano_logweight) — divide by 1e9 for the real-valued weight.
    """
    import math

    from ecommerce_etl_pipeline_spark.llmops import text as T
    from ecommerce_etl_pipeline_spark.operators.parallelism import (
        ensure_parallelism,
    )

    docs = ensure_parallelism(docs.filter(F.col(text_col).isNotNull()))
    bucket_of = lambda tok: F.pmod(  # noqa: E731
        hash_uint32(tok, salt), F.lit(n_buckets)
    )
    toks = docs.select(
        # NULL predicate (e.g. a NULL lang) counts as non-target, so the
        # bucket sums below can never come back NULL
        F.coalesce(target_pred.cast("bigint"), F.lit(0)).alias("_t"),
        F.explode(T.tokens(F.col(text_col))).alias("_tok"),
    )
    counts = (
        toks.select(bucket_of(F.col("_tok")).alias("_b"), "_t")
        .groupBy("_b")
        .agg(F.count(F.lit(1)).alias("n_raw"), F.sum("_t").alias("n_tgt"))
        .collect()
    )
    raw = [0] * n_buckets
    tgt = [0] * n_buckets
    for r in counts:
        raw[r["_b"]] = r["n_raw"]
        tgt[r["_b"]] = int(r["n_tgt"])
    n_r, n_t = sum(raw), sum(tgt)

    def q(x: float) -> int:
        return math.floor(x * 1e9 + 0.5)

    nlr = [
        q(math.log((tgt[b] + 1.0) / (n_t + n_buckets)))
        - q(math.log((raw[b] + 1.0) / (n_r + n_buckets)))
        for b in range(n_buckets)
    ]
    nlr_lit = F.array(*[F.lit(x).cast("bigint") for x in nlr])
    tok_arr = T.tokens(F.col(text_col))
    nano = F.aggregate(
        tok_arr,
        F.lit(0).cast("bigint"),
        lambda acc, t: acc + F.element_at(nlr_lit, bucket_of(t).cast("int") + 1),
    )
    return docs.select(
        F.col(id_col),
        F.size(tok_arr).alias("n_tokens"),
        nano.alias("nano_logweight"),
    )
