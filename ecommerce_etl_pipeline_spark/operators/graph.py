"""Iterative graph algorithms as DataFrame loops.

PageRank (Brin & Page 1998) in its standard distributed formulation:
ranks live in a (node, rank) frame, each iteration is one join + one
map-side-combinable aggregate (contributions grouped by destination),
dangling-node mass is redistributed uniformly via a single scalar
aggregate, and the driver never holds a rank vector — the same
shuffle-per-iteration shape every Pregel-style engine runs, expressed
with plain joins so Catalyst/AQE plan each round.

Iteration state management (two failure modes, both hit while building
this): (1) WITHOUT a lineage cut, each round's plan embeds the previous
round's plan TWICE (contribution join + dangling aggregate), so the
logical plan doubles per round — by round ~10 the analyzer is walking a
2^10-node tree whose duplicated broadcast subtrees all try to build at
once and the driver OOMs. Ranks are therefore localCheckpoint()ed
EAGERLY every round (plan depth O(1) per round), with the previous
round's checkpoint blocks released once the new round materializes.
(2) Loop-INVARIANT frames (edges, nodes, degrees) are persisted as
columnar caches and materialized up front — their HOF-explode upstream
has no honest size statistics, and a mis-estimated broadcast rebuilt
per round is its own OOM; after materialization every round's join
strategy is stats-driven (the repo's join doctrine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ecommerce_etl_pipeline_spark.operators.parallelism import ensure_parallelism


def pagerank(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iterations: int = 10,
) -> DataFrame:
    """PageRank over a directed edge list. Returns (node, rank); ranks sum
    to 1 (dangling mass redistributed uniformly each round).

    Scale shape per iteration: one join of ranks (node-sized) against the
    out-degree-annotated edge list on src, one groupBy(dst) sum with
    map-side partial aggregation, one scalar dangling-mass aggregate
    (broadcast back as a one-row frame — never a driver value), one
    node-sized left join to re-attach rank-0 receivers. Nothing the
    driver holds grows with the graph.
    """
    e = (
        ensure_parallelism(
            edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        )
        .distinct()
        .persist()
    )
    e.count()  # materialize: honest stats + one-time edge-build cost
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).persist()
    # one bounded driver scalar (the kmeans-centroid / bloom-sizing class
    # of statistic) — baking 1/n in as a literal keeps each round's plan
    # a join + aggregate + one 1-row broadcast, instead of two extra
    # crossJoins whose codegen dominated first-run latency
    n = nodes.count()
    # second bounded scalar: a graph with no dangling nodes (every
    # symmetric graph, e.g. co-occurrence) skips the per-round dangling
    # aggregate + broadcast entirely — half the jobs per iteration
    has_dangling = nodes.join(out_deg, nodes.node == out_deg.src, "left_anti").count() > 0

    ranks = nodes.select(
        "node", F.lit(1.0 / n).alias("rank")
    ).localCheckpoint()
    for _ in range(iterations):
        prev = ranks
        contribs = (
            # e carries a sort-merge hint: an edge list is corpus-scaled BY
            # DEFINITION, but its cached columnar stats undersell the hashed
            # relation a broadcast would build (~10x row-format + hash-table
            # blow-up), so a demo-sized autoBroadcastJoinThreshold (64 MiB
            # session default) would re-broadcast e EVERY round and OOM the
            # driver. This is the one join where the honest answer is known
            # statically: never broadcast the edge side; the node-sized rank
            # frame is the only exchange per round.
            ranks.join(e.hint("merge"), ranks.node == e.src)
            .join(out_deg, "src")
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("recv"))
        )
        base = nodes.join(contribs, "node", "left")
        if has_dangling:
            # dangling mass: rank sitting on nodes with no out-edges
            dangling = (
                ranks.join(out_deg, ranks.node == out_deg.src, "left_anti")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
            )
            base = base.crossJoin(F.broadcast(dangling))
            redistributed = F.col("dm") / F.lit(float(n))
        else:
            redistributed = F.lit(0.0)
        ranks = base.select(
            "node",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping)
                * (F.coalesce(F.col("recv"), F.lit(0.0)) + redistributed)
            ).alias("rank"),
        )
        # eager checkpoint: materializes this round AND cuts lineage.
        # coalesce first: ranks are node-sized, and under a default
        # 200-shuffle-partition session ten rounds of 200-partition
        # checkpoints + reads are pure task-scheduling overhead (AQE
        # coalesces shuffle READS, not the checkpoint layout).
        ranks = ranks.coalesce(16).localCheckpoint()
        # release the previous round's node-sized checkpoint blocks —
        # localCheckpoint has no public release, so this goes through the
        # materialized RDD handle; best-effort (worst case the blocks
        # age out with the session, iterations x |nodes| rows)
        try:
            prev._jdf.queryExecution().toRdd().unpersist(False)
        except Exception:
            pass
    ranks.retained_caches = [e, nodes, out_deg]
    return ranks


def pagerank_portable(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 6,
    scale: int = 10**12,
) -> DataFrame:
    """PageRank in exact INTEGER arithmetic — the oracle-checkable twin of
    :func:`pagerank` (same loop shape, same state management).

    Ranks are integers in ``1/scale`` units (picoranks at the default
    1e12) and every update is integer-exact:

        r0(v)      = scale div n
        r_{t+1}(v) = (15*scale) div (100*n)
                     + sum over in-edges u->v of (85*r_t(u)) div (100*deg(u))
                     + (85*dm_t) div (100*n)          -- dangling mass, if any

    (damping 0.85 = 85/100 kept as an integer ratio; all operands stay
    under 2^57, no overflow under ANSI). Integer sums are
    ORDER-INDEPENDENT, so the result is bit-identical across partitionings
    AND replays exactly in any SQL engine — a fixed iteration count
    unrolls into recursive-free CTEs (see g1's oracle). The cost of
    portability is ≤ iterations * (scale^-1 * deg) truncation per rank —
    ~1e-12 at default scale, far below any ranking-relevant difference —
    and total mass decaying by the truncation remainders instead of
    summing to exactly 1. Same per-round scale shape as :func:`pagerank`:
    one rank-edge join, one map-side-combinable integer aggregate, one
    bounded scalar, lineage cut per round.
    """
    e = (
        ensure_parallelism(
            edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        )
        .distinct()
        .persist()
    )
    e.count()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).persist()
    n = nodes.count()
    has_dangling = nodes.join(out_deg, nodes.node == out_deg.src, "left_anti").count() > 0

    base = (15 * scale) // (100 * n)
    ranks = nodes.select(
        "node", F.lit(scale // n).cast("bigint").alias("rank")
    ).localCheckpoint()
    for _ in range(iterations):
        prev = ranks
        contribs = (
            # e carries a sort-merge hint: an edge list is corpus-scaled BY
            # DEFINITION, but its cached columnar stats undersell the hashed
            # relation a broadcast would build (~10x row-format + hash-table
            # blow-up), so a demo-sized autoBroadcastJoinThreshold (64 MiB
            # session default) would re-broadcast e EVERY round and OOM the
            # driver. This is the one join where the honest answer is known
            # statically: never broadcast the edge side; the node-sized rank
            # frame is the only exchange per round.
            ranks.join(e.hint("merge"), ranks.node == e.src)
            .join(out_deg, "src")
            .select(
                F.col("dst").alias("node"),
                # integer contribution: (85*r) div (100*deg) — exact, and
                # the SUM below is an integer sum (order-independent)
                F.expr("(85 * rank) div (100 * deg)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").cast("bigint").alias("recv"))
        )
        out = nodes.join(contribs, "node", "left")
        if has_dangling:
            dangling = (
                ranks.join(out_deg, ranks.node == out_deg.src, "left_anti")
                .agg(F.coalesce(F.sum("rank"), F.lit(0)).cast("bigint").alias("dm"))
            )
            out = out.crossJoin(F.broadcast(dangling))
            redistributed = F.expr(f"(85 * dm) div (100 * {n})")
        else:
            redistributed = F.lit(0)
        ranks = out.select(
            "node",
            (
                F.lit(base).cast("bigint")
                + F.coalesce(F.col("recv"), F.lit(0))
                + redistributed
            ).cast("bigint").alias("rank"),
        )
        ranks = ranks.coalesce(16).localCheckpoint()
        try:
            prev._jdf.queryExecution().toRdd().unpersist(False)
        except Exception:
            pass
    ranks.retained_caches = [e, nodes, out_deg]
    return ranks
