"""Iterative/ML-assisted llmops operators: duplicate-cluster resolution
(connected components) and IVF approximate nearest neighbors.

Both are the canonical "beyond one SQL query" shapes: connected components
is an iterative fixpoint (non-SQL-expressible — rows-only checked), IVF
uses a trained coarse quantizer (KMeans) as its bucketer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ecommerce_etl_pipeline_spark.operators.parallelism import ensure_parallelism


#: Below this many (undirected) candidate edges the component resolution
#: runs as driver-side union-find over one collect — the same thresholded
#: local-fast-path idea as Spark's broadcast join. 2M edges ≈ 32 MB on the
#: driver; candidate graphs are duplicate-density-sized, so most corpora
#: land far under this even at 100 TB. Above it: distributed label
#: propagation.
SMALL_GRAPH_EDGES = 2_000_000


def _union_find_components(edge_rows) -> list[tuple]:
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in edge_rows:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min so the representative is the min id
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return [(n, find(n)) for n in parent]


def connected_components(
    pairs: DataFrame,
    *,
    src: str = "doc1",
    dst: str = "doc2",
    max_iterations: int = 20,
    small_graph_edges: int = SMALL_GRAPH_EDGES,
) -> DataFrame:
    """Resolve near-duplicate PAIRS into duplicate CLUSTERS: connected
    components. Returns (node, component) where component = min doc_id of
    the cluster; the component representative is the canonical document.

    Two physical strategies behind one semantic (chosen at runtime from the
    materialized edge count, like AQE picks join strategies):

    - small graph (≤ ``small_graph_edges``): one collect + driver
      union-find with path compression, result re-parallelized. Candidate
      graphs are duplicate-density-sized — almost always this path — and
      O(E α(E)) locally beats O(diameter) distributed rounds of job-launch
      overhead by ~10x.
    - large graph: iterative min-label propagation. Each node repeatedly
      adopts the minimum label among itself and its neighbors (hash-join +
      groupBy per round, O(diameter) rounds — near-dup graphs have tiny
      diameters). Edges and each round's labels are cached so round N+1
      never replays round N's lineage (at cluster scale swap cache() for
      checkpoint every few rounds); convergence is detected from a MONOTONE
      invariant — labels only ever decrease, so sum(component) is
      stationary exactly at the fixpoint — one cheap aggregate per round
      instead of a changed-rows self-join.

    CACHE CONTRACT: the large-graph branch returns a CACHED frame (already
    materialized by the convergence aggregate — unpersisting it before the
    caller reads would replay the whole iteration). It is listed on the
    returned DataFrame as ``df.retained_caches``; unpersist when done. The
    small-graph branch retains nothing (empty list).
    """
    spark = pairs.sparkSession
    # Strategy probe and small-graph collect in ONE execution: take(N+1)
    # runs the candidate-generation lineage once and hands back every edge
    # when the graph is small (the common case — candidate graphs are
    # duplicate-density-sized). Only an over-limit graph pays for a second,
    # cached materialization on the distributed path. This replaces the
    # previous cache()+count()+collect() sequence, which materialized the
    # pair lineage (for an LSH input: the band self-join + verify join, the
    # most expensive thing in the whole pipeline) one extra time.
    directed = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    head = directed.take(small_graph_edges // 2 + 1)

    if 2 * len(head) <= small_graph_edges:
        # Small-graph fast path needs no symmetrize/distinct shuffle at all:
        # union-find consumes undirected edges as-is (duplicates are no-ops).
        rows = _union_find_components([(r.a, r.b) for r in head])
        schema = pairs.select(
            F.col(src).alias("node"), F.col(src).alias("component")
        ).schema
        out = spark.createDataFrame(rows, schema)
        out.retained_caches = []
        return out

    directed = directed.cache()

    edges = (
        directed.union(directed.select(F.col("b"), F.col("a")))
        .distinct()
        .cache()
    )
    edges.count()
    directed.unpersist()

    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .cache()
    )
    # decimal(38,0) running sum: overflow-proof however many nodes
    total = labels.agg(
        F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
    ).collect()[0]["s"]
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    "component", F.coalesce("nbr_component", F.col("component"))
                ).alias("component"),
            )
            .cache()
        )
        new_total = new_labels.agg(
            F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        labels.unpersist()
        labels = new_labels
        if new_total == total:
            break
        total = new_total
    edges.unpersist()
    labels.retained_caches = [labels]
    return labels


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 2,
    k: int = 10,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a KMeans coarse quantizer
    assigns every vector to its nearest centroid cell; each query probes its
    ``n_probe`` closest cells and ranks only those members.

    The scale shape: candidate set ≈ corpus × n_probe / n_cells per query;
    recall rises with n_probe at linear candidate cost. Training samples the
    corpus (quantizer quality needs thousands of vectors, not all of them).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from ecommerce_etl_pipeline_spark.llmops.similarity import cosine, dot

    corpus = ensure_parallelism(corpus)
    with_vec = corpus.withColumn("_v", array_to_vector(F.col(vec_col)))
    km = KMeans(k=n_cells, seed=seed, featuresCol="_v", predictionCol="_cell")
    model = km.fit(with_vec.select("_v"))
    centroids = [list(map(float, c)) for c in model.clusterCenters()]

    def cell_dists(vec):
        # Euclidean-equivalent score: argmin ||x-c||^2 = argmax (x.c - ||c||^2/2)
        # (the ||x||^2 term is constant per query) — MUST match the KMeans
        # assignment metric or probes visit the wrong cells.
        return F.array(
            *[
                dot(vec, F.array(*[F.lit(x) for x in c]))
                - F.lit(sum(x * x for x in c) / 2.0)
                for c in centroids
            ]
        )

    def probe_cells(vec):
        dists = cell_dists(vec)
        idx = F.sequence(F.lit(0), F.lit(n_cells - 1))
        pairs = F.zip_with(dists, idx, lambda d, i: F.struct(d.alias("d"), i.alias("i")))
        return F.slice(F.reverse(F.array_sort(pairs)), 1, n_probe)

    assigned = model.transform(with_vec).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        F.col("_cell").cast("int").alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        F.explode(probe_cells(F.col(vec_col))).alias("probe"),
    ).select("query_id", "query_vec", F.col("probe.i").alias("cell"))

    scored = (
        assigned.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine(F.col("query_vec"), F.col("vec")))
        .select("query_id", "neighbor_id", "cosine")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
