"""Iterative/ML-assisted llmops operators: duplicate-cluster resolution
(connected components) and IVF approximate nearest neighbors.

Both are the canonical "beyond one SQL query" shapes: connected components
is an iterative fixpoint (non-SQL-expressible — rows-only checked), IVF
uses a trained coarse quantizer (KMeans) as its bucketer.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints resolve from here

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

#: Driver-venue budget for the portable k-means trainer, in MATRIX CELLS
#: (rows x dim): 16M cells = 128 MB of float64 on the driver — the same
#: bounded-local-fast-path idea as SMALL_GRAPH_EDGES / pagerank_portable's
#: DRIVER_EDGE_ROWS. Under budget the integer-exact loop runs in numpy
#: (bit-identical, order-independent sums); over it the distributed loop
#: runs unchanged.
KMEANS_DRIVER_CELLS = 16_000_000


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


def _assign_arrow_udf(centroids: list[list[float]], cids: list[int] | None = None):
    """Arrow-batched nearest-centroid kernel — the vectorized twin of the
    interpreted JVM assignment folds (:func:`assign_to_seeds` /
    :func:`_assign_literal_centroids`), built the way the PQ encode kernel
    was (similarity._pq_codes_arrow_udf, guide §4.2: batches to numpy
    instead of interpreted per-row HOF eval).

    Bit-parity is by construction, same doctrine as the r14 PQ kernel:
    squared terms accumulate SEQUENTIALLY over the dim axis (``acc +=
    d*d`` per element index — the same IEEE op sequence as the JVM fold's
    left-to-right ``acc + (x-c)**2``; squares are never ``-0.0`` so the
    zero-init is bit-neutral, and ``pow(x, 2.0)`` is the exactly-rounded
    square, i.e. ``x*x``), and ties go to the first (lowest-index = lowest
    cid once sorted) argmin exactly like ``array_min`` over (dist, cid)
    structs. Pinned empirically per-row (cluster AND bit-level dist) and
    on whole training trajectories in tests/test_llmops_algos.py.

    Null or wrong-width vectors reproduce the JVM fold's ranking (r15,
    ADVICE r14): the fold's zip_with pads width mismatches with NULLs, so
    every distance is NULL and ``array_min`` over (dist, cid) structs
    sorts NULL dist first — the row assigns to the LOWEST cid with a NULL
    dist. The kernel emits exactly that (cluster = lowest cid, dist NULL),
    pinned on explicit null/ragged rows in
    test_assign_arrow_kernel_bit_exact_vs_jvm. (The literal-matrix JVM
    fold differs on SHORTER-than-dim vectors — it folds the available
    elements — but its callers feed uniform-width corpora by
    construction.) The ``pow(x, 2.0) == x*x`` identity above is a
    JVM/libm assumption (fdlibm special-cases y==2; Math.pow is only
    guaranteed within 1 ulp), so the parity pin is empirical per
    host/JVM — ADVICE r14.
    """
    import numpy as np
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    C = np.asarray(centroids, dtype=np.float64)
    k, dim = C.shape
    ids = list(range(k)) if cids is None else [int(c) for c in cids]

    @F.pandas_udf(
        StructType(
            [
                # LongType (r15, ADVICE r14): a bigint cid must not overflow
                # inside the batch; callers cast back to their cid type
                StructField("cluster", LongType()),
                StructField("dist", DoubleType()),
            ]
        )
    )
    def _assign(vec: pd.Series) -> pd.DataFrame:
        vals = vec.to_numpy()
        ok = np.array([v is not None and len(v) == dim for v in vals], dtype=bool)
        # unrankable rows (null / wrong width): the JVM fold ranks them
        # (NULL dist sorts first) as (lowest cid, NULL dist) — reproduce it
        cl = np.full(len(vals), ids[0] if k else None, dtype=object)
        dist = np.full(len(vals), None, dtype=object)
        if ok.any():
            X = np.stack(vals[ok]).astype(np.float64)
            acc = np.zeros((len(X), k), dtype=np.float64)
            for t in range(dim):
                d = X[:, t, None] - C[None, :, t]
                acc += d * d
            best = acc.argmin(axis=1)
            bestd = acc[np.arange(len(X)), best]
            for i, j, dv in zip(np.flatnonzero(ok), best, bestd):
                cl[i] = ids[j]
                dist[i] = float(dv)
        return pd.DataFrame({"cluster": cl, "dist": dist})

    return _assign


def assign_to_seeds(
    points: DataFrame,
    seeds: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_id_col: str = "cid",
    seed_vec_col: str = "cvec",
    kernel: str = "jvm",
) -> DataFrame:
    """Nearest-seed assignment (squared Euclidean, ties to lowest seed id):
    returns (id, cluster, dist, vec). Seeds collapse to ONE broadcast row
    holding a cid-sorted seed array; each point computes its argmin in a
    per-row fold over that array. ZERO shuffles and no |points| x k row
    fan-out — the previous form joined every point against every seed and
    re-grouped |points| keys (a corpus-wide exchange carrying vectors)
    just to take the min back out. Distances are the same sequential
    zip_with fold, and argmin = array_min over (dist, cid) structs =
    lexicographic min — bit-identical assignment incl. tie-to-lowest-cid,
    so the DuckDB oracles replay unchanged. Shared by :func:`kmeans_step`
    (which aggregates it) and
    :func:`ecommerce_etl_pipeline_spark.llmops.dedup.semantic_dedup`
    (which uses clusters as dedup candidate buckets).

    ``kernel="arrow"`` (r14 optimization) swaps the interpreted per-row
    HOF fold for the vectorized numpy batch kernel
    (:func:`_assign_arrow_udf`) — bit-identical (cluster AND dist) by the
    same sequential-accumulation construction as the PQ encode kernel,
    pinned on the full fixture. The fold is the corpus-dominant per-row
    term of every consumer (measured 2.8 s for ONE pass over 2,000
    vectors at sf0.1 — ~1.4 ms/row of interpreted Catalyst eval), so this
    is guide §4.2 applied to the assignment pass. ``"jvm"`` (default)
    stays the Python-free reference venue for oracle parity surfaces and
    streaming."""
    p = points.select(F.col(id_col).alias("_pid"), F.col(vec_col).alias("_pv"))
    s = seeds.select(
        F.col(seed_id_col).alias("_cid"), F.col(seed_vec_col).alias("_cv")
    )
    if kernel == "arrow":
        # seeds are hyperparameter-sized by the operator's contract, so the
        # build-time collect is the same bounded class as a join statistic;
        # sort (cid, cvec) to mirror the JVM venue's array_sort order
        cid_type = s.schema["_cid"].dataType.simpleString()
        rows = sorted(
            ((r["_cid"], [float(x) for x in r["_cv"]]) for r in s.collect()),
            key=lambda rc: (rc[0], rc[1]),
        )
        if not rows:
            # empty seeds => empty result, matching the JVM venue's filter
            return p.filter(F.lit(False)).select(
                F.col("_pid").alias("id"),
                F.lit(None).cast(cid_type).alias("cluster"),
                F.lit(None).cast("double").alias("dist"),
                F.col("_pv").alias("vec"),
            )
        udf = _assign_arrow_udf(
            [cv for _, cv in rows], cids=[c for c, _ in rows]
        )
        return p.withColumn("_a", udf(F.col("_pv"))).select(
            F.col("_pid").alias("id"),
            F.col("_a.cluster").cast(cid_type).alias("cluster"),
            F.col("_a.dist").alias("dist"),
            F.col("_pv").alias("vec"),
        )
    # k is hyperparameter-sized: the whole seed set rides as one array in
    # one row (struct sorts by leading field, so the array is cid-ordered)
    seed_row = s.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("_cid"), F.col("_cv")))
        ).alias("_seeds")
    )
    dist_to = lambda cv: F.aggregate(  # noqa: E731
        F.zip_with(
            F.col("_pv"), cv, lambda a, b: (a.cast("double") - b.cast("double")) ** 2
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    best = F.array_min(
        F.transform(
            F.col("_seeds"),
            lambda sd: F.struct(
                dist_to(sd["_cv"]).alias("dist"), sd["_cid"].alias("cluster")
            ),
        )
    )
    return (
        # empty seeds => empty result, matching the old inner join
        p.crossJoin(F.broadcast(seed_row))
        .filter(F.size("_seeds") > 0)
        .withColumn("_best", best)
        .select(
            F.col("_pid").alias("id"),
            F.col("_best.cluster").alias("cluster"),
            F.col("_best.dist").alias("dist"),
            F.col("_pv").alias("vec"),
        )
    )


def kmeans_step(
    points: DataFrame,
    seeds: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_id_col: str = "cid",
    seed_vec_col: str = "cvec",
) -> DataFrame:
    """One Lloyd iteration as a pure DataFrame plan: assign every point to
    its nearest seed centroid (squared Euclidean, ties to the lowest
    centroid id), then aggregate per-cluster statistics — member count,
    mean assignment distance, and the L2 norm of the RECOMPUTED centroid
    (derived from per-dimension sums: ||mean|| = sqrt(sum_d sv_d^2)/n, so
    no second pass over the data).

    The scale shape of every centroid-model trainer: seeds are k rows and
    BROADCAST (bounded by construction — k is a hyperparameter, not a data
    size), the corpus is scanned once, the per-dimension aggregation is
    one map-side-combined shuffle of k*dim cells, and the driver never
    sees a vector. Iterating = feeding the recomputed centroids back in;
    pyspark.ml's KMeans (used by :func:`ivf_topk`) is the library form of
    the same loop.

    Returns (cluster, n_members, avg_dist, centroid_norm) — avg_dist /
    centroid_norm unrounded; oracle queries round both sides.
    """
    assigned = assign_to_seeds(
        points,
        seeds,
        id_col=id_col,
        vec_col=vec_col,
        seed_id_col=seed_id_col,
        seed_vec_col=seed_vec_col,
    ).select("cluster", "dist", "vec")

    stats = assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_members"), F.avg("dist").alias("avg_dist")
    )
    dims = (
        assigned.select("cluster", F.posexplode("vec").alias("d", "val"))
        .groupBy("cluster", "d")
        .agg(F.sum(F.col("val").cast("double")).alias("sv"))
        .groupBy("cluster")
        .agg(F.sqrt(F.sum(F.col("sv") * F.col("sv"))).alias("s2"))
    )
    return stats.join(dims, "cluster").select(
        "cluster",
        "n_members",
        "avg_dist",
        (F.col("s2") / F.col("n_members")).alias("centroid_norm"),
    )


def _assign_literal_centroids(
    pts: DataFrame, centroids: list[list[float]], *, kernel: str = "jvm"
) -> DataFrame:
    """Nearest-centroid assignment against a LITERAL centroid matrix:
    distances to ALL centroids in ONE aggregate pass (the single-fold rule
    from SCALING.md: one array traversal carrying a k-wide accumulator
    instead of k interpreted folds), against the column-major literal
    matrix; accumulator j updates in element order, so each distance is
    bit-identical to a separate fold. Neutral at demo k=4 (per-iteration
    job overhead dominates locally); at production cell counts (k in the
    hundreds) it removes k-1 array re-traversals per row. Argmin =
    array_min over (dist, index) structs = lexicographic min — same
    tie-to-lowest-index as assign_to_seeds. ``pts`` must carry ``_pid`` /
    ``_pv``; returns it with ``_cluster`` added. Shared by the FP and
    portable trainers (centroid literals are reprs of Python floats, which
    round-trip exactly, so the fold sees the same doubles DuckDB derives).
    """
    if kernel == "arrow":
        # r14: the numpy batch kernel (see _assign_arrow_udf) replaces the
        # interpreted k-wide accumulator fold AND the per-iteration cost of
        # parsing + recompiling a k*dim-literal expression string (at k=16,
        # dim=64 that string carries 1,024 double literals and changes
        # every iteration — measured as the dominant term of
        # kmeans_train_portable at sf0.1: 7.8 s of its ~8 s). The UDF's
        # codegen source is iteration-invariant (centroids live in the
        # function object, not the plan), so nothing recompiles.
        udf = _assign_arrow_udf(centroids)
        return (
            pts.withColumn("_a", udf(F.col("_pv")))
            # cast back to int: centroid indexes are 0..k-1 (the UDF's
            # cluster field widened to long for arbitrary cids — r15)
            .withColumn("_cluster", F.col("_a.cluster").cast("int"))
            .drop("_a")
        )
    k = len(centroids)
    dim = len(centroids[0])
    cols = "array(" + ",".join(
        "array(" + ",".join(f"{centroids[j][i]!r}D" for j in range(k)) + ")"
        for i in range(dim)
    ) + ")"
    zipped = F.zip_with(
        "_pv",
        F.sequence(F.lit(1), F.size("_pv")),
        lambda x, i: F.struct(x.cast("double").alias("x"), i.alias("i")),
    )
    dists = F.aggregate(
        zipped,
        F.expr(f"array_repeat(0.0D, {k})"),
        lambda acc, e: F.zip_with(
            acc,
            F.element_at(F.expr(cols), e["i"]),
            # ** 2 (POWER), not x*x: keeps each term bit-identical to
            # assign_to_seeds' fold, which the step-parity test compares
            lambda a, c: a + (e["x"] - c) ** 2,
        ),
    )
    best = F.array_min(
        F.zip_with(
            F.col("_d"),
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda d, i: F.struct(d.alias("_dist"), i.alias("_c")),
        )
    )["_c"]
    return pts.withColumn("_d", dists).withColumn("_cluster", best).drop("_d")


def kmeans_train(
    points: DataFrame,
    *,
    k: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iterations: int = 10,
    tol: float = 1e-6,
    kernel: str = "arrow",
) -> tuple[list[list[float]], int]:
    """DataFrame-native Lloyd's algorithm: iterate nearest-centroid
    assignment + centroid recomputation until the max centroid shift falls
    under ``tol``. Deterministic: seeds are the k lowest-``id_col`` rows
    (no RNG), ties go to the lowest centroid id, so results are identical
    across runs and partitionings.

    The driver holds ONLY k*dim floats per round (the centroid matrix —
    a hyperparameter-sized collect, same bounded class as a join-strategy
    statistic); each round is one corpus scan + one map-side-combined
    shuffle of k*dim cells. This is the hand-rolled form of what
    pyspark.ml's KMeans does with treeAggregate; use that at scale for
    kmeans|| init and DenseVector kernels — this exists to show the
    iterative-trainer shape as a plain DataFrame loop (compare
    connected_components' label-propagation loop).

    Returns (centroids, iterations_run).
    """
    pts = points.select(F.col(id_col).alias("_pid"), F.col(vec_col).alias("_pv"))
    first = pts.orderBy("_pid").limit(k).collect()
    centroids = [[float(x) for x in r["_pv"]] for r in first]
    dim = len(centroids[0])
    iterations = 0
    for _ in range(max_iterations):
        iterations += 1
        assigned = _assign_literal_centroids(pts, centroids, kernel=kernel).select(
            F.col("_pv"), F.col("_cluster")
        )
        sums = (
            assigned.select("_cluster", F.posexplode("_pv").alias("_d", "_v"))
            .groupBy("_cluster", "_d")
            .agg(F.sum(F.col("_v").cast("double")).alias("_sv"), F.count(F.lit(1)).alias("_n"))
            .collect()
        )
        new_centroids = [list(c) for c in centroids]  # empty clusters keep position
        counts = [0] * k
        per_dim: dict[int, list[float]] = {}
        for r in sums:
            per_dim.setdefault(r["_cluster"], [0.0] * dim)[r["_d"]] = r["_sv"]
            counts[r["_cluster"]] = r["_n"]
        for ci, sv in per_dim.items():
            new_centroids[ci] = [x / counts[ci] for x in sv]
        shift = max(
            sum((a - b) ** 2 for a, b in zip(c0, c1)) ** 0.5
            for c0, c1 in zip(centroids, new_centroids)
        )
        centroids = new_centroids
        if shift < tol:
            break
    return centroids, iterations


def _driver_kmeans_loop_portable(
    X, centroids: list[list[float]], *, iterations: int, nano: int
) -> list[list[float]]:
    """The driver venue of :func:`kmeans_train_portable`: the identical
    loop over an in-memory float64 matrix. Bit-parity with the
    distributed venue holds term by term — assignment distances are the
    same sequential per-dim accumulation of exactly-rounded squares the
    arrow/JVM kernels compute (first-argmin = tie-to-lowest-cid);
    per-cluster sums are int64 over the same ``floor(x*1e9 + 0.5)``
    quantization (integer, order-independent, overflow-guarded by the
    caller); the centroid update reuses the exact ``(float(sum)/count)
    /nano`` expression. Pinned venue-vs-venue in
    tests/test_llmops_algos.py and end-to-end by the ml_kmeans_train /
    sim_ivf_topk oracles."""
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)
    k, dim = C.shape
    Q = np.floor(X * np.float64(nano) + np.float64(0.5)).astype(np.int64)
    for _ in range(iterations):
        acc = np.zeros((len(X), k), dtype=np.float64)
        for t in range(dim):
            d = X[:, t, None] - C[None, :, t]
            acc += d * d
        assign = acc.argmin(axis=1)
        new_c = [[float(v) for v in c] for c in C]  # empty clusters keep position
        for ci in range(k):
            members = assign == ci
            cnt = int(members.sum())
            if cnt:
                sv = Q[members].sum(axis=0)
                new_c[ci] = [(float(int(x)) / cnt) / nano for x in sv]
        C = np.asarray(new_c, dtype=np.float64)
    return [[float(v) for v in c] for c in C]


def kmeans_train_portable(
    points: DataFrame,
    *,
    k: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iterations: int = 5,
    nano: int = 10**9,
    kernel: str = "arrow",
    driver_cells: int = KMEANS_DRIVER_CELLS,
) -> list[list[float]]:
    """Lloyd's k-means whose every cross-engine-sensitive step is made
    engine-portable — the oracle-checkable twin of :func:`kmeans_train`
    (same loop and scale shape; the pagerank_portable doctrine applied to
    a centroid trainer):

    - per-dimension member sums run over NANO-QUANTIZED values
      (``floor(x*1e9 + 0.5)`` as bigint — txt_unigram_logprob's trick),
      so the sums are INTEGER and order-independent;
    - centroid_d = (double(sum_nano) / n) / 1e9 — the integer sum is
      rounded to a double FIRST (matching the oracle's
      ``CAST(SUM(..) AS DOUBLE) / COUNT``); int->double conversion and
      division are both IEEE-defined, so the replay is bit-identical in
      Python, Spark and DuckDB at any sum magnitude (not just < 2^53);
    - a FIXED iteration count replaces the tol early-stop (a data-driven
      break cannot unroll into SQL);
    - assignment distances reuse the literal-matrix single fold, whose
      left-to-right semantics DuckDB's list_sum replays exactly
      (ml_kmeans_step's proven parity).

    Cost of portability: ~1e-9 per-dimension truncation per round —
    invisible to any assignment that isn't already a coin flip. Returns
    the final centroid matrix (k x dim floats).

    VENUE is statistics-driven since r14 (the pagerank_portable
    discipline, verbatim): ONE probe action — ``limit(budget + 1)
    .toPandas()`` where budget = ``driver_cells // dim`` rows — and if
    the corpus comes back within budget and well-formed (every vector
    the seed width, no nulls/NaNs), it IS the training set: the loop
    runs as float64/int64 numpy on the driver
    (:func:`_driver_kmeans_loop_portable`), removing ``iterations``
    sequential Spark jobs (each of which re-scans the corpus, re-runs
    the assignment pass and shuffles a k*dim aggregate — measured 0.5-1 s
    per iteration of pure per-round constant at sf0.1's 2,000 vectors).
    Integer nano-sums are ORDER-INDEPENDENT and the float64 assignment
    arithmetic is the same IEEE op sequence, so both venues are
    bit-identical — pinned in tests/test_llmops_algos.py, and the DuckDB
    oracle (ml_kmeans_train) replays either. Over budget — the 100 TB
    regime — the distributed loop runs with the ``kernel`` of choice
    (default: the vectorized arrow assignment); that is a venue pick,
    never a semantics change.
    """
    pts = points.select(F.col(id_col).alias("_pid"), F.col(vec_col).alias("_pv"))
    first = pts.orderBy("_pid").limit(k).collect()
    centroids = [[float(x) for x in r["_pv"]] for r in first]
    dim = len(centroids[0])
    # no k floor (r15, ADVICE r14): driver_cells <= 0 must disable the
    # driver venue for ANY corpus (the escape hatch the venue-parity tests
    # use), so the probe is skipped outright rather than floored at k rows
    budget_rows = driver_cells // max(dim, 1)
    head = (
        pts.select("_pv").limit(budget_rows + 1).toPandas()
        if driver_cells > 0
        else None
    )
    if head is not None and len(head) <= budget_rows:
        import numpy as np

        vals = head["_pv"].to_numpy()
        try:
            ok = all(
                v is not None and len(v) == dim and None not in list(v)
                for v in vals
            )
            X = np.stack(vals).astype(np.float64) if ok else None
        except (TypeError, ValueError):
            X = None  # malformed rows: the distributed venue defines them
        if X is not None:
            # int64-sum overflow guard (the distributed venue's bigint sum
            # would raise under ANSI; the driver venue must not wrap
            # silently): worst-case |sum| < (max|q| + 1) * rows
            qmax = float(np.abs(X).max(initial=0.0)) * nano + 1.0
            if np.isfinite(X).all() and qmax * max(len(X), 1) < float(2**62):
                return _driver_kmeans_loop_portable(
                    X, centroids, iterations=iterations, nano=nano
                )
    q = F.floor(F.col("_v").cast("double") * nano + F.lit(0.5)).cast("bigint")
    for _ in range(iterations):
        assigned = _assign_literal_centroids(pts, centroids, kernel=kernel).select(
            F.col("_pv"), F.col("_cluster")
        )
        sums = (
            assigned.select("_cluster", F.posexplode("_pv").alias("_d", "_v"))
            .groupBy("_cluster", "_d")
            .agg(F.sum(q).alias("_sv"), F.count(F.lit(1)).alias("_n"))
            .collect()
        )
        new_centroids = [list(c) for c in centroids]  # empty clusters keep position
        counts: dict[int, int] = {}
        per_dim: dict[int, list[int]] = {}
        for r in sums:
            per_dim.setdefault(r["_cluster"], [0] * dim)[r["_d"]] = r["_sv"]
            counts[r["_cluster"]] = r["_n"]
        for ci, sv in per_dim.items():
            # float(x) FIRST: the oracle divides CAST(sum AS DOUBLE)/count,
            # i.e. it rounds the integer sum to a double before dividing.
            # Python's int/int true division instead rounds the exact
            # rational, which diverges once |sum_nano| >= 2^53 (r4 ADVICE).
            # Both engines convert int->double round-to-nearest-even and
            # divide per IEEE 754, so double(sum)/count matches DuckDB at
            # ANY magnitude — no 2^53 precondition needed.
            new_centroids[ci] = [(float(x) / counts[ci]) / nano for x in sv]
        centroids = new_centroids
    return centroids


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


def ivf_topk_portable(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 2,
    k: int = 10,
    iterations: int = 5,
    kernel: str = "arrow",
) -> DataFrame:
    """IVF approximate top-k on the PORTABLE quantizer — the oracle-
    checkable twin of :func:`ivf_topk` (VERDICT r7 #7): the coarse
    quantizer is :func:`kmeans_train_portable` (deterministic lowest-id
    seeds, integer-nano centroid updates, fixed iteration count), so the
    trained centroids, every cell assignment, every probe choice and the
    final cosine ranking all replay bit-for-bit in DuckDB as unrolled
    CTEs — the whole ANN index build becomes a checkable quantity, not
    just its recall.

    Scale shape (identical to ivf_topk): centroids are hyperparameter-
    sized and broadcast; corpus assignment is one narrow scan (per-row
    fold against the broadcast seed array, zero shuffles); probes are
    |queries| x n_probe rows and broadcast into the candidate join, so
    each query ranks ~corpus * n_probe / n_cells members instead of the
    full corpus. Ties everywhere go to the lowest cid / neighbor_id, the
    engine-portable order.
    """
    centroids = kmeans_train_portable(
        corpus, k=n_cells, id_col=id_col, vec_col=vec_col,
        iterations=iterations, kernel=kernel,
    )
    spark = corpus.sparkSession
    seeds = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)], "cid INT, cvec ARRAY<DOUBLE>"
    )
    # corpus -> cell: assign_to_seeds' fold is the oracle af CTE's proven
    # parity surface (ml_kmeans_train, green since round 4); the arrow
    # kernel is its bit-identical vectorized twin (r14)
    assigned = assign_to_seeds(
        corpus, seeds, id_col=id_col, vec_col=vec_col, kernel=kernel
    ).select(
        F.col("id").alias("neighbor_id"),
        F.col("cluster").alias("cell"),
        F.col("vec"),
    )

    # query -> n_probe nearest cells: same distance fold as the
    # assignment, but slice of the (dist, cid)-sorted array instead of
    # array_min — lexicographic struct sort = ORDER BY dist, cid
    from ecommerce_etl_pipeline_spark.llmops.similarity import cosine

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    seed_row = seeds.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("cid").alias("_cid"), F.col("cvec").alias("_cv")))
        ).alias("_seeds")
    )
    dist_to = lambda cv: F.aggregate(  # noqa: E731
        F.zip_with(
            F.col("_qv"), cv, lambda a, b: (a.cast("double") - b.cast("double")) ** 2
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    probes = (
        q.crossJoin(F.broadcast(seed_row))
        .filter(F.size("_seeds") > 0)
        .withColumn(
            "_probe",
            F.slice(
                F.array_sort(
                    F.transform(
                        F.col("_seeds"),
                        lambda sd: F.struct(
                            dist_to(sd["_cv"]).alias("dist"),
                            sd["_cid"].alias("cell"),
                        ),
                    )
                ),
                1,
                n_probe,
            ),
        )
        .select("query_id", "_qv", F.explode("_probe.cell").alias("cell"))
    )

    # candidates: cell assignment is unique per corpus vector, so a
    # (query, neighbor) pair appears at most once — no dedup needed
    scored = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine(F.col("_qv"), F.col("vec")))
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
