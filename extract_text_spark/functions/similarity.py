"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — brute-force exact top-k: the correctness baseline.
  Dot products are ordered left-to-right folds over the array
  (``zip_with`` + ``aggregate``), giving bit-identical doubles in any
  engine that folds sequentially — which is what makes the DuckDB oracle
  exact. Scale note: brute force is O(Q×N); at corpus scale Q is a bounded
  probe set (dedup candidates, eval queries), and N is pruned first (see
  ``ivf_topk``). The query side is broadcast: N-side never shuffles.
* ``ivf_topk`` — the scale path: coarse inverted-file search. Centroids
  per partition label are computed distributively, each query probes only
  its ``nprobe`` nearest clusters, and the fine search joins on cluster id
  (co-partitioned equi-join instead of a cross join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def dot_col(a: Column, b: Column) -> Column:
    """Ordered-fold dot product in double (bitwise-reproducible)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(dot_col(a, a))


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Exact brute-force top-k neighbours for each query vector.

    Output: (query_id, neighbor_id, rank, score). Ties broken by neighbor
    id ascending on the rounded score, so ranking is engine-portable.
    """
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"))
    v = vectors.select(F.col(id_col).alias("neighbor_id"),
                       F.col(vec_col).alias("nv"))
    # score in integer millionths: floor(cos*1e6+0.5) of bit-identical
    # doubles is engine-portable; round() half-way behaviour is not.
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "score_milli",
            F.floor(cosine_col(F.col("qv"), F.col("nv")) * 1000000.0 + 0.5)
            .cast("long"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_milli").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", "score_milli")
    )


def score_milli_col(a: Column, b: Column) -> Column:
    """Cosine in integer millionths — the engine-portable ranking unit."""
    return F.floor(cosine_col(a, b) * 1000000.0 + 0.5).cast("long")


def _milli_centroids(assigned: DataFrame, vec_col: str = "nv") -> DataFrame:
    """(cluster, nv) rows -> (cluster, centroid array<double>).

    Per-dim mean computed as sum of integer millionths divided by count:
    the sum is exact and order-free (no float partial-aggregation drift),
    the single long/long double division is IEEE-deterministic — so the
    centroid doubles are bit-identical in any engine, which is what makes
    the IVF oracles exact. (Cosine is scale-invariant, so the 1e6 scale
    needs no undoing.)
    """
    exploded = assigned.select(
        "cluster", F.posexplode(vec_col).alias("dim", "val")
    ).withColumn(
        "vm", F.floor(F.col("val").cast("double") * 1000000.0 + 0.5)
        .cast("long"),
    )
    return (
        exploded.groupBy("cluster", "dim")
        .agg((F.sum("vm").cast("double") / F.count("*")).alias("c"))
        .groupBy("cluster")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("dc"))
        .select("cluster", F.transform("dc", lambda x: x.c).alias("centroid"))
    )


def _ivf_search(
    v: DataFrame,           # (neighbor_id, nv, cluster)
    centroids: DataFrame,   # (cluster, centroid)
    queries: DataFrame,
    k: int,
    nprobe: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"))
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("cscore_milli").desc(), F.col("cluster").asc()
    )
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("cscore_milli",
                    score_milli_col(F.col("qv"), F.col("centroid")))
        .withColumn("prank", F.row_number().over(probe_w))
        .filter(F.col("prank") <= nprobe)
        .select("query_id", "qv", "cluster")
    )
    fine = (
        v.join(F.broadcast(probes), "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score_milli",
                    score_milli_col(F.col("qv"), F.col("nv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_milli").desc(), F.col("neighbor_id").asc()
    )
    return (
        fine.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", "score_milli")
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 3,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str | None = "label",
    k_clusters: int = 8,
    iters: int = 2,
) -> DataFrame:
    """IVF-style ANN: probe the nprobe nearest cluster centroids per query,
    fine-search only inside those clusters (equi-join on cluster id).

    ``label_col`` names a pre-existing clustering column; ``label_col=None``
    trains one with ``kmeans_fit`` (deterministic Lloyd's) first, so the
    operator works on unlabeled embeddings. Approximate (recall < 1 when
    the true neighbour lives in an unprobed cluster) — the 1000-executor
    path where a cross join is impossible.
    """
    if label_col is None:
        assigned, centroids = kmeans_fit(
            vectors, k=k_clusters, iters=iters,
            id_col=id_col, vec_col=vec_col,
        )
        v = assigned.select(F.col("vec_id").alias("neighbor_id"),
                            "nv", "cluster")
    else:
        v = vectors.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"),
            F.col(label_col).alias("cluster"),
        )
        centroids = _milli_centroids(v)
    return _ivf_search(v, centroids, queries, k, nprobe, id_col, vec_col)


def kmeans_fit(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Deterministic distributed Lloyd's -> (assignments, centroids).

    * init: the k lowest-id vectors become clusters 0..k-1 (deterministic
      and oracle-replicable; production would use k-means||).
    * assignment: cosine-millionths argmax against the broadcast centroids,
      ties to the lowest cluster id — one shuffle-free map per iteration.
    * update: per-dim integer-millionth mean (``_milli_centroids``); an
      emptied cluster keeps its previous centroid.

    Centroids (k x dim doubles) ride the driver between iterations exactly
    like Spark MLlib's KMeans — that is bounded state, not a collect of
    data. Vectors never leave the executors.

    Returns ``assignments (vec_id, nv, cluster)`` — the last iteration's
    assignment — and the final centroids ``(cluster, centroid)`` recomputed
    from that assignment (previous centroid kept for emptied clusters).
    """
    spark = vectors.sparkSession
    # Each iteration's centroid collect re-reads the vector table; persist
    # for the duration of the fit so iterations hit cache instead of the
    # source scan (unpersisted before returning — the returned lazy plans
    # recompute from source once per downstream action, as usual).
    v = vectors.select(F.col(id_col).alias("vec_id"),
                       F.col(vec_col).alias("nv")).persist()

    init_rows = (
        v.orderBy("vec_id").limit(k)
        .select("vec_id", F.transform("nv", lambda x: x.cast("double"))
                .alias("centroid"))
        .collect()
    )
    cent_rows = [(i, list(r["centroid"]))
                 for i, r in enumerate(sorted(init_rows,
                                              key=lambda r: r["vec_id"]))]

    def _assign(cent_df: DataFrame) -> DataFrame:
        w = Window.partitionBy("vec_id").orderBy(
            F.col("s").desc(), F.col("cluster").asc())
        return (
            v.crossJoin(F.broadcast(cent_df))
            .withColumn("s", score_milli_col(F.col("nv"), F.col("centroid")))
            .withColumn("r", F.row_number().over(w))
            .filter(F.col("r") == 1)
            .select("vec_id", "nv", "cluster")
        )

    assigned = None
    for _ in range(iters):
        cent_df = spark.createDataFrame(
            cent_rows, "cluster int, centroid array<double>")
        assigned = _assign(cent_df)
        new = {r["cluster"]: list(r["centroid"])
               for r in _milli_centroids(assigned).collect()}
        cent_rows = [(c, new.get(c, prev)) for c, prev in cent_rows]
    cent_df = spark.createDataFrame(
        cent_rows, "cluster int, centroid array<double>")
    v.unpersist(blocking=False)
    return assigned, cent_df
