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


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 3,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """IVF-style ANN: probe the nprobe nearest label-centroids per query,
    fine-search only inside those clusters (equi-join on cluster id).

    Approximate (recall < 1 when the true neighbour lives in an unprobed
    cluster) — the 1000-executor path where a cross join is impossible.
    """
    dim_idx = F.sequence(F.lit(1), F.size(vec_col))
    exploded = vectors.select(
        F.col(label_col).alias("cluster"),
        F.posexplode(vec_col).alias("dim", "val"),
    )
    centroids = (
        exploded.groupBy("cluster", "dim").agg(F.avg("val").alias("c"))
        .groupBy("cluster")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("dc"))
        .select("cluster", F.transform("dc", lambda x: x.c).alias("centroid"))
    )
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"))
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("cscore").desc(), F.col("cluster").asc()
    )
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("cscore", cosine_col(F.col("qv"), F.col("centroid")))
        .withColumn("prank", F.row_number().over(probe_w))
        .filter(F.col("prank") <= nprobe)
        .select("query_id", "qv", "cluster")
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"),
        F.col(label_col).alias("cluster"),
    )
    fine = (
        v.join(F.broadcast(probes), "cluster")
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
        fine.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", "score_milli")
    )
