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

import math

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
    # Norms hoisted to one fold per query / per vector (instead of one
    # per scored pair): score_milli_pre_col keeps the (qn * nn) order of
    # the cosine_col(qv, nv) site, so scores are bit-identical.
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv")) \
        .withColumn("qn", norm_col(F.col("qv")))
    v = vectors.select(F.col(id_col).alias("neighbor_id"),
                       F.col(vec_col).alias("nv")) \
        .withColumn("nn", norm_col(F.col("nv")))
    # score in integer millionths: floor(cos*1e6+0.5) of bit-identical
    # doubles is engine-portable; round() half-way behaviour is not.
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "score_milli",
            score_milli_pre_col(dot_col(F.col("qv"), F.col("nv")),
                                F.col("qn"), F.col("nn")),
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


def score_milli_pre_col(dot: Column, na: Column, nb: Column) -> Column:
    """``score_milli_col`` with the two norms PRE-computed (hoisted to
    one materialized column per side instead of one fold per scored
    pair — Catalyst does not CSE across HOF folds, so a pair join that
    scores with ``score_milli_col`` pays 3 array folds per pair where 1
    suffices). Callers must pass ``na``/``nb`` in the same order as the
    ``score_milli_col(a, b)`` site they replace: the expression shape
    ``dot / (na * nb) * 1e6 + 0.5`` is exactly ``cosine_col``'s, so the
    result is bit-identical and every oracle stays hash-exact."""
    return F.floor(dot / (na * nb) * 1000000.0 + 0.5).cast("long")


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
    # Norms hoisted (score_milli_pre_col): one fold per query vector /
    # per centroid / per corpus vector instead of one per scored pair;
    # (qn * cn) / (qn * nn) keep the score_milli_col argument order, so
    # every probe and fine score is bit-identical.
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv")) \
        .withColumn("qn", norm_col(F.col("qv")))
    cents = centroids.withColumn("cn", norm_col(F.col("centroid")))
    vv = v.withColumn("nn", norm_col(F.col("nv")))
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("cscore_milli").desc(), F.col("cluster").asc()
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("cscore_milli",
                    score_milli_pre_col(
                        dot_col(F.col("qv"), F.col("centroid")),
                        F.col("qn"), F.col("cn")))
        .withColumn("prank", F.row_number().over(probe_w))
        .filter(F.col("prank") <= nprobe)
        .select("query_id", "qv", "qn", "cluster")
    )
    fine = (
        vv.join(F.broadcast(probes), "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score_milli",
                    score_milli_pre_col(dot_col(F.col("qv"), F.col("nv")),
                                        F.col("qn"), F.col("nn")))
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

    def _assign(rows: list) -> DataFrame:
        # Centroids are bounded driver state (k x dim doubles, exactly
        # MLlib's KMeans contract), so they ride the plan as LITERALS:
        # argmax is array_min over (negated score, cluster) structs —
        # lexicographic, so ties go to the lowest cluster id, identical
        # to the former row_number() over (s DESC, cluster ASC) — and
        # the assignment is a zero-shuffle projection instead of a
        # crossJoin + Window Exchange of the k-times-inflated corpus.
        #
        # Catalyst does not CSE across HOF folds (CLAUDE.md), so the
        # shared subexpressions are hoisted by hand: ||nv|| becomes ONE
        # materialized column instead of one fold per centroid entry,
        # and each ||centroid|| is folded on the driver — Python floats
        # ARE IEEE doubles and the left-to-right acc + x*x / math.sqrt
        # sequence is exactly Spark's aggregate fold + sqrt, so the
        # literal is bit-identical to the former runtime norm_col and
        # every downstream floor(cos*1e6+0.5) is unchanged. Per-row
        # work drops from 3k folds to k+1.
        entries = []
        for c, cent in rows:
            acc = 0.0
            for x in cent:
                acc = acc + x * x
            nb = math.sqrt(acc)
            s = F.floor(
                dot_col(F.col("nv"), F.array(*[F.lit(x) for x in cent]))
                / (F.col("na") * F.lit(nb)) * 1000000.0 + 0.5
            ).cast("long")
            entries.append(F.struct((-s).alias("negs"),
                                    F.lit(c).alias("cluster")))
        best = F.array_min(F.array(*entries))
        return (v.select("vec_id", "nv", norm_col(F.col("nv")).alias("na"))
                .select("vec_id", "nv",
                        best.getField("cluster").alias("cluster")))

    assigned = None
    for _ in range(iters):
        assigned = _assign(cent_rows)
        new = {r["cluster"]: list(r["centroid"])
               for r in _milli_centroids(assigned).collect()}
        cent_rows = [(c, new.get(c, prev)) for c, prev in cent_rows]
    cent_df = spark.createDataFrame(
        cent_rows, "cluster int, centroid array<double>")
    v.unpersist(blocking=False)
    return assigned, cent_df


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al. 2011) — the memory-bound scale path
# ---------------------------------------------------------------------------

def quant_milli_col(a: Column) -> Column:
    """array<float> -> array<long> integer millionths via the repo's
    portable rounding convention floor(x*1e6 + 0.5) (round() half-way
    behaviour differs between engines; floor of an IEEE double does
    not). All PQ arithmetic downstream is exact integer math."""
    return F.transform(a, lambda x: F.floor(
        x.cast("double") * 1000000.0 + F.lit(0.5)).cast("long"))


def l2_milli_col(a: Column, b: Column) -> Column:
    """Exact squared-L2 distance between two integer-millionth arrays.
    Order-free integer sum — (2e6)^2 per dim times any practical
    subspace width stays far inside BIGINT."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"), lambda acc, v: acc + v)


def _trunc_div(a: int, b: int) -> int:
    """Truncating integer division (toward zero) — DuckDB's `//` and
    Spark's `div` truncate, Python's `//` floors; centroid coordinates
    go negative, so the driver-side mean must truncate to match."""
    q = abs(a) // b
    return -q if a < 0 else q


def pq_fit(vectors: DataFrame, dim: int, m: int = 2, k: int = 4,
           iters: int = 2, id_col: str = "vec_id",
           vec_col: str = "embedding") -> list:
    """Train a product-quantization codebook: split each vector into
    ``m`` equal subspaces and run deterministic integer Lloyd's with
    squared-L2 distance independently per subspace (Jégou et al. 2011
    §II). Determinism: inputs quantize to integer millionths once;
    init is the k lowest-id subvectors as clusters 0..k-1; assignment
    argmin ties to the lowest cluster id; the centroid update is a
    per-dimension integer sum with ONE truncating division (exact and
    order-free — the kmeans-oracle trick, L2 flavour); an emptied
    cluster keeps its previous centroid.

    Scale shape: per round each subspace does one map-side-combined
    (cluster, dim) aggregate over the corpus; driver state is the
    m*k*(dim/m) = k*dim codebook itself — exactly MLlib's KMeans
    contract. Returns codebooks[m][k][dim//m] (Python ints)."""
    sub = dim // m
    if sub * m != dim:
        raise ValueError(f"dim {dim} not divisible into {m} subspaces")
    v = vectors.select(
        F.col(id_col).alias("vec_id"),
        *[F.slice(quant_milli_col(F.col(vec_col)), j * sub + 1, sub)
          .alias(f"s{j}") for j in range(m)]).persist()
    init = (v.orderBy("vec_id").limit(k)
            .select("vec_id", *[f"s{j}" for j in range(m)]).collect())
    init = sorted(init, key=lambda r: r["vec_id"])
    books = [[list(r[f"s{j}"]) for r in init] for j in range(m)]
    for _ in range(iters):
        for j in range(m):
            # Training assignment reuses the scan-side literal-codebook
            # argmin (`_pq_code_col`: array_min over (d, cluster)
            # structs — ties to the lowest cluster id, identical to the
            # former row_number() over (d ASC, cluster ASC)): the
            # codebook is bounded driver state between rounds, so each
            # round is a zero-shuffle projection + one map-side-combined
            # aggregate instead of a crossJoin + Window Exchange of the
            # k-times-inflated corpus.
            assigned = v.select(
                "vec_id", F.col(f"s{j}").alias("sv"),
                _pq_code_col(F.col(f"s{j}"), books[j]).alias("cluster"))
            sums = (assigned
                    .select("cluster", F.posexplode("sv")
                            .alias("i", "x"))
                    .groupBy("cluster", "i")
                    .agg(F.sum("x").alias("sx"),
                         F.count(F.lit(1)).alias("n"))
                    .collect())
            acc: dict = {}
            for r in sums:
                acc.setdefault(r["cluster"], {})[r["i"]] = (
                    _trunc_div(int(r["sx"]), int(r["n"])))
            for c in range(k):
                if c in acc:
                    books[j][c] = [acc[c][i] for i in range(sub)]
    v.unpersist(blocking=False)
    return books


def _pq_code_col(sv: Column, book: list) -> Column:
    """Scan-side argmin over a literal sub-codebook: an array of
    (distance, cluster) structs reduced with array_min (lexicographic —
    ties to the lowest cluster id). ZERO shuffle: encoding 100 TB of
    vectors is a pure projection."""
    entries = [F.struct(
        l2_milli_col(sv, F.array(*[F.lit(x) for x in cent])).alias("d"),
        F.lit(c).alias("c"))
        for c, cent in enumerate(book)]
    return F.array_min(F.array(*entries)).getField("c")


def pq_encode(vectors: DataFrame, codebooks: list, dim: int,
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """(id, vector) -> (vec_id, code0..code{m-1}): each subvector maps
    to its nearest sub-centroid. The codebook rides the plan as
    literals, so the whole encode is whole-stage-codegen projection —
    no join, no shuffle, no Python."""
    m = len(codebooks)
    sub = dim // m
    q = quant_milli_col(F.col(vec_col))
    return vectors.select(
        F.col(id_col).alias("vec_id"),
        *[_pq_code_col(F.slice(q, j * sub + 1, sub), codebooks[j])
          .alias(f"code{j}") for j in range(m)])


def pq_adc_topk(vectors: DataFrame, queries: DataFrame, codebooks: list,
                dim: int, k: int = 3, id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Asymmetric-distance top-k (ADC, Jégou et al. 2011 §III): the
    corpus is searched through its PQ codes only — per query, the
    distance to each sub-centroid is computed ONCE (an m*k table that
    rides the broadcast row), and a candidate's score is m table
    lookups + a sum, never a d-dimensional computation. Output:
    (query_id, neighbor_id, rnk, adist_milli2) with adist ascending,
    ties to the lowest neighbor id.

    Scale: codes are (m * log2(k)/8) bytes per vector — 100 TB of
    float32 embeddings compress ~256x at production m/k, which is the
    entire point: the scan that brute force cannot afford runs over
    codes that fit in memory. Exact-rerank of the ADC head (fetching
    true vectors for the top candidates) composes with cosine_topk."""
    m = len(codebooks)
    sub = dim // m
    codes = pq_encode(vectors, codebooks, dim, id_col, vec_col)
    qq = queries.select(
        F.col(id_col).alias("query_id"),
        *[F.slice(quant_milli_col(F.col(vec_col)), j * sub + 1, sub)
          .alias(f"q{j}") for j in range(m)])
    # per-query distance tables: dt{j} = [d(q_sub, centroid_c)]_c
    qq = qq.select("query_id", *[
        F.array(*[l2_milli_col(F.col(f"q{j}"),
                               F.array(*[F.lit(x) for x in cent]))
                  for cent in codebooks[j]]).alias(f"dt{j}")
        for j in range(m)])
    adist = None
    for j in range(m):
        term = F.element_at(F.col(f"dt{j}"), F.col(f"code{j}") + 1)
        adist = term if adist is None else adist + term
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist_milli2").asc(), F.col("neighbor_id").asc())
    return (codes.withColumnRenamed("vec_id", "neighbor_id")
            .crossJoin(F.broadcast(qq))
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .withColumn("adist_milli2", adist)
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("query_id", "neighbor_id", "rnk", "adist_milli2"))
