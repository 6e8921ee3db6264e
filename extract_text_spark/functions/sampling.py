"""Deterministic sampling operators for training-data pipelines.

Sampling at 100 TB must be reproducible across reruns, engines and
partitionings — so no RNG state: membership is a pure function of the
row key (md5-derived uniform hash), exactly like the md5-derived
hyperplanes in dedup.embedding LSH. ``df.sample()`` is seed-stable only
per partitioning; this is stable, full stop, and has an exact SQL twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_MOD = 1_000_000


def hash_bucket_col(id_col: str | Column, salt: str = "") -> Column:
    """Uniform bucket in [0, 1e6) from md5(salt:id) — first 8 hex chars,
    portable to DuckDB as ('0x'||substr(md5(...),1,8))::BIGINT % 1000000."""
    key = F.concat(F.lit(salt), F.lit(":"),
                   (F.col(id_col) if isinstance(id_col, str) else id_col)
                   .cast("string"))
    return (F.conv(F.substring(F.md5(key), 1, 8), 16, 10)
            .cast("long") % _MOD)


def _case_map(col: str, mapping: dict[str, int], default: int) -> Column:
    """Literal when-chain over a small {value: int} map with a default —
    the broadcast-free form both samplers use for their handful of
    strata/sources."""
    out = None
    for name, val in mapping.items():
        cond = F.col(col) == name
        out = F.when(cond, val) if out is None else out.when(cond, val)
    return out.otherwise(default) if out is not None else F.lit(default)


def stratified_sample(df: DataFrame, fracs_milli: dict[str, int],
                      strata_col: str = "source",
                      id_col: str = "doc_id",
                      default_milli: int = 0) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row iff its hash bucket
    falls below the stratum's rate (in millionths). The rate map rides the
    plan as a literal CASE (broadcast-free for the usual handful of
    strata); membership never shuffles — it is a filter pushed at the
    scan, so at 10^12 docs the sample never materializes the reject set.
    """
    rate = _case_map(strata_col, fracs_milli, default_milli)
    bucket = hash_bucket_col(id_col, salt="strat")
    return df.where(bucket < rate)


def mixture_sample(df: DataFrame, target_counts: dict[str, int],
                   source_col: str = "source",
                   id_col: str = "doc_id") -> DataFrame:
    """Training-mixture construction: deterministically sample each
    source toward an absolute per-source document target (the
    Pile/LLaMA-style "domain mixing weights" step, expressed as target
    counts so the arithmetic is exact integers end-to-end).

    acceptance rate (millionths) = min(1e6, target * 1e6 div source_count)
    — a source below its target keeps everything (rate capped at 1.0);
    membership = md5 bucket < rate, reproducible across reruns, engines
    and partitionings like every sampler here.

    100 TB shape: one map-side-combinable count per source (domains are
    few — a handful of rows), broadcast-joined back, then a row-local
    membership filter right after the broadcast join; the reject set
    never shuffles or materializes and nothing large moves. Sources
    absent from ``target_counts`` get target 0 (dropped — an explicit
    mixture is a whitelist)."""
    counts = df.groupBy(source_col).agg(F.count("*").alias("_mix_n"))
    target = _case_map(source_col, target_counts, 0)
    rate = F.least(
        F.lit(_MOD).cast("long"),
        F.call_function("div", target.cast("long") * _MOD,
                        F.col("_mix_n")))
    bucket = hash_bucket_col(id_col, salt="mix")
    return (df.join(F.broadcast(counts), source_col)
              .where(bucket < rate)
              .drop("_mix_n"))


def pack_sequences(df: DataFrame, token_col: str, budget: int,
                   id_col: str = "doc_id",
                   buckets: int = 1024) -> DataFrame:
    """Token-budget sequence packing (training-batch construction):
    contiguous greedy packing of documents into bins of ``budget`` tokens
    — the concat-then-chunk semantics LLM pretraining pipelines use.

    Global first-fit is inherently sequential, so the scale form packs
    WITHIN uniform md5 hash buckets: each bucket packs independently in
    parallel (one shuffle on the bucket key + an in-partition sort), and
    bins are globally identified by (pack_bucket, pack_bin). That is the
    shape a 10^12-doc job needs anyway — bins feed parallel trainers.
    Within a bucket, docs pack in deterministic id order:
    ``pack_bin = exclusive-cumsum(tokens) // budget`` (an oversized doc
    overflows its own bin rather than being dropped)."""
    from pyspark.sql.window import Window
    bucket = hash_bucket_col(id_col, salt="pack") % buckets
    out = df.withColumn("pack_bucket", bucket)
    w = Window.partitionBy("pack_bucket").orderBy(id_col)
    cum_excl = F.sum(token_col).over(w) - F.col(token_col)
    # exact integral division (SQL `div`): a double floor would lose
    # exactness once a bucket's cumulative tokens pass 2^53 — precisely
    # the scale this operator exists for. Matches DuckDB's `//`.
    return out.withColumn(
        "pack_bin",
        F.call_function("div", cum_excl, F.lit(budget)).cast("long"))
