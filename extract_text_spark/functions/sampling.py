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
    rate = None
    for name, milli in fracs_milli.items():
        cond = F.col(strata_col) == name
        rate = (F.when(cond, milli) if rate is None
                else rate.when(cond, milli))
    rate = (rate.otherwise(default_milli) if rate is not None
            else F.lit(default_milli))
    bucket = hash_bucket_col(id_col, salt="strat")
    return df.where(bucket < rate)
