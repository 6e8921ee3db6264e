"""Checkpointed runs: idempotent resume via bucket manifests.

Simulates a killed run (only a subset of buckets processed), then resumes:
the final output must equal a one-shot run — no duplicates, no gaps — and
already-done buckets must not be reprocessed."""

import pyspark.sql.functions as F

from extract_text_spark.checkpoint import completed_buckets, run_extraction
from extract_text_spark.corpus import corpus_to_df, gen_corpus


def _result_map(spark, out_dir):
    rows = spark.read.parquet(f"{out_dir}/data").collect()
    return {
        r["doc_id"]: (r["status"],
                      [(s["kind"], s["text"], s["media_ref"], s["offset"])
                       for s in r["spans"]])
        for r in rows
    }


def test_partial_then_resume_equals_oneshot(spark, tmp_path):
    docs = corpus_to_df(spark, gen_corpus(80, seed=5))
    one, two = str(tmp_path / "oneshot"), str(tmp_path / "resumed")

    run_extraction(spark, docs, one, num_buckets=8)

    # "Killed" run: only even buckets complete.
    m1 = run_extraction(spark, docs, two, num_buckets=8,
                        bucket_filter=lambda b: b % 2 == 0)
    assert m1["buckets"] <= 4
    done = completed_buckets(spark, two)
    assert done is not None and done.count() == m1["buckets"]

    # Resume: processes only the remaining buckets.
    m2 = run_extraction(spark, docs, two, num_buckets=8)
    assert m2["buckets"] == 8 - m1["buckets"]

    assert _result_map(spark, two) == _result_map(spark, one)

    # Third run: everything checkpointed -> no work, no duplicates.
    m3 = run_extraction(spark, docs, two, num_buckets=8)
    assert m3["buckets"] == 0 and m3["docs"] == 0
    assert _result_map(spark, two) == _result_map(spark, one)


def test_rerun_overwrites_not_duplicates(spark, tmp_path):
    """resume=False re-runs everything; dynamic partition overwrite must
    replace bucket partitions, not append to them — via the WRITE-LOCAL
    option, proven here under a session forced to the static default (a
    session-wide static mode must not truncate other buckets either)."""
    docs = corpus_to_df(spark, gen_corpus(40, seed=6))
    out = str(tmp_path / "out")
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        run_extraction(spark, docs, out, num_buckets=4)
        n1 = spark.read.parquet(f"{out}/data").count()
        # partial rewrite under static session mode: only bucket-0/1 rows
        # are rewritten; buckets 2/3 must survive (write-local dynamic)
        run_extraction(spark, docs, out, num_buckets=4, resume=False,
                       bucket_filter=lambda b: b < 2)
        assert spark.read.parquet(f"{out}/data").count() == n1
        run_extraction(spark, docs, out, num_buckets=4, resume=False)
        assert spark.read.parquet(f"{out}/data").count() == n1
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # manifest keeps lineage of all three attempts (4 + 2 + 4 buckets)
    m = spark.read.parquet(f"{out}/_manifest")
    assert m.count() == 10
    assert m.select("app_id").distinct().count() == 1


def test_slash_in_input_doc_id_buckets_consistently(spark, tmp_path):
    """Input doc_ids containing '/' (file paths) must bucket by the FULL
    root id, not a split prefix — resume after a partial run must converge
    to the one-shot result with no lost or doubled docs."""
    docs = gen_corpus(60, seed=11)
    for d in docs:
        d["doc_id"] = f"s3://bucket/prefix/{d['doc_id']}"
    df = corpus_to_df(spark, docs)
    one, two = str(tmp_path / "one"), str(tmp_path / "two")
    run_extraction(spark, df, one, num_buckets=8)

    m1 = run_extraction(spark, df, two, num_buckets=8,
                        bucket_filter=lambda b: b % 2 == 0)
    m2 = run_extraction(spark, df, two, num_buckets=8)
    assert m1["buckets"] + m2["buckets"] == 8
    assert _result_map(spark, two) == _result_map(spark, one)
    # fan-out children (doc_id extended with member path) stay in their
    # parent's bucket: every child row shares the parent's partition value
    data = spark.read.parquet(f"{two}/data")
    n_children = data.filter(~F.col("doc_id").startswith("s3://")).count()
    assert n_children == 0  # all ids keep the root prefix
    # a third run is a no-op
    m3 = run_extraction(spark, df, two, num_buckets=8)
    assert m3["buckets"] == 0


def test_manifest_metrics(spark, tmp_path):
    docs = corpus_to_df(spark, gen_corpus(30, seed=7))
    out = str(tmp_path / "out")
    stats = run_extraction(spark, docs, out, num_buckets=4)
    m = spark.read.parquet(f"{out}/_manifest")
    row = m.agg(F.sum("n_docs").alias("d"), F.sum("n_spans").alias("s"),
                F.sum("bytes_in").alias("b")).collect()[0]
    assert row["d"] == stats["docs"] and row["d"] >= 30
    assert row["s"] == stats["spans"]
    assert row["b"] == stats["bytes_in"] and row["b"] > 0
    assert {r["status"] for r in m.collect()} == {"done"}
