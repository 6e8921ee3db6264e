"""Structured Streaming paths.

The reference is a request/response service; its streaming analogue here is
a continuously-ingesting extraction job:

* ``stream_extract_spans`` — ``readStream`` over the documents table (file
  source) -> archive fan-out + the same Arrow-batched extraction kernel ->
  parquet sink with a streaming checkpoint. Exactly-once per input file via
  the file-source offset log + sink commit log: re-running with the same
  checkpoint emits nothing new. ``skew_split=True`` routes each micro-batch
  through ``foreachBatch`` so the full batch skew machinery (window-ranked
  span chunking + reassembly — both unsupported on streaming DataFrames)
  runs per trigger; exactly-once is preserved by writing every batch into
  its own ``batch_id=N`` partition with dynamic overwrite, so a replayed
  batch REPLACES its partition instead of appending duplicates.
* ``windowed_event_counts`` — event-time tumbling-window aggregation with a
  watermark for late data (append mode: only closed windows emit).
* ``sessionize_stream`` — custom stateful operator via
  ``applyInPandasWithState``: per-user session counting with a 30-minute
  inactivity gap, GroupState carrying (last_ts, n_sessions, n_events).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
    TimestampType,
)

from ..pipeline import DOC_SCHEMA, OUT_SCHEMA, explode_archives_df, _extract_batches

SESSION_GAP_S = 1800


def _skew_safe_sink(output_path: str, extract):
    """foreachBatch sink running the batch extraction (incl. the skew
    splitter) per micro-batch, idempotently.

    foreachBatch is at-least-once on its own — a crash between the write
    and the offset commit replays the batch. Writing each batch into its
    own ``batch_id`` partition with dynamic overwrite makes the replay
    REPLACE the torn partition, restoring exactly-once without the file
    sink's commit log (which foreachBatch bypasses)."""
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (extract(batch_df)
         .withColumn("batch_id", F.lit(batch_id))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id")
         .parquet(output_path))
    return sink


def stream_extract_spans(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    skew_split: bool = False,
    skew_threshold: int | None = None,
):
    """Streaming extraction: parquet file source -> kernel -> parquet sink.

    ``skew_split=True``: a 400-page whale inside one micro-batch would
    otherwise be one giant task; this routes the batch through
    ``foreachBatch`` + pipeline.extract_spans_df so whales are span-chunked
    across tasks and reassembled exactly as on the batch path."""
    reader = spark.readStream.schema(DOC_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(input_path)
    if skew_split:
        from ..pipeline import extract_spans_df
        kwargs = {} if skew_threshold is None else {
            "skew_threshold": skew_threshold}
        writer = docs.writeStream.foreachBatch(_skew_safe_sink(
            output_path,
            lambda b: extract_spans_df(b.select("doc_id", "spans"),
                                       skew_split=True, **kwargs),
        )).option("checkpointLocation", checkpoint_path)
    else:
        fanned = explode_archives_df(docs)
        out = fanned.select("doc_id", "spans", "status").mapInPandas(
            _extract_batches, schema=OUT_SCHEMA
        )
        writer = (
            out.writeStream.format("parquet")
            .option("path", output_path)
            .option("checkpointLocation", checkpoint_path)
            .outputMode("append")
        )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


_BINARY_SCHEMA = StructType([
    StructField("path", StringType()),
    StructField("modificationTime", TimestampType()),
    StructField("length", LongType()),
    StructField("content", BinaryType()),
])


def stream_extract_files(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    validate: bool = False,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    skew_split: bool = False,
    skew_threshold: int | None = None,
):
    """Streaming extraction over RAW FILES: ``binaryFile`` source -> byte
    ingest kernel (real zip/tar/ooxml/pdf parsing, ingest.py) -> JVM
    archive fan-out -> extraction kernel -> parquet sink.

    This is the reference's actual usage pattern (clients POST files, the
    service extracts) as a continuously-ingesting job: drop files into a
    directory, get extracted span rows exactly-once per file (file-source
    offset log + sink commit log). ``validate=True`` applies the S6
    fail-closed MIME gate; quarantined files surface as error-status rows.
    ``skew_split=True`` runs the batch skew splitter per micro-batch via
    foreachBatch (see stream_extract_spans) — a whale PDF dropped into the
    watch directory is chunked across tasks instead of pinning one core.
    """
    from ..ingest import ingest_bytes_df
    reader = spark.readStream.format("binaryFile").schema(_BINARY_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    from ..ingest import named_binary_df
    named = named_binary_df(reader.load(input_path))
    if skew_split:
        from ..ingest import extract_from_bytes
        kwargs = {} if skew_threshold is None else {
            "skew_threshold": skew_threshold}
        writer = named.writeStream.foreachBatch(_skew_safe_sink(
            output_path,
            lambda b: extract_from_bytes(b, validate=validate,
                                         skew_split=True,
                                         materialize=False, **kwargs),
        )).option("checkpointLocation", checkpoint_path)
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
    return _start_span_sink(ingest_bytes_df(named, validate=validate),
                            output_path, checkpoint_path, available_now)


def _start_span_sink(ingested: DataFrame, output_path: str,
                     checkpoint_path: str, available_now: bool):
    """Shared streaming tail: span-model docs -> JVM fan-out -> extraction
    kernel -> append parquet sink. One place owns the sink shape for every
    streaming source (files, URLs, span tables)."""
    fanned = explode_archives_df(ingested)
    out = fanned.select("doc_id", "spans", "status").mapInPandas(
        _extract_batches, schema=OUT_SCHEMA
    )
    writer = (
        out.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_extract_urls(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    fetch,
    user_agent: str | None = None,
    resolver=None,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
):
    """Streaming URL extraction (S3 as a continuous source): drop files of
    URLs (one per line) into a watch directory -> SSRF validation +
    injected fetch + content routing (urlsource.py) -> the SAME JVM
    fan-out + extraction kernel as every other source -> parquet sink,
    exactly-once per URL file (file-source offset log + sink commit log).

    ``fetch``/``resolver`` are the injected network tier — in production a
    rate-limited HTTP client, in tests a deterministic fake; the engine
    owns validation, routing and extraction (the reference's
    /v1/extract/url semantics, app/main.py:516-639).
    """
    from ..urlsource import default_resolver, ingest_urls_df
    reader = spark.readStream.format("text")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    urls = reader.load(input_path).select(F.col("value").alias("url"))
    ingested = ingest_urls_df(
        urls, fetch, user_agent=user_agent,
        resolver=resolver if resolver is not None else default_resolver)
    return _start_span_sink(ingested, output_path, checkpoint_path,
                            available_now)


def stream_extract_warc(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
):
    """Streaming WARC ingestion: a crawl-delivery watch directory of
    .warc / .warc.gz files -> record split + content routing
    (warcsource.ingest_warc_df) -> JVM archive fan-out -> extraction
    kernel -> parquet sink, exactly-once per WARC file (file-source
    offset log + sink commit log) — the continuous CommonCrawl ingest
    loop as a Structured Streaming job. Task granularity is one WARC
    file per micro-batch row, the same unit as the batch path. doc_ids
    are FULL file paths (the ingest.named_binary_df convention) — a
    crawl delivery keeps same-named files in different segment
    directories, and basenames would conflate their records."""
    from ..warcsource import ingest_warc_df
    reader = spark.readStream.format("binaryFile").schema(_BINARY_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    files = reader.load(input_path).select(
        F.col("path").alias("doc_id"), "content")
    return _start_span_sink(ingest_warc_df(files), output_path,
                            checkpoint_path, available_now)


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "30 minutes") -> DataFrame:
    """Watermarked tumbling-window counts per event_type (append-safe)."""
    # watermarks need TIMESTAMP (not NTZ); session tz is pinned to UTC
    events = events.withColumn("ts", F.col("ts").cast(TimestampType()))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
             .alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n_events", "sum_value")
    )


_SESSION_STATE = StructType([
    StructField("last_ts", LongType()),
    StructField("n_sessions", IntegerType()),
    StructField("n_events", LongType()),
])
_SESSION_OUT = StructType([
    StructField("user_id", LongType()),
    StructField("n_sessions", IntegerType()),
    StructField("n_events", LongType()),
])


def _session_fn(key, pdfs: Iterator, state: GroupState) -> Iterator:
    import pandas as pd

    if state.exists:
        last_ts, n_sessions, n_events = state.get
    else:
        last_ts, n_sessions, n_events = None, 0, 0
    ts_all = []
    for pdf in pdfs:
        ts_all.extend(int(t.timestamp()) for t in pdf["ts"])
    for t in sorted(ts_all):
        if last_ts is None or t - last_ts > SESSION_GAP_S:
            n_sessions += 1
        last_ts = t
        n_events += 1
    state.update((last_ts, n_sessions, n_events))
    yield pd.DataFrame([(key[0], n_sessions, n_events)],
                       columns=["user_id", "n_sessions", "n_events"])


def sessionize_stream(events: DataFrame) -> DataFrame:
    """Custom stateful operator: 30-min-gap sessions per user.

    ``applyInPandasWithState`` keeps (last_ts, n_sessions, n_events) per
    user across micro-batches; update mode emits the running totals."""
    return events.groupBy("user_id").applyInPandasWithState(
        _session_fn,
        outputStructType=_SESSION_OUT,
        stateStructType=_SESSION_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_dedup_incremental(
    spark: SparkSession,
    input_path: str,
    snapshot: DataFrame,
    output_path: str,
    checkpoint_path: str,
    threshold: float,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
):
    """Streaming twin of ``dedup.snapshot_dedup`` — the recurring-crawl
    ingest loop: a parquet watch directory of arriving (doc_id, text)
    batches, each micro-batch deduped against a STATIC corpus snapshot
    (exact md5 tier + cross-side MinHash band join + exact-Jaccard
    verification), keep/drop decisions landing exactly-once.

    ``foreachBatch`` because the operator composes aggregates and
    multi-way joins that streaming DataFrames cannot express
    incrementally; exactly-once via the per-batch dynamic-overwrite
    partition pattern (``_skew_safe_sink`` — a replayed batch REPLACES
    its batch_id partition). The snapshot artifacts (shingles, band
    keys, fingerprint set) are precomputed ONCE here and reused by every
    micro-batch — recomputing them per trigger would repeat the full
    snapshot scan and pile up persisted copies N times over the stream's
    lifetime. A production loop would also append each batch's keepers
    to those persisted tables between triggers — same plan from the
    join onward.
    """
    from ..functions.dedup import snapshot_dedup, snapshot_dedup_tables

    snap_tables = snapshot_dedup_tables(snapshot)
    schema = StructType([StructField("doc_id", LongType()),
                         StructField("text", StringType())])
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(input_path)
    writer = docs.writeStream.foreachBatch(_skew_safe_sink(
        output_path,
        lambda b: snapshot_dedup(b, snapshot, threshold,
                                 snap_tables=snap_tables),
    )).option("checkpointLocation", checkpoint_path)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
