"""Structured Streaming surface: live crawl/event metrics.

The reference's event loop is poll-driven batch, not event-time streaming
(SURVEY.md §2.6) — the engine's crawl is therefore iterative batch. This
module is the *streaming-native* metrics side-car a long crawl runs next to
the superstep loop: the visits table directory (each wave commits new
parquet files) doubles as a file-source stream, so per-host fetch rates and
status histograms update continuously without touching the crawl's plan.

Also exposes the generic event-stream rollup over the driver's ``events``
table shape (event-time windows + watermark for late data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "visits_stream", "host_rate_metrics", "event_window_rollup",
    "stream_dedup_first_wins", "pages_stream", "stream_scrape_edges",
    "images_stream", "stream_image_gates", "stream_commit_to_store",
]

# the north-rule input table shape (BASELINE.json input_hint)
IMAGES_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long"
)

VISITS_SCHEMA = (
    "wave int, seq long, url string, request_url string, original_url string, "
    "redirect_history array<string>, status int, depth int, host_key string"
)

PAGES_SCHEMA = (
    "url string, status int, content_type string, content_length bigint, "
    "body binary, redirect_to string"
)


def pages_stream(
    spark: SparkSession, pages_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Fetched-pages directory as a micro-batch file source (the landing
    zone of a continuous fetch tier). ``max_files_per_trigger`` bounds
    per-batch page bytes — the streaming analog of the batch loop's
    payload-budget partitioning."""
    r = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(pages_dir)


def stream_scrape_edges(pages: DataFrame) -> DataFrame:
    """P1-P9 + R1-R5 under Structured Streaming: the SAME Arrow-batched
    extraction + vectorized resolve operators the batch loop runs
    (operators/scrape — mapInPandas and pandas_udf are micro-batch
    transparent), applied to a page stream. Stateless, so no watermark
    here; chain ``stream_dedup_first_wins`` for the D2/D3 stage and an
    append sink for the frontier — the continuous-ingest decomposition
    of the batch wave. Batch/stream equivalence is pinned by test
    (same fixture, availableNow vs batch, identical edge rows)."""
    from ..operators.scrape import resolve_children, scrape_edges

    return resolve_children(scrape_edges(pages))


def images_stream(
    spark: SparkSession, images_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """The north-rule image+caption table directory as a micro-batch
    file source — the continuous-ingest landing zone of the image sink
    (each crawl wave commits new parquet files of IMAGES_SCHEMA rows).
    ``max_files_per_trigger`` bounds per-batch payload bytes, the
    streaming analog of the batch loop's payload-budget partitioning."""
    r = spark.readStream.schema(IMAGES_SCHEMA)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(images_dir)


def stream_image_gates(images: DataFrame, min_px: int = 256 * 256) -> DataFrame:
    """The curation gates under Structured Streaming: per image row a
    verdict — ``exact_dup`` is the STATEFUL stage (chain
    ``stream_dedup_first_wins`` keyed on phash upstream; this transform
    is stateless so it stays micro-batch transparent), ``captionless``
    and ``lowres`` are the same projections image_curation_pipeline
    applies in batch. NEAR-dup clustering needs global pair state and
    remains the batch compaction pass — the standard lambda split for a
    continuous image ingest. Batch/stream row equivalence is pinned by
    test (same fixture, availableNow vs batch)."""
    cap = F.coalesce(F.col("caption"), F.lit(""))
    return images.select(
        "image_id",
        "fmt",
        F.length("bytes").cast("long").alias("n_bytes"),
        "w",
        "h",
        F.when(cap == "", F.lit("captionless"))
        .when(F.col("w") * F.col("h") < F.lit(min_px), F.lit("lowres"))
        .otherwise(F.lit("kept"))
        .alias("verdict"),
    )


def stream_caption_pii_scrub(images: DataFrame) -> DataFrame:
    """pii_redact's detect+redact chain as a stateless streaming
    projection over the image table's caption column — the privacy gate
    a continuous image+caption ingest applies before rows land in the
    training store. Same patterns and replacement order (email -> ip ->
    phone) as datapipe.queries._q_pii_redact, so the batch query and the
    streaming gate can never drift; JVM regexp functions keep the
    projection whole-stage-codegen inside each micro-batch (stateless:
    micro-batch transparent, no watermark needed)."""
    from ..datapipe.queries import _PII_EMAIL, _PII_IPV4, _PII_PHONE

    cap = F.coalesce(F.col("caption"), F.lit(""))
    scrub = cap
    counts = {}
    for name, pat, rep in (
        ("n_emails", _PII_EMAIL, "<EMAIL>"),
        ("n_ipv4", _PII_IPV4, "<IP>"),
        ("n_phones", _PII_PHONE, "<PHONE>"),
    ):
        counts[name] = F.size(
            F.regexp_extract_all(cap, F.lit(pat), F.lit(0))
        ).cast("long")
        scrub = F.regexp_replace(scrub, pat, rep)
    return images.select(
        "image_id",
        counts["n_emails"].alias("n_emails"),
        counts["n_phones"].alias("n_phones"),
        counts["n_ipv4"].alias("n_ipv4"),
        scrub.alias("caption_scrubbed"),
    )


def visits_stream(spark: SparkSession, visits_dir: str) -> DataFrame:
    """File-source stream over the store's committed visit snapshots."""
    return (
        spark.readStream.schema(VISITS_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(visits_dir)
    )


def host_rate_metrics(visits: DataFrame) -> DataFrame:
    """Per-host fetch/error tallies over a streaming visits frame.

    Complete-mode aggregation: host cardinality is bounded by the frontier's
    politeness state, so state stays small relative to the crawl."""
    return visits.groupBy("host_key").agg(
        F.count(F.lit(1)).alias("fetched"),
        F.sum(F.when(F.col("status").isNull(), 1).otherwise(0)).alias("errors"),
        F.max("depth").alias("max_depth"),
    )


def event_window_rollup(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Event-time windowed rollup with late-data watermark over the events
    stream shape (event_id, ts, user_id, event_type, value, props)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 3).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type", "n", "total_value",
        )
    )


def stream_dedup_first_wins(
    candidates: DataFrame,
    ts_col: str = "event_ts",
    key_col: str = "digest",
    watermark: str = "1 hour",
) -> DataFrame:
    """D2/D3 in Structured Streaming form: first-emit-wins dedup on the
    digest with BOUNDED state.

    The batch engine's seen set is exact and unbounded (bloom+anti-join
    past the broadcast cutoff); a streaming ingest of candidate URLs
    instead bounds the dedup state with an event-time watermark —
    ``dropDuplicatesWithinWatermark`` keeps a key's state only until the
    watermark passes it, so state size tracks the late-data horizon
    rather than the crawl's lifetime. This is the standard shape for a
    continuous 10^10-scale frontier ingest: exact within the horizon,
    with the durable seen table (batch anti-join on commit) as the
    global backstop — the same two-tier layout the batch loop uses.
    """
    return candidates.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        [key_col]
    )


def stream_commit_to_store(
    df: DataFrame,
    store,
    name: str,
    checkpoint_dir: str,
    mode: str = "append",
    trigger: dict | None = None,
):
    """Exactly-once streaming sink into the snapshot TableStore.

    ``foreachBatch`` gives at-least-once delivery: after a crash between
    the sink's write and the checkpoint commit, Structured Streaming
    REPLAYS the last micro-batch. The store's own snapshot meta carries
    the last committed ``stream_batch_id``, and a replayed batch id
    (``<=`` the recorded one — batch ids are monotonic within one
    checkpoint lineage) is skipped, upgrading the pipeline to
    exactly-once the same way the crawl's resume path skips re-fetching
    committed waves (scheduler checkpoint contract). Meta rides in the
    table's committed manifest, so idempotence survives process death —
    not just session state.

    Returns the started query. ``trigger`` passes through to
    ``writeStream.trigger`` (default ``availableNow=True`` — drain the
    source and stop; continuous ingest passes
    ``{"processingTime": "30 seconds"}``-style cadences).
    """

    def commit_batch(batch_df, batch_id: int) -> None:
        meta = store.latest_meta(name) or {}
        last = meta.get("stream_batch_id")
        if last is not None and batch_id <= last:
            return  # replay after a sink-commit/checkpoint race: durable
        store.commit(
            name, batch_df, mode=mode, meta={"stream_batch_id": batch_id}
        )

    return (
        df.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
