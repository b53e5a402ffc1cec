"""Structured Streaming ingestion of page batches.

The reference's streaming surface is chunked parse of one document
(/root/reference/DOM.xs:814-931) — per SURVEY.md §2.9 the Spark analog
is WARC-batch ingestion: ``readStream`` over arriving page files →
the same extraction kernel → ``writeStream`` with checkpointing.  The
kernel is identical to the batch path (mapInPandas works unchanged on
streaming DataFrames); exactly-once lands on the sink's commit log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.extract import extract_pages

PAGES_SCHEMA = (
    "doc_id bigint, url string, warc_ts timestamp, html binary, "
    "text string, lang string"
)


def read_page_stream(spark: SparkSession, input_dir: str,
                     max_files_per_trigger: int = 4) -> DataFrame:
    """Stream of page rows from parquet files landing in input_dir."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def extract_stream(pages: DataFrame, span_selector: str | None = "a[href]") -> DataFrame:
    """Streaming extraction — same kernel as batch."""
    return extract_pages(pages, span_selector=span_selector)


def start_extraction(spark: SparkSession, input_dir: str, output_dir: str,
                     checkpoint_dir: str, trigger_once: bool = True):
    """File-sink pipeline with checkpoint-based exactly-once."""
    q = (
        extract_stream(read_page_stream(spark, input_dir))
        .writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        q = q.trigger(availableNow=True)
    return q.start()


def dedup_stream(stream: DataFrame, key_col: str = "text",
                 within: str | None = None,
                 ts_col: str = "warc_ts") -> DataFrame:
    """Exact dedup-on-ingest: drop rows whose ``key_col`` digest was
    already seen in ANY earlier micro-batch (state survives restarts
    via the checkpoint).  The standard first dedup stage of a streaming
    crawl pipeline — dedup at ingest is far cheaper than dedup of the
    accumulated corpus.

    State growth: unbounded by default (one digest per distinct
    document, exactly like the batch operator's shuffle).  Pass
    ``within`` (e.g. ``"7 days"``) to bound state with a watermark on
    ``ts_col`` — then only duplicates arriving within the window are
    dropped (dropDuplicatesWithinWatermark), which is the 100 TB
    deployment shape: bounded state + a periodic batch sweep."""
    df = stream.withColumn("_digest", F.md5(F.col(key_col).cast("string")))
    if within is not None:
        df = (df.withWatermark(ts_col, within)
              .dropDuplicatesWithinWatermark(["_digest"]))
    else:
        df = df.dropDuplicates(["_digest"])
    return df.drop("_digest")


def crawl_rate_stream(pages: DataFrame, window: str = "1 minute",
                      watermark: str = "5 minutes",
                      ts_col: str = "warc_ts") -> DataFrame:
    """Streaming politeness monitor: fetches per host per tumbling
    window — (window_start, window_end, host, n_fetches).  The crawl
    scheduler watches this to throttle hosts that exceed their budget.

    Watermarked windowed count: state is bounded to the watermark
    horizon and windows finalize (append mode works) once the event
    time passes; the aggregation is the same partial-agg shape as the
    batch host_stats, keyed (window, host)."""
    return (
        pages.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"),
                 F.expr("parse_url(url, 'HOST')").alias("host"))
        .count()
        .selectExpr("w.start as window_start", "w.end as window_end",
                    "host", "cast(count as bigint) as n_fetches")
    )


def start_warc_extraction(spark: SparkSession, warc_dir: str, output_dir: str,
                          checkpoint_dir: str, trigger_once: bool = True,
                          max_files_per_trigger: int = 4):
    """Wire-format streaming pipeline: ``*.warc[.gz]`` files landing in
    ``warc_dir`` → WARC record kernel → HTML extraction kernel →
    parquet sink.  Both kernels are the exact batch code paths
    (mapInPandas is stream-transparent); restart-safety comes from the
    file source offsets + sink commit log under ``checkpoint_dir``."""
    from ..sources.warc import read_warc_stream

    pages = read_warc_stream(spark, warc_dir,
                             max_files_per_trigger=max_files_per_trigger)
    q = (
        extract_stream(pages)
        .writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        q = q.trigger(availableNow=True)
    return q.start()
