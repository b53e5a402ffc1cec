"""spark-submit entry point for the extraction pipeline.

    zip -r pyfiles.zip perl_html5_dom_spark
    spark-submit --py-files pyfiles.zip spark_job.py \
        --input  /data/pages_parquet_or_dir \
        --output /data/extracted \
        --lineage /data/extracted_lineage \
        --selector 'a[href]' --buckets 1024 --salt-partitions 4096

Reads a pages table (url, html binary, ...), salt-repartitions it
(skewed giant documents), runs the extraction kernel with per-partition
lineage + checkpoint/resume (only buckets missing from the lineage
table are parsed on a rerun), writes (url, main_text, spans, ...).

For the sandbox's synthetic corpus pass --synthetic <sf_dir> instead of
--input.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input")
    ap.add_argument("--input-format", default="parquet",
                    choices=["parquet", "iceberg"],
                    help="iceberg reads --input as a catalog table name "
                    "(spark.read.format('iceberg').load) — the "
                    "production shape; needs the iceberg-spark-runtime "
                    "jar on the cluster (not in this sandbox)")
    ap.add_argument("--synthetic", help="sf dir to synthesize pages from")
    ap.add_argument("--replicate", type=int, default=1)
    ap.add_argument("--output", required=True)
    ap.add_argument("--lineage", required=True)
    ap.add_argument("--selector", default="a[href]")
    ap.add_argument("--fields", default="url,main_text,spans")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--batch-buckets", type=int, default=16)
    ap.add_argument("--salt-partitions", type=int, default=0,
                    help="salted repartition width (0 = skip)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .appName("html-extract").getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from perl_html5_dom_spark.operators.extract import extract_pages
    from perl_html5_dom_spark.plans.pipeline import (
        extract_with_lineage, salted_repartition)
    from perl_html5_dom_spark.sources.pages import pages_df

    if args.synthetic:
        pages = pages_df(spark, args.synthetic, replicate=args.replicate)
    elif args.input:
        if args.input_format == "iceberg":
            pages = spark.read.format("iceberg").load(args.input)
        else:
            pages = spark.read.parquet(args.input)
    else:
        raise SystemExit("one of --input / --synthetic is required")

    if args.salt_partitions:
        pages = salted_repartition(pages, args.salt_partitions)

    fields = args.fields.split(",")
    metrics = extract_with_lineage(
        spark, pages, args.output, args.lineage,
        lambda df: extract_pages(df, span_selector=args.selector,
                                 fields=fields),
        buckets=args.buckets, batch_buckets=args.batch_buckets)
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
