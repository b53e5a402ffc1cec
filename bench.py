"""Headline benchmark: extraction throughput + operator suite timings.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line:

  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "docs": N,
   "docs_per_sec": X, "cpus": C}

The page corpus is fanned out deterministically (replicate, see
sources/pages.py) so the parse kernel — the 100 TB bottleneck — gets a
measurable workload; REPLICATE=8 → 8×docs urls.
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    replicate = int(os.environ.get("SPARK_GRAFT_REPLICATE", "8"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .appName("bench").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from perl_html5_dom_spark.operators import dedup, nodes, selector_ops, similarity
    from perl_html5_dom_spark.operators.extract import extract_pages
    from perl_html5_dom_spark.queries import CORPUS_SQL
    from perl_html5_dom_spark.sources.pages import pages_df

    # pages fed from parquet — the 100 TB input shape (Iceberg/parquet
    # scan), and the cheap path on one box: the vectorized parquet read
    # costs far less JVM CPU than an InMemoryRelation scan, CPU that
    # otherwise competes with the Python kernels at full width
    import tempfile

    _pages_path = tempfile.mkdtemp(prefix="bench_pages_") + "/pages"
    pages_df(spark, sf_dir, replicate=replicate,
             partitions=cpus * 2).write.parquet(_pages_path)
    pages = spark.read.parquet(_pages_path)
    n_docs = pages.count()

    # warm the Python workers (daemon fork + pandas/pyarrow import) so
    # timings measure steady-state throughput, not one-time spin-up
    def _noop(batches):
        import pandas as pd
        for pdf in batches:
            yield pd.DataFrame({"n": [len(pdf)]})
    pages.select("url", "html").mapInPandas(_noop, "n long").count()

    timings: dict[str, float] = {}

    trials = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "2"))

    def bench(name, fn):
        # best-of-N: this box shows 2-4x noisy-neighbor spikes on
        # shuffle-heavy queries; the min is the stable estimate
        best = None
        for _ in range(trials):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            # operators persist intermediates (shingle tables, band
            # buckets) that nothing reads again — drop them so later
            # runs don't fight dead caches for executor memory
            spark.catalog.clearCache()
        timings[name] = round(best, 3)

    # q1: the north-star extraction — parse + boilerplate strip + spans
    bench("extract", lambda: extract_pages(pages)
          .agg(F.sum("n_nodes"), F.count("*")).collect())
    # q1b: the production path — pruned output (url, main_text, spans)
    bench("extract_main", lambda: extract_pages(
        pages, fields=["url", "main_text", "spans"])
        .agg(F.sum(F.length("main_text")), F.count("*")).collect())
    # q1c: adversarial pages (adoption agency, fostered table text,
    # foreign content) — since the round-3 fast-lane widening these run
    # in the fast lane end-to-end; the differential fuzz guards parity
    from perl_html5_dom_spark.sources.pages import (
        hostile2_pages_df, hostile_pages_df)
    hostile = hostile_pages_df(spark, sf_dir)
    bench("extract_hostile", lambda: extract_pages(
        hostile, span_selector=None, fields=["url", "inner_text"])
        .agg(F.sum(F.length("inner_text")), F.count("*")).collect())
    # q1d: hostile family #2 (template / caption / fostered select /
    # integration points) — fast lane end-to-end since round 3
    hostile2 = hostile2_pages_df(spark, sf_dir)
    bench("extract_hostile2", lambda: extract_pages(
        hostile2, span_selector=None, fields=["url", "inner_text"])
        .agg(F.sum(F.length("inner_text")), F.count("*")).collect())
    # q1e: the realistic frameless page (implied frames, form/select/
    # template/marquee/pre) — the most crawl-representative single number
    from perl_html5_dom_spark.sources.pages import messy_pages_df
    messy = messy_pages_df(spark, sf_dir)
    bench("extract_messy", lambda: extract_pages(
        messy, span_selector=None, fields=["url", "inner_text"])
        .agg(F.sum(F.length("inner_text")), F.count("*")).collect())
    # q1f: PDF layout parse (north rule) — generate + parse in one
    # kernel pass; measures the dom/pdf.py extractor throughput
    from perl_html5_dom_spark.operators.pdfextract import extract_pdfs
    from perl_html5_dom_spark.sources.pdfs import pdf_docs_df
    pdfs = pdf_docs_df(spark, sf_dir)
    bench("pdf_extract", lambda: extract_pdfs(pdfs)
          .agg(F.sum(F.length("text")), F.count("*")).collect())
    # q2: selector kernel find
    bench("css_find", lambda: selector_ops.css_find(pages, "article > a.ref")
          .count())
    # q3: node table explode + relational structural join.  The node
    # table is materialized to parquet ONCE and both join sides read the
    # files: on this box a parquet re-read outscans the deserialized
    # InMemoryRelation ~3x, and at 100 TB the checkpointed node table is
    # what serves many downstream structural queries anyway.
    def _nodes_join():
        import tempfile
        path = tempfile.mkdtemp(prefix="bench_nodes_") + "/nd"
        nodes.nodes_df(pages, elements_only=True,
                       columns=["url", "node_id", "parent_id", "tag"]
                       ).write.parquet(path)
        nd = spark.read.parquet(path)
        child = nd.select("url", "parent_id")
        parent = nd.select("url", F.col("node_id").alias("parent_id"),
                           F.col("tag").alias("parent_tag"))
        child.join(parent, ["url", "parent_id"]).groupBy("parent_tag").count().collect()
    bench("nodes_join", _nodes_join)
    # q4/q5: dedup over the documents corpus (with synthetic dup tails)
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents")

    def _corpus():
        # checkpointed to parquet once: the dedup operators scan it
        # several times and the vectorized parquet read beats a cache
        nonlocal _corpus_path
        if _corpus_path is None:
            _corpus_path = tempfile.mkdtemp(prefix="bench_corpus_") + "/c"
            spark.sql(CORPUS_SQL).repartition(cpus).write.parquet(_corpus_path)
        return spark.read.parquet(_corpus_path)
    _corpus_path = None
    bench("dedup_minhash", lambda: dedup.minhash_near_dups(_corpus(), 0.5).count())
    bench("dedup_simhash", lambda: dedup.simhash_near_dups(_corpus(), 3).count())
    # q5b: decontamination — bench n-grams broadcast, hit pairs shuffle
    from perl_html5_dom_spark.operators import contamination as cnt
    docs_t = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs_t.createOrReplaceTempView("documents")
    bench("contamination", lambda: cnt.ngram_overlap(
        docs_t, spark.sql(cnt.bench_items_sql(cnt.SPARK, "documents")),
        n=5).count())
    # q5c: PII redaction — pure whole-stage-codegen regex, zero shuffle
    from perl_html5_dom_spark.operators import pii as pii_ops
    bench("pii_redact", lambda: pii_ops.pii_redact(docs_t).count())
    # q5d: PageRank, 5 integer power iterations on the synthetic graph
    from perl_html5_dom_spark.operators import linkgraph as lgr
    bench("pagerank", lambda: lgr.pagerank(
        spark.sql(lgr.demo_edges_sql("documents")), iters=5).count())
    # q5e: Gopher n-gram repetition — zero-shuffle sorted-run folds;
    # the most expression-heavy pure projection in the suite.  The
    # driver parquet is ONE row group (read_docs rationale), so spread
    # it first or the whole fold runs on a single core.
    from perl_html5_dom_spark.operators import textstats as ts_ops
    docs_wide = docs_t.repartition(cpus)
    bench("ngram_repetition", lambda: ts_ops.ngram_repetition(docs_wide)
          .agg(F.sum(F.col("keep_rep").cast("long")), F.count("*")).collect())
    # q6: ANN top-k
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bench("ann_topk", lambda: similarity.brute_force_topk(
        emb, [0, 1, 2], k=5).collect())
    # q7: event sessionization (window functions, one shuffle)
    from perl_html5_dom_spark.operators import events as ev
    bench("sessionize", lambda: ev.sessionize(
        spark.read.parquet(f"{sf_dir}/events.parquet")).count())
    # q8: the composed production pipeline (parse+extract -> quality ->
    # minhash dedup keep -> split -> pack) — the end-to-end number a
    # curation run pays per corpus pass
    from perl_html5_dom_spark.queries import q_webtext_pipeline
    bench("webtext_pipeline",
          lambda: q_webtext_pipeline(spark, sf_dir).count())

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "extraction+ops suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "docs": n_docs,
        "docs_per_sec": round(n_docs / timings["extract"], 1),
        "cpus": cpus,
        "replicate": replicate,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
