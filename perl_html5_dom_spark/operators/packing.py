"""Training-sequence packing: map documents onto fixed-length token
windows (the concat-and-chunk layout LLM training uses: documents are
concatenated into a stream and the stream is cut every ``max_tokens``;
a document may span a chunk boundary).

The Spark shape: a GLOBAL stream order would serialize on one
partition, so the stream is sharded into ``buckets`` deterministic
md5-bucket substreams (the same trick as corpus_split) and each bucket
packs independently — one window per bucket, all buckets in parallel,
scale = bucket count.  Offsets are integer running sums, so the
DuckDB oracle reproduces the layout bit-for-bit.

Output per document: its bucket, its [start_tok, end_tok) interval in
the bucket stream, and the first/last chunk indexes it touches; a
writer materializes chunk files by grouping on (bucket, chunk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .dedup import H, tokens_expr


def pack_offsets(docs: DataFrame, max_tokens: int = 1024,
                 buckets: int = 32) -> DataFrame:
    """(doc_id, bucket, n_tokens, start_tok, end_tok, first_chunk,
    last_chunk): deterministic concat-and-chunk placement.

    Stream order within a bucket is doc_id asc — reproducible across
    engines and runs.  One shuffle (the per-bucket window); each
    window partition holds ~1/buckets of the corpus."""
    from pyspark.sql import Window, functions as F

    toks = tokens_expr()
    keyed = "'pack:' || cast(doc_id as string)"
    base = docs.selectExpr(
        "doc_id",
        f"cast({H(keyed)} % {buckets} as bigint) as bucket",
        f"cast(size({toks}) as bigint) as n_tokens")
    w = (Window.partitionBy("bucket").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return base.withColumn("cum", F.sum("n_tokens").over(w)).selectExpr(
        "doc_id", "bucket", "n_tokens",
        "cast(cum - n_tokens as bigint) as start_tok",
        "cast(cum as bigint) as end_tok",
        f"cast((cum - n_tokens) div {max_tokens} as bigint) as first_chunk",
        f"cast((cum - 1) div {max_tokens} as bigint) as last_chunk")


def pack_oracle_sql(max_tokens: int = 1024, buckets: int = 32,
                    source: str = "documents") -> str:
    """DuckDB twin of :func:`pack_offsets` over ``source``."""
    dh = "cast(('0x' || substr(md5('pack:' || cast(doc_id as varchar)), 1, 15)) as bigint)"
    return (
        f"with base as (select doc_id, {dh} % {buckets} as bucket, "
        f"len(string_split(text, ' ')) as n_tokens from {source}), "
        "cums as (select *, sum(n_tokens) over (partition by bucket "
        " order by doc_id rows between unbounded preceding and current row) "
        " as cum from base) "
        "select doc_id, cast(bucket as bigint) as bucket, "
        "cast(n_tokens as bigint) as n_tokens, "
        "cast(cum - n_tokens as bigint) as start_tok, "
        "cast(cum as bigint) as end_tok, "
        f"cast((cum - n_tokens) // {max_tokens} as bigint) as first_chunk, "
        f"cast((cum - 1) // {max_tokens} as bigint) as last_chunk "
        "from cums"
    )
