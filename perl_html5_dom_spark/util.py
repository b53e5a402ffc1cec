"""Session-shared SparkSession hygiene helpers.

Several operators lower dialect-portable SQL (the same text a DuckDB
oracle runs) onto Spark via temp views.  A fixed view name is fine for
a single job but collides when two jobs interleave on one shared
SparkSession — :func:`sql_over` gives every call its own name and
drops it immediately (``spark.sql`` analyzes eagerly, so the returned
DataFrame no longer needs the view).
"""

from __future__ import annotations

import contextlib
import itertools
from typing import Callable, Iterator

from pyspark.sql import DataFrame

_counter = itertools.count()


@contextlib.contextmanager
def temp_view(df: DataFrame, prefix: str = "__v") -> Iterator[str]:
    """Register ``df`` under a collision-free unique temp-view name for
    the duration of the block; yields the name.

    The multi-statement sibling of :func:`sql_over` — for query
    builders that reference the same frame from several SQL strings
    (e.g. robots rules + url list).  The view is dropped on exit;
    ``spark.sql`` analyzes eagerly, so DataFrames built inside the
    block stay valid after it."""
    name = f"{prefix}_{next(_counter)}"
    df.createOrReplaceTempView(name)
    try:
        yield name
    finally:
        df.sparkSession.catalog.dropTempView(name)


def sql_over(builder: Callable[..., str], *dfs: DataFrame,
             prefix: str = "__v") -> DataFrame:
    """Run ``builder(name1, name2, ...)`` SQL over the given DataFrames.

    Each DataFrame is registered under a collision-free unique temp-view
    name; the views are dropped before returning (analysis is eager in
    ``spark.sql``), so concurrent jobs sharing one SparkSession never
    observe each other's views.
    """
    spark = dfs[0].sparkSession
    names = []
    for df in dfs:
        name = f"{prefix}_{next(_counter)}"
        df.createOrReplaceTempView(name)
        names.append(name)
    try:
        return spark.sql(builder(*names))
    finally:
        for n in names:
            spark.catalog.dropTempView(n)


def checkpoint_parquet(df: DataFrame, prefix: str = "ckpt") -> DataFrame:
    """Materialize ``df`` to a fresh session-temp parquet dir and read
    it back — the intra-query intermediate for frames that several
    later stages SCAN repeatedly.

    Rationale (round 6, measured): a ``persist()`` stores deserialized
    InMemoryRelation batches whose repeated scans cost ~3x a
    vectorized parquet read on this engine (the bench.py corpus
    checkpoint documents the same); swapping the webtext pipeline's
    two persists for parquet round-trips took the capstone from
    12.4 s to 7.4 s at sf1.  A fresh ``mkdtemp`` per call means
    nothing is ever reused across invocations — every run recomputes
    from its own inputs (this is plan truncation, not result caching).
    At 100 TB the analog is a reliable checkpoint/staging table."""
    import tempfile

    path = tempfile.mkdtemp(prefix=f"spark_graft_{prefix}_") + "/data"
    df.write.parquet(path)
    return df.sparkSession.read.parquet(path)
