"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship extraction on sf0.001; ``queries``/
``oracle_sql`` expose every operator surface from SURVEY.md §2 plus the
training-data-pipeline operators (dedup / similarity / text analysis /
multimodal plumbing) with DuckDB oracles that derive expected results
independently (template arithmetic + md5-based hashes — see
perl_html5_dom_spark/queries.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from perl_html5_dom_spark import queries as Q  # noqa: E402
from perl_html5_dom_spark.operators.extract import extract_pages  # noqa: E402
from perl_html5_dom_spark.sources.pages import pages_df  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: parse every sf0.001 page, strip boilerplate, emit
    main text + link spans; exact_match must be true for every row
    (byte-identical extracted text per url — BASELINE.json north_rule)."""
    pages = pages_df(spark, "/root/testdata/sf0.001")
    out = extract_pages(pages, span_selector="a[href]",
                        fields=["url", "title", "main_text", "n_nodes", "spans"])
    src = pages.select("url", "text")
    return (
        out.join(src, "url")
        .selectExpr(
            "url", "title", "main_text",
            "main_text = text as exact_match",
            "n_nodes", "size(spans) as n_spans",
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return {k: v for k, v in Q.ORACLES.items() if v is not None}
