"""Dump `.explain("formatted")` for catalog queries into plans/<dir>/.

The round-6 before/after plan captures (plans/r06/*) come from this
tool; tools/explain_dump.py remains the EXPLAIN.md generator.

Usage:
    python tools/plan_dump_r06.py <outdir> <suffix> [query ...]

Writes plans/<outdir>/<query>_<suffix>.txt for each query (default: a
curated list of the round-6 optimization targets).  Plans are captured
at sf0.01 — plan SHAPE does not depend on the scale factor.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "webtext_pipeline", "ngram_repetition", "dedup_simhash",
    "dedup_minhash_lsh", "parent_child_counts", "extract_main_text",
    "link_count", "contamination", "frequent_paths", "pagerank",
]


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "r06"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .appName("explain_dump").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from perl_html5_dom_spark.queries import QUERIES

    dest = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", outdir)
    os.makedirs(dest, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(dest, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
